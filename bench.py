"""Throughput benchmark: clouds/sec at 100k points/frame, single chip.

Prints ONE JSON line:
  {"metric": "clouds_per_sec_100k_pts", "value": N, "unit": "clouds/s",
   "vs_baseline": N/1000}

Baseline context (BASELINE.md): the reference is designed for 10 Hz on CPU
(<= 100 ms/frame); this repo's north-star is >= 1000 clouds/sec per TPU chip
at 100k pts/frame.  The measurement drives the full fused step (voxel ->
static mask -> cluster -> circumcenter -> associate -> IHGP) with the track
state donated and frames pre-staged on device, cycling through a ring of
distinct frames so no stage is constant-folded.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from __graft_entry__ import _bench_config
    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    ymap = os.path.join(here, "assets", "sim_map.yaml")
    if not os.path.exists(ymap):
        subprocess.run(
            [sys.executable, os.path.join(here, "assets", "make_fixture_map.py")],
            check=True,
        )
    grid = load_map_yaml(ymap)

    cfg = _bench_config()
    n_pts = cfg.caps.n_max_points  # 131072 staged; 100k valid per frame
    n_valid = 100_000

    tracker = Tracker(cfg)
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)

    # a realistic 100k-pt LiDAR frame mix: mostly static wall returns, three
    # moving objects, some free-space clutter
    sc = Scenario(
        grid=grid,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.45, points_per_frame=1500),
            ScenarioObject(-0.8, 4.0, 0.35, 0.0, points_per_frame=1500),
            ScenarioObject(0.9, 6.5, -0.25, 0.25, points_per_frame=1500),
        ],
        static_points_per_frame=n_valid - 3 * 1500 - 300,
        clutter_points=300,  # sparse: clutter must not bridge object clusters
        seed=123,
    )

    n_ring = 8
    frames = []
    for k in range(n_ring):
        pts, t = sc.frame_arrays(k)
        buf = np.zeros((n_pts, 3), np.float32)
        buf[: len(pts)] = pts[:n_pts]
        mask = np.zeros(n_pts, bool)
        mask[: min(len(pts), n_pts)] = True
        frames.append(
            Frame(
                points=jax.device_put(jnp.asarray(buf)),
                mask=jax.device_put(jnp.asarray(mask)),
                t=jnp.float32(t),
            )
        )

    # map baked in as a compiled constant, state donated; 8 consecutive
    # frames of the stream per dispatch (lax.scan — identical state chain,
    # amortizes per-dispatch host/RPC overhead)
    step = tracker.bind_env_multi(env)
    frames_stacked = Frame(
        points=jnp.stack([f.points for f in frames]),
        mask=jnp.stack([f.mask for f in frames]),
        t=jnp.stack([f.t for f in frames]),
    )

    # warmup / compile
    state = tracker.init_state()
    for _ in range(2):
        state, out = step(state, frames_stacked)
    jax.block_until_ready(out)

    # capacity honesty: the run must be overflow-free at these capacities or
    # the headline number is invalid (VERDICT r1 §weak-2)
    state_chk = tracker.init_state()
    state_chk, out_chk = step(state_chk, frames_stacked)
    out_chk = jax.tree.map(np.asarray, out_chk)
    assert int(out_chk.overflow.sum()) == 0, "track-bank overflow during bench"
    assert int(out_chk.n_dynamic.max()) <= cfg.caps.m_max_dynamic, (
        f"dynamic-voxel truncation: {int(out_chk.n_dynamic.max())} > "
        f"{cfg.caps.m_max_dynamic}"
    )
    assert int(out_chk.n_clusters.max()) <= cfg.caps.c_max_clusters, (
        "cluster-slot truncation during bench"
    )
    assert int(out_chk.n_voxels.max()) <= cfg.caps.m_max_voxels, (
        "voxel truncation during bench"
    )

    # timed: best of a few repeats (remote-dispatch jitter)
    n_scans = 25
    best = float("inf")
    for _ in range(3):
        state = tracker.init_state()
        t0 = time.perf_counter()
        for _ in range(n_scans):
            state, out = step(state, frames_stacked)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    clouds_per_sec = (n_scans * n_ring) / best

    # single-frame dispatch (the node's default bind_env path): same program
    # the TrackerNode runs, dispatches queued asynchronously so the number is
    # device throughput of the single-frame program, not tunnel RTT
    step1 = tracker.bind_env(env)
    state1 = tracker.init_state()
    for f in frames[:2]:
        state1, out1 = step1(state1, f)
    jax.block_until_ready(out1)
    n_single = 100
    best1 = float("inf")
    for _ in range(3):
        state1 = tracker.init_state()
        t0 = time.perf_counter()
        for i in range(n_single):
            state1, out1 = step1(state1, frames[i % n_ring])
        jax.block_until_ready(out1)
        best1 = min(best1, time.perf_counter() - t0)
    single_clouds_per_sec = n_single / best1

    print(
        json.dumps(
            {
                "metric": "clouds_per_sec_100k_pts",
                "value": round(clouds_per_sec, 2),
                "unit": "clouds/s",
                "vs_baseline": round(clouds_per_sec / 1000.0, 4),
                "single_frame_clouds_per_sec": round(single_clouds_per_sec, 2),
                "overflow": 0,
                "capacities": {
                    "n_max_points": cfg.caps.n_max_points,
                    "m_max_voxels": cfg.caps.m_max_voxels,
                    "m_max_dynamic": cfg.caps.m_max_dynamic,
                    "c_max_clusters": cfg.caps.c_max_clusters,
                    "p_max_cluster": cfg.caps.p_max_cluster,
                    "k_max_tracks": cfg.caps.k_max_tracks,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
