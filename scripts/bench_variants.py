"""Measure full-step throughput of pipeline variants on the current backend.

Usage:  python scripts/bench_variants.py [variant ...]
Variants: runs-jnp (r1 default), onehot-grid (dense-grid path),
          dense-grid, runs-pallas, plus *-dense for the dense-dynamic scene.

Prints one JSON line per variant: clouds/s for the 8-frame scan dispatch.
Used to populate docs/PERFORMANCE.md; bench.py stays the single-number
driver contract.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(variant: str, dense_scene: bool):
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _bench_config
    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grid = load_map_yaml(os.path.join(here, "assets", "sim_map.yaml"))

    cfg = _bench_config()
    if variant == "runs-jnp":
        cfg = cfg.replace(voxel_mode="runs", cluster_backend="jnp")
    elif variant == "runs-pallas":
        cfg = cfg.replace(voxel_mode="runs", cluster_backend="pallas")
    elif variant == "onehot-grid":
        cfg = cfg.replace(voxel_mode="onehot", cluster_backend="grid")
    elif variant == "dense-grid":
        cfg = cfg.replace(voxel_mode="dense", cluster_backend="grid")
    else:
        raise SystemExit(f"unknown variant {variant}")

    n_valid = 100_000
    if dense_scene:
        # >= 30 objects, >= 5k dynamic voxels: the VERDICT r1 dense workload
        rng = np.random.default_rng(5)
        objs = [
            ScenarioObject(
                float(rng.uniform(-1.6, 1.6)),
                float(rng.uniform(-0.5, 8.5)),
                float(rng.uniform(-0.4, 0.4)),
                float(rng.uniform(-0.4, 0.4)),
                points_per_frame=2200,
                radius=0.75,
            )
            for _ in range(32)
        ]
        static = n_valid - 32 * 2200
        clutter = 0
    else:
        objs = [
            ScenarioObject(0.0, 1.0, 0.0, 0.45, points_per_frame=1500),
            ScenarioObject(-0.8, 4.0, 0.35, 0.0, points_per_frame=1500),
            ScenarioObject(0.9, 6.5, -0.25, 0.25, points_per_frame=1500),
        ]
        static = n_valid - 3 * 1500 - 300
        clutter = 300
    sc = Scenario(
        grid=grid, objects=objs, static_points_per_frame=static,
        clutter_points=clutter, seed=123,
    )

    tracker = Tracker(cfg)
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    n_pts = cfg.caps.n_max_points
    frames = []
    for k in range(8):
        pts, t = sc.frame_arrays(k)
        buf = np.zeros((n_pts, 3), np.float32)
        buf[: min(len(pts), n_pts)] = pts[:n_pts]
        mask = np.zeros(n_pts, bool)
        mask[: min(len(pts), n_pts)] = True
        frames.append(Frame(jax.device_put(jnp.asarray(buf)),
                            jax.device_put(jnp.asarray(mask)), jnp.float32(t)))
    stacked = Frame(
        points=jnp.stack([f.points for f in frames]),
        mask=jnp.stack([f.mask for f in frames]),
        t=jnp.stack([f.t for f in frames]),
    )
    return tracker, env, stacked


def measure(variant: str, dense_scene: bool = False) -> dict:
    tracker, env, stacked = build(variant, dense_scene)
    step = tracker.bind_env_multi(env)
    state = tracker.init_state()
    t0 = time.perf_counter()
    for _ in range(2):
        state, out = step(state, stacked)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    stats = jax.tree.map(np.asarray, out)
    n_scans = 25
    best = float("inf")
    for _ in range(3):
        state = tracker.init_state()
        t0 = time.perf_counter()
        for _ in range(n_scans):
            state, out = step(state, stacked)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "variant": variant + ("-dense" if dense_scene else ""),
        "clouds_per_sec": round(n_scans * 8 / best, 1),
        "ms_per_cloud": round(1e3 * best / (n_scans * 8), 4),
        "compile_s": round(compile_s, 1),
        "n_dynamic_max": int(stats.n_dynamic.max()),
        "n_clusters_max": int(stats.n_clusters.max()),
    }


if __name__ == "__main__":
    variants = sys.argv[1:] or ["runs-jnp", "onehot-grid"]
    for v in variants:
        dense = v.endswith("-dense")
        print(json.dumps(measure(v.removesuffix("-dense"), dense)), flush=True)
