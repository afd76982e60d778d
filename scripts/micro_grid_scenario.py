"""Stage timing of the dense-grid path on the REAL bench scenario frames."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _bench_config
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
from multiple_object_tracking_lidar_tpu.ops.cluster_grid import connected_components_grid
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask, remove_static
from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape
from multiple_object_tracking_lidar_tpu.ops.voxel_grid import finalize_dense_cm, voxel_accumulate_onehot_cm
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker, perceive
from multiple_object_tracking_lidar_tpu.tracker.state import Frame
from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml


def timed(fn, *args, n=100):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    cfg = _bench_config()
    grid = load_map_yaml("assets/sim_map.yaml")
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    n_pts = cfg.caps.n_max_points
    sc = Scenario(
        grid=grid,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.45, points_per_frame=1500),
            ScenarioObject(-0.8, 4.0, 0.35, 0.0, points_per_frame=1500),
            ScenarioObject(0.9, 6.5, -0.25, 0.25, points_per_frame=1500),
        ],
        static_points_per_frame=100_000 - 3 * 1500 - 300,
        clutter_points=300,
        seed=123,
    )
    pts, t = sc.frame_arrays(0)
    buf = np.zeros((n_pts, 3), np.float32)
    buf[: len(pts)] = pts[:n_pts]
    mask = np.zeros(n_pts, bool)
    mask[: min(len(pts), n_pts)] = True
    frame = Frame(points=jnp.asarray(buf), mask=jnp.asarray(mask), t=jnp.float32(t))

    leaf = cfg.voxel_leaf_size
    dims = grid_shape(cfg.scene, leaf, cfg.leaf_z)

    acc_f = jax.jit(lambda p, m: voxel_accumulate_onehot_cm(p, m, cfg.scene, leaf, cfg.leaf_z))
    ms, acc = timed(acc_f, frame.points, frame.mask)
    print(f"accumulate: {ms:.3f} ms")
    cent, occ, _ = jax.jit(finalize_dense_cm)(acc)
    dyn = jax.jit(lambda c, o: remove_static(c.T, o, env))(cent, occ)
    print(f"n_dyn={int(dyn.sum())}")

    for s, j in [(6, 0), (2, 0), (1, 2), (2, 2), (3, 1), (2, 1)]:
        cc_f = jax.jit(
            lambda c, d, s=s, j=j: connected_components_grid(
                c, d, dims, cfg.cluster_tolerance, leaf, cfg.leaf_z,
                cfg.caps.label_prop_iters, s, j,
            )
        )
        ms, (labels, n_sw, _) = timed(cc_f, cent, dyn)
        print(f"cc_grid s={s} j={j}: {ms:.3f} ms  n_sweeps={int(n_sw)}")

    from multiple_object_tracking_lidar_tpu.ops.cluster_grid import cluster_table_grid
    pp_f = jax.jit(
        lambda l, c, d: cluster_table_grid(
            l, jnp.int32(0), c, d, dims[0], cfg.min_cluster_size,
            cfg.max_cluster_size, cfg.caps.c_max_clusters, cfg.caps.p_max_cluster,
        )
    )
    ms, tbl = timed(pp_f, labels, cent, dyn)
    print(f"cluster_table_grid: {ms:.3f} ms  n_clusters={int(tbl.n_clusters)}")

    from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features_table
    cf_f = jax.jit(lambda mp, mm: circumcenter_features_table(mp, mm, jnp.float32(0.1)))
    ms, dets = timed(cf_f, tbl.mpts, tbl.member_mask)
    print(f"circumcenter_table: {ms:.3f} ms")

    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        get_cell_static_table,
        remove_static_cells,
    )
    st = get_cell_static_table(env, cfg.scene, leaf, dims[0], dims[1], dims[2])
    assert st is not None
    rs_f = jax.jit(remove_static_cells)
    ms, dyn2 = timed(rs_f, cent, occ, env, st)
    print(f"remove_static_cells(arg): {ms:.3f} ms  n_dyn={int(dyn2.sum())}")
    rs0_f = jax.jit(lambda c, o, e: remove_static(c.T, o, e))
    ms, dyn3 = timed(rs0_f, cent, occ, env)
    print(f"remove_static_onehot(arg): {ms:.3f} ms  n_dyn={int(dyn3.sum())}")

    perc_f = jax.jit(lambda f: perceive(f, env, config=cfg))
    ms, p = timed(perc_f, frame)
    print(f"perceive(full): {ms:.3f} ms  n_clusters={int(p.n_clusters)}")

    tracker = Tracker(cfg)
    step1 = tracker.bind_env(env, donate_state=False)
    state = tracker.init_state()
    ms, _ = timed(step1, state, frame)
    print(f"step(single): {ms:.3f} ms")

    stepm = tracker.bind_env_multi(env, donate_state=False)
    frames8 = Frame(
        points=jnp.broadcast_to(frame.points, (8,) + frame.points.shape),
        mask=jnp.broadcast_to(frame.mask, (8,) + frame.mask.shape),
        t=jnp.arange(8, dtype=jnp.float32) * 0.1 + 0.1,
    )
    ms, _ = timed(stepm, state, frames8, n=25)
    print(f"step(8-scan): {ms:.3f} ms total = {ms/8:.3f} ms/frame")


if __name__ == "__main__":
    main()
