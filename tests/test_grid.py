"""Dense-grid perception path: one-hot MXU voxel accumulation + stencil CC.

The grid path removes the m_max_dynamic capacity entirely (VERDICT r1 §3):
clustering runs on the dense cell grid with density-independent stencil
cost.  Parity targets: the scatter accumulator (exact semantics twin), the
all-pairs clustering backend, the BFS oracle, and the full reference oracle.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from multiple_object_tracking_lidar_tpu.config import Capacities, SceneBounds, TrackerConfig
from multiple_object_tracking_lidar_tpu.ops.cluster import euclidean_cluster
from multiple_object_tracking_lidar_tpu.ops.cluster_grid import (
    cluster_table_grid,
    connected_components_grid,
    euclidean_cluster_grid,
)
from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape, voxel_accumulate
from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
    finalize_dense,
    voxel_accumulate_onehot,
)

SCENE = SceneBounds(x_min=-2.0, x_max=2.0, y_min=-1.0, y_max=5.0, z_min=0.0, z_max=2.0)
LEAF = 0.1
LEAF_Z = 2.0
TOL = 0.15


def _points(rng, n=800):
    pts = np.stack(
        [
            rng.uniform(-2.5, 2.5, n),   # includes out-of-scene points
            rng.uniform(-1.5, 5.5, n),
            rng.uniform(-0.2, 2.2, n),
        ],
        axis=1,
    ).astype(np.float32)
    mask = rng.random(n) > 0.1
    return jnp.asarray(pts), jnp.asarray(mask)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_onehot_accumulate_matches_scatter(rng, dtype):
    pts, mask = _points(rng)
    pts = pts.astype(dtype)
    a_scatter = voxel_accumulate(pts, mask, SCENE, LEAF, LEAF_Z)
    a_onehot = voxel_accumulate_onehot(pts, mask, SCENE, LEAF, LEAF_Z)
    assert a_onehot.dtype == a_scatter.dtype
    # counts are integer-exact in both
    np.testing.assert_array_equal(np.asarray(a_onehot[:, 3]), np.asarray(a_scatter[:, 3]))
    atol = 1e-12 if dtype == jnp.float64 else 2e-5
    np.testing.assert_allclose(
        np.asarray(a_onehot[:, :3]), np.asarray(a_scatter[:, :3]), rtol=0, atol=atol
    )


def test_pallas_accumulator_matches_jnp(rng):
    """The fused VMEM kernel (interpret mode here) == the jnp one-hot
    lowering, channel-exact (both use the same 3-way bf16 split)."""
    import math

    from multiple_object_tracking_lidar_tpu.ops.voxel import _quantize
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import _accumulate_pallas

    pts, mask = _points(rng, 1024)
    a_jnp = voxel_accumulate_onehot(pts, mask, SCENE, LEAF, LEAF_Z, use_pallas=False)

    gx, gy, gz = grid_shape(SCENE, LEAF, LEAF_Z)
    bx = math.floor(SCENE.x_min / LEAF)
    by = math.floor(SCENE.y_min / LEAF)
    bz = math.floor(SCENE.z_min / LEAF_Z)
    ix, iy, iz = _quantize(pts, LEAF, LEAF_Z)
    ix, iy, iz = ix - bx, iy - by, iz - bz
    ok = (
        mask
        & (ix >= 0) & (ix < gx)
        & (iy >= 0) & (iy < gy)
        & (iz >= 0) & (iz < gz)
    )
    ix = jnp.where(ok, ix, -1)
    iyz = jnp.where(ok, iy + gy * iz, -1)
    a_pl = _accumulate_pallas(pts, ix, iyz, ok, gx, gy * gz, block=512, interpret=True)
    # kernel output is channel-major (4, n_cells)
    np.testing.assert_array_equal(np.asarray(a_pl[3]), np.asarray(a_jnp[:, 3]))
    np.testing.assert_allclose(
        np.asarray(a_pl[:3].T), np.asarray(a_jnp[:, :3]), rtol=0, atol=1e-6
    )


def test_grid_cc_matches_bfs_oracle(rng):
    """Stencil CC on the dense grid == BFS connected components of the
    dist<=tol graph over the same centroid set."""
    pts, mask = _points(rng, 600)
    acc = voxel_accumulate(pts.astype(jnp.float64), mask, SCENE, LEAF, LEAF_Z)
    cent, occ, _ = finalize_dense(acc)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)
    labels, _, sat = connected_components_grid(
        cent.T, occ, dims, TOL, LEAF, LEAF_Z, max_iters=64, sweeps_per_iter=4
    )
    assert int(sat) == 0
    labels = np.asarray(labels)
    occ_np = np.asarray(occ)
    cent_np = np.asarray(cent)

    idx = np.nonzero(occ_np)[0]
    comps = oracle.euclidean_cluster(cent_np[idx], TOL, 1, 10**9)
    # oracle returns components over the compacted list; map back to cells
    got = {}
    for i in idx:
        got.setdefault(labels[i], set()).add(i)
    want = {min(idx[c]): {idx[j] for j in c} for c in comps}
    assert got == want


def test_grid_cluster_matches_pointlist_backend(rng):
    """Full Clusters outputs: grid backend == all-pairs backend run on the
    compacted dynamic point list (same ordering semantics)."""
    pts, mask = _points(rng, 700)
    acc = voxel_accumulate(pts.astype(jnp.float64), mask, SCENE, LEAF, LEAF_Z)
    cent, occ, _ = finalize_dense(acc)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)

    c_max, p_max = 16, 64
    g = euclidean_cluster_grid(
        cent.T, occ, dims, TOL, LEAF, LEAF_Z, 2, 50, c_max, p_max, 64, 4
    )

    # compacted list (order-preserving) for the all-pairs backend
    occ_np = np.asarray(occ)
    idx = np.nonzero(occ_np)[0]
    m = 512
    assert len(idx) <= m
    plist = np.zeros((m, 3))
    plist[: len(idx)] = np.asarray(cent)[idx]
    pmask = np.zeros(m, bool)
    pmask[: len(idx)] = True
    p = euclidean_cluster(
        jnp.asarray(plist), jnp.asarray(pmask), TOL, 2, 50, c_max, p_max
    )

    np.testing.assert_array_equal(np.asarray(g.cluster_valid), np.asarray(p.cluster_valid))
    np.testing.assert_array_equal(np.asarray(g.sizes), np.asarray(p.sizes))
    assert int(g.n_clusters) == int(p.n_clusters)
    # per-cluster member POINTS identical (indices differ by layout: cells vs
    # compacted ranks)
    for c in range(c_max):
        if not bool(g.cluster_valid[c]):
            continue
        s_g, n_g = int(g.starts[c]), int(g.sizes[c])
        s_p, n_p = int(p.starts[c]), int(p.sizes[c])
        np.testing.assert_allclose(
            np.asarray(g.sorted_pts[s_g : s_g + n_g]),
            np.asarray(p.sorted_pts[s_p : s_p + n_p]),
            rtol=0,
            atol=0,
        )


def test_cell_static_table_matches_remove_static(rng, fixture_map):
    """Elementwise drop-bit lookup == the one-hot map lookup, cell by cell,
    on the real fixture map (including out-of-map and dilated boundaries)."""
    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        build_cell_static_table,
        build_static_mask,
        remove_static,
        remove_static_cells,
    )

    env = build_static_mask(fixture_map, 4, 50)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)
    gx, gy, gz = dims
    table = build_cell_static_table(env, SCENE, LEAF, gx, gy, gz)
    assert table is not None

    for seed in range(3):
        r = np.random.default_rng(seed)
        pts = jnp.asarray(
            np.stack(
                [
                    r.uniform(-2.5, 2.5, 3000),
                    r.uniform(-1.5, 5.5, 3000),
                    r.uniform(0.0, 2.0, 3000),
                ],
                axis=1,
            ).astype(np.float32)
        )
        acc = voxel_accumulate(pts, jnp.ones(3000, bool), SCENE, LEAF, LEAF_Z)
        cent, occ, _ = finalize_dense(acc)
        want = remove_static(cent, occ, env)
        got = remove_static_cells(cent.T, occ, env, table)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_cluster_table_matches_sorted_postprocess(rng, dtype):
    """The sort/scatter/gather-free matmul postprocess == the sorted-path
    postprocess: same cluster order, sizes, validity, and bit-identical
    member points in ascending-cell order."""
    pts, mask = _points(rng, 700)
    acc = voxel_accumulate(pts.astype(dtype), mask, SCENE, LEAF, LEAF_Z)
    cent, occ, _ = finalize_dense(acc)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)

    c_max, p_max = 16, 64
    g = euclidean_cluster_grid(
        cent.T, occ, dims, TOL, LEAF, LEAF_Z, 2, 50, c_max, p_max, 64, 4
    )
    labels, n_it, _ = connected_components_grid(
        cent.T, occ, dims, TOL, LEAF, LEAF_Z, 64, 4
    )
    tbl = cluster_table_grid(labels, n_it, cent.T, occ, dims[0], 2, 50, c_max, p_max)

    np.testing.assert_array_equal(np.asarray(tbl.cluster_valid), np.asarray(g.cluster_valid))
    np.testing.assert_array_equal(np.asarray(tbl.sizes), np.asarray(g.sizes))
    np.testing.assert_array_equal(np.asarray(tbl.roots), np.asarray(g.roots))
    assert int(tbl.n_clusters) == int(g.n_clusters)
    mm = np.asarray(tbl.member_mask)
    for c in range(c_max):
        if not bool(g.cluster_valid[c]):
            assert not mm[c].any()
            continue
        n_c = int(g.sizes[c])
        # mask is a prefix (members packed in ascending cell order)
        assert mm[c, :n_c].all() and not mm[c, n_c:].any()
        s_g = int(g.starts[c])
        np.testing.assert_array_equal(
            np.asarray(tbl.mpts[c, :n_c]), np.asarray(g.sorted_pts[s_g : s_g + n_c])
        )


@pytest.mark.parametrize(
    "dtype,pos_atol,vel_atol",
    [
        ("float64", 1e-9, 1e-8),
        ("float32", 5e-3, 5e-2),
    ],
)
def test_grid_pipeline_matches_reference_oracle(fixture_map, dtype, pos_atol, vel_atol):
    """End-to-end oracle parity with the grid backend (the scalable path)."""
    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame

    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        max_cluster_size=300,
        data_length=10,
        dtype=dtype,
        voxel_mode="onehot",
        # oracle-exact parity: the jnp lowering now HONORS the fast default
        # (quantized coords, tests/test_grid.py::test_jnp_fast_matches_kernel),
        # so exact-vs-oracle comparisons must opt into the exact scheme
        voxel_quant="exact",
        cluster_backend="grid",
        caps=Capacities(
            n_max_points=2048,
            m_max_voxels=512,
            m_max_dynamic=256,
            c_max_clusters=16,
            p_max_cluster=64,
            k_max_tracks=16,
        ),
    )
    tracker = Tracker(cfg)
    state = tracker.init_state()
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    ref = oracle.ReferenceTracker(cfg, grid=fixture_map)

    sc = Scenario(
        grid=fixture_map,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.45),
            ScenarioObject(1.0, 6.0, -0.3, 0.0),
        ],
        static_points_per_frame=600,
        seed=7,
    )

    for k in range(15):
        pts, t = sc.frame_arrays(k)
        buf = np.zeros((cfg.caps.n_max_points, 3), np.float32)
        buf[: len(pts)] = pts[: cfg.caps.n_max_points]
        msk = np.zeros(cfg.caps.n_max_points, bool)
        msk[: min(len(pts), cfg.caps.n_max_points)] = True
        frame = Frame(points=jnp.asarray(buf), mask=jnp.asarray(msk), t=jnp.float32(t))
        state, out = tracker.step(state, frame, env)
        out = jax.tree.map(np.asarray, out)
        ref_out = ref.step(pts.astype(np.float64), t)

        if k == 0:
            assert not out.publish
            continue
        got = [
            {"id": int(out.obj_id[i]), "pos": out.pos[i], "vel": out.vel[i]}
            for i in range(len(out.valid))
            if out.valid[i]
        ]
        assert len(got) == len(ref_out), f"frame {k}: det count mismatch"
        for gg, r in zip(got, ref_out):
            assert gg["id"] == r["id"]
            np.testing.assert_allclose(gg["pos"], r["pos"], atol=pos_atol)
            np.testing.assert_allclose(gg["vel"], r["vel"], atol=vel_atol)


def test_grid_backend_no_truncation_on_dense_scene(fixture_map):
    """A scene dense enough to overflow the point-list path must come through
    the grid path with every dynamic voxel clustered (no m_max_dynamic)."""
    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame

    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        max_cluster_size=2000,
        data_length=6,
        voxel_mode="onehot",
        cluster_backend="grid",
        caps=Capacities(
            n_max_points=4096,
            m_max_voxels=512,
            m_max_dynamic=32,   # would truncate badly in point-list mode
            c_max_clusters=16,
            p_max_cluster=512,
            k_max_tracks=16,
        ),
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance)
    sc = Scenario(
        grid=fixture_map,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.0, points_per_frame=1200, radius=0.9),
            ScenarioObject(1.0, 6.0, 0.0, 0.0, points_per_frame=1200, radius=0.9),
        ],
        static_points_per_frame=0,
        seed=13,
    )
    state = tracker.init_state()
    for k in range(3):
        pts, t = sc.frame_arrays(k)
        buf = np.zeros((cfg.caps.n_max_points, 3), np.float32)
        buf[: len(pts)] = pts[: cfg.caps.n_max_points]
        msk = np.zeros(cfg.caps.n_max_points, bool)
        msk[: min(len(pts), cfg.caps.n_max_points)] = True
        state, out = tracker.step(
            state, Frame(points=jnp.asarray(buf), mask=jnp.asarray(msk), t=jnp.float32(t)), env
        )
    assert int(out.n_dynamic) > cfg.caps.m_max_dynamic  # beyond the old cap
    assert int(out.n_clusters) == 2                     # both fully clustered
    assert int(out.overflow) == 0
    assert np.isfinite(np.asarray(out.pos)[np.asarray(out.valid)]).all()


def test_grid_requires_dense_voxel_mode():
    # "runs" is allowed (sort + densify feeds the dense grid); "scan" is not
    with pytest.raises(ValueError):
        TrackerConfig(cluster_backend="grid", voxel_mode="scan")
    TrackerConfig(cluster_backend="grid", voxel_mode="runs")


def test_v2_accumulator_matches_jnp(rng):
    """In-kernel-quantize accumulator (interpret) == jnp one-hot, including
    masked points (folded to out-of-bounds sentinel coords)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v2,
        voxel_accumulate_onehot_cm,
    )

    n = 1024
    pts = np.stack(
        [
            np.random.default_rng(5).uniform(-3, 3, n),
            np.random.default_rng(6).uniform(-2, 7, n),
            np.random.default_rng(7).uniform(-0.5, 2.5, n),
        ],
        axis=1,
    ).astype(np.float32)
    mask = np.random.default_rng(8).random(n) < 0.9
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, use_pallas=False
    )
    got = _accumulate_pallas_v2(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(ref[:3]), rtol=0, atol=1e-6
    )


def test_v3_large_leaf_gate(rng):
    """ADVICE r2: the v3 int8-digit kernel only represents cell-relative
    fracs exactly up to leaf_xy ~0.124 m / leaf_z ~3.97 m; beyond that the
    dispatcher must fall back to the (exact-at-any-leaf) v2 kernel.  The
    gate predicate is checked at its boundary, and the v2 fallback is
    verified against the jnp path at a leaf far past the v3 limit."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v2,
        _v3_leaf_ok,
        voxel_accumulate_onehot_cm,
    )

    assert _v3_leaf_ok(0.05, 1.0)          # bench config
    assert _v3_leaf_ok(0.124, 3.9)         # just inside the digit range
    assert not _v3_leaf_ok(0.125, 1.0)     # 0.125/2 * 2^19 = 32768 wraps int8x2
    assert not _v3_leaf_ok(0.05, 4.0)      # z digit wraps

    leaf, leaf_z = 0.5, 10.0               # user-set large leaf (config allows it)
    n = 2048
    r = np.random.default_rng(17)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    mask = r.random(n) < 0.9
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, leaf, leaf_z, use_pallas=False
    )
    got = _accumulate_pallas_v2(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, leaf, leaf_z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(ref[:3]), rtol=0, atol=1e-5
    )


def test_runs_cm_accumulator_matches_jnp(rng):
    """Sort + segsum + densify matmul == jnp one-hot accumulator (counts
    integer-exact; sums to f32 summation order)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        voxel_accumulate_onehot_cm,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel_pallas import (
        voxel_accumulate_runs_cm,
    )

    n = 8192
    r = np.random.default_rng(11)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    mask = r.random(n) < 0.9
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, use_pallas=False
    )
    got = voxel_accumulate_runs_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(ref[:3]), rtol=0, atol=2e-5
    )


def test_fused_finalize_static_cc_matches_jnp(rng, fixture_map):
    """The fused Pallas kernel (interpret) == finalize_dense_cm +
    remove_static_cells + connected_components_grid, bit-for-bit."""
    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        fused_finalize_static_cc,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        build_cell_static_table,
        build_static_mask,
        remove_static_cells,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        finalize_dense_cm,
        voxel_accumulate_onehot_cm,
    )

    env = build_static_mask(fixture_map, 4, 50)
    scene = SceneBounds(
        x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
    )
    dims = grid_shape(scene, LEAF, LEAF_Z)
    gx, gy, gz = dims
    table = build_cell_static_table(env, scene, LEAF, gx, gy, gz)
    assert table is not None

    r = np.random.default_rng(21)
    n = 4000
    pts = jnp.asarray(
        np.stack(
            [r.uniform(-2.5, 2.5, n), r.uniform(-1.5, 9.5, n), r.uniform(0, 2, n)],
            axis=1,
        ).astype(np.float32)
    )
    acc = voxel_accumulate_onehot_cm(pts, jnp.ones(n, bool), scene, LEAF, LEAF_Z)
    cent, occ, _ = finalize_dense_cm(acc)
    dyn = remove_static_cells(cent, occ, env, table)
    labels_ref, _, _ = connected_components_grid(
        cent, dyn, dims, TOL, LEAF, LEAF_Z, 64, 4
    )

    scal = jnp.asarray(
        [
            float(np.asarray(env.origin_x)),
            float(np.asarray(env.origin_y)),
            float(np.asarray(env.cos_nyaw)),
            float(np.asarray(env.sin_nyaw)),
            float(np.asarray(env.inv_resolution)),
            TOL * TOL,
        ],
        jnp.float32,
    )
    cent_k, dyn_k, labels_k, nsw, cc_sat = fused_finalize_static_cc(
        acc, scal, table.base_row, table.base_col, table.bits,
        dims=dims, tol=TOL, leaf_xy=LEAF, leaf_z=LEAF_Z, kwin=table.k,
        interpret=True,
    )
    assert int(cc_sat) == 0
    np.testing.assert_array_equal(np.asarray(dyn_k), np.asarray(dyn))
    np.testing.assert_array_equal(np.asarray(cent_k), np.asarray(cent))
    np.testing.assert_array_equal(np.asarray(labels_k), np.asarray(labels_ref))
    assert int(nsw) > 0


def test_fused_cc_long_component_merges(rng):
    """ADVICE r2 (medium): the fused kernel's old 32-sweep cap silently
    split components spanning more than ~128 cells.  A straight 140-cell
    chain (adjacent centroids 0.05 apart, tol 0.15) must now merge into ONE
    component under the default diameter bound — the in-kernel axis scans
    collapse straight runs in O(log) steps — with the saturation flag clear,
    matching the jnp fallback (whose pointer jumps never had the problem).
    Forcing a tiny cap must raise the flag instead of failing silently."""
    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        fused_finalize_static_cc,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        build_cell_static_table,
        build_static_mask,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        voxel_accumulate_onehot_cm,
    )
    from multiple_object_tracking_lidar_tpu.utils.pgm import MapInfo, OccupancyGrid

    leaf, leaf_z, tol = 0.05, 1.0, 0.15
    scene = SceneBounds(
        x_min=0.0, x_max=0.5, y_min=0.0, y_max=7.5, z_min=0.0, z_max=1.0
    )
    dims = grid_shape(scene, leaf, leaf_z)
    gx, gy, gz = dims
    assert gy >= 140
    # an all-free map covering the scene: nothing is static
    grid = OccupancyGrid(
        info=MapInfo(resolution=0.1, width=16, height=80, origin_x=-0.2, origin_y=-0.2),
        data=np.zeros((80, 16), np.int8),
    )
    env = build_static_mask(grid, 0, 50)
    table = build_cell_static_table(env, scene, leaf, gx, gy, gz)
    assert table is not None

    # 140 points in a straight y-line, one per cell, 0.05 apart
    n_chain = 140
    pts = np.zeros((n_chain, 3), np.float32)
    pts[:, 0] = 0.225
    pts[:, 1] = 0.125 + leaf * np.arange(n_chain)
    pts[:, 2] = 0.5
    acc = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.ones(n_chain, bool), scene, leaf, leaf_z
    )
    scal = jnp.asarray(
        [
            float(np.asarray(env.origin_x)),
            float(np.asarray(env.origin_y)),
            float(np.asarray(env.cos_nyaw)),
            float(np.asarray(env.sin_nyaw)),
            float(np.asarray(env.inv_resolution)),
            tol * tol,
        ],
        jnp.float32,
    )
    args = (acc, scal, table.base_row, table.base_col, table.bits)
    kw = dict(dims=dims, tol=tol, leaf_xy=leaf, leaf_z=leaf_z, kwin=table.k,
              interpret=True)
    _, dyn_k, labels_k, _, cc_sat = fused_finalize_static_cc(*args, **kw)
    assert int(dyn_k.sum()) == n_chain
    lab = np.asarray(labels_k)[np.asarray(dyn_k)]
    assert len(set(lab.tolist())) == 1, "long chain split into %d components" % len(set(lab.tolist()))
    assert int(cc_sat) == 0

    # jnp fallback agrees bit-for-bit
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import finalize_dense_cm
    cent, occ, _ = finalize_dense_cm(acc)
    labels_j, _, sat_j = connected_components_grid(
        cent, occ, dims, tol, leaf, leaf_z, 64, 4
    )
    np.testing.assert_array_equal(np.asarray(labels_k), np.asarray(labels_j))
    assert int(sat_j) == 0

    # a deliberately tiny cap must SURFACE the truncation
    _, _, _, _, cc_sat2 = fused_finalize_static_cc(
        *args, **{**kw, "max_sweeps": 1}
    )
    assert int(cc_sat2) == 1


def test_grid_pipeline_runs_mode_matches_onehot(fixture_map):
    """grid + voxel_mode='runs' end-to-end tracks match grid + 'onehot'
    (same detections up to f32 summation order of voxel sums)."""
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame

    env = build_static_mask(fixture_map, 4, 50)
    base = dict(
        voxel_leaf_size=0.1,
        max_cluster_size=300,
        data_length=10,
        # the runs voxelizer is exact; match it with the exact onehot scheme
        # (the fast default now actually quantizes on every backend)
        voxel_quant="exact",
        cluster_backend="grid",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
        ),
        caps=Capacities(
            n_max_points=2048, m_max_voxels=512, m_max_dynamic=256,
            c_max_clusters=16, p_max_cluster=64, k_max_tracks=16,
        ),
    )
    outs = {}
    for mode in ("onehot", "runs"):
        cfg = TrackerConfig(voxel_mode=mode, **base)
        tracker = Tracker(cfg)
        state = tracker.init_state()
        r = np.random.default_rng(3)
        for k in range(4):
            n = cfg.caps.n_max_points
            obj = r.normal([0.5 + 0.1 * k, 2.0, 0.5], 0.1, (200, 3))
            buf = np.full((n, 3), 50.0, np.float32)
            buf[:200] = obj
            msk = np.zeros(n, bool)
            msk[:200] = True
            state, out = tracker.step(
                state,
                Frame(points=jnp.asarray(buf.astype(np.float32)),
                      mask=jnp.asarray(msk), t=jnp.float32(0.1 * (k + 1))),
                env,
            )
        outs[mode] = jax.tree.map(np.asarray, out)
    a, b = outs["onehot"], outs["runs"]
    assert int(a.n_clusters) == int(b.n_clusters)
    np.testing.assert_allclose(
        a.pos[a.valid], b.pos[b.valid], rtol=0, atol=1e-5
    )


def test_v3_accumulator_matches_jnp(rng):
    """int8 fixed-point accumulator (interpret): counts integer-exact,
    centroid-level agreement to the 2^-18 digit resolution."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        voxel_accumulate_onehot_cm,
    )

    n = 1024
    r = np.random.default_rng(17)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    mask = r.random(n) < 0.9
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, use_pallas=False
    )
    got, npts = _accumulate_pallas_v3(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    assert int(npts) == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    cnt = np.maximum(np.asarray(ref[3]), 1)
    cd = np.abs(np.asarray(got[:3]) - np.asarray(ref[:3])) / cnt
    assert cd[:2].max() < 5e-6   # xy: 2^-19 frac digits
    assert cd[2].max() < 6e-5    # z: 2^-14 over the 20x z-leaf
    # determinism: identical run -> bit-identical sums
    got2, _ = _accumulate_pallas_v3(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_v4_accumulator_quant_bound(rng):
    """Single-digit (quant="fast") accumulator (interpret): counts
    integer-exact, per-cell centroids within the documented quantization
    bound leaf/2^(k+1) per axis, and bit-deterministic."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _v4_shifts,
        voxel_accumulate_onehot_cm,
    )

    n = 1024
    r = np.random.default_rng(23)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    mask = r.random(n) < 0.9
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, use_pallas=False
    )
    got, npts = _accumulate_pallas_v4(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    assert int(npts) == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    cnt = np.maximum(np.asarray(ref[3]), 1)
    cd = np.abs(np.asarray(got[:3]) - np.asarray(ref[:3])) / cnt
    kx, kz = _v4_shifts(LEAF, LEAF_Z)
    # half a quantization step + f32 slop per point; centroids are means of
    # per-point errors so the same bound holds
    assert cd[:2].max() < 2.0 ** -(kx + 1) + 1e-5
    assert cd[2].max() < 2.0 ** -(kz + 1) + 1e-5
    got2, _ = _accumulate_pallas_v4(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_v5_matches_v4_bit_identical(rng):
    """The MXU-natural v5 accumulator (interpret) == v4 bit-for-bit —
    including masked-out points, NaN coordinates, and out-of-bounds points
    (all of which must select no one-hot lane), the SMEM valid-point count,
    and the pre-staged channel-major operand path."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _accumulate_pallas_v5,
        _v5_exact_n,
    )

    assert _v5_exact_n(106496) and not _v5_exact_n(1 << 18)
    n = 1024
    r = np.random.default_rng(29)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    pts[7, 1] = np.nan          # NaN coordinate -> dropped in-kernel
    pts[11] = [999.0, 999.0, 999.0]  # far out of bounds
    mask = r.random(n) < 0.85
    ref, n4 = _accumulate_pallas_v4(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    got, n5 = _accumulate_pallas_v5(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(n5) == int(n4) == int(mask.sum())
    # pre-staged channel-major operand: same result
    got2, _ = _accumulate_pallas_v5(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
        points_cm=jnp.asarray(np.ascontiguousarray(pts.T)),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def _digit_sums_from_fast_acc(acc, scene, leaf_xy, leaf_z):
    """Invert the v4 finalize: recover the exact-integer digit sums per cell
    from a finalized fast-mode accumulator (f64 inversion — the per-cell
    digit sum is |.| < 2^24, far inside f64 exactness)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import _v4_shifts

    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    lin = np.arange(gx * gy * gz)
    ix = lin % gx
    iyz = lin // gx
    iy = iyz % gy
    iz = iyz // gy
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    f32 = np.float32
    cx = (bx + ix).astype(f32) * f32(leaf_xy) + f32(0.5 * leaf_xy)
    cy = (by + iy).astype(f32) * f32(leaf_xy) + f32(0.5 * leaf_xy)
    cz = (bz + iz).astype(f32) * f32(leaf_z) + f32(0.5 * leaf_z)
    a = np.asarray(acc, np.float64)
    cnt = a[3]
    return np.stack(
        [
            np.round((a[0] - cnt * cx) * 2.0**kx),
            np.round((a[1] - cnt * cy) * 2.0**kx),
            np.round((a[2] - cnt * cz) * 2.0**kz),
            cnt,
        ]
    )


def test_jnp_fast_matches_kernel(rng):
    """quant="fast" is a CONFIG property, not a backend artifact (VERDICT r4
    #2): the jnp one-hot lowering with quant="fast" quantizes EXACTLY like
    the v4/v5 kernels — identical integer digit sums and counts per cell
    (same f32 quantize/digit products, exact integer one-hot accumulation),
    including masked / NaN / out-of-bounds points.  The finalized f32 sums
    agree to 1 ulp (the mul+add finalize may or may not contract to an FMA
    depending on which XLA program it lands in)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        voxel_accumulate_onehot_cm,
    )

    n = 1024
    r = np.random.default_rng(41)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    pts[5, 0] = np.nan
    pts[13] = [-999.0, 999.0, 0.0]
    mask = r.random(n) < 0.85
    ref, nk = _accumulate_pallas_v4(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    got, nj = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        use_pallas=False, quant="fast", with_npts=True,
    )
    assert int(nj) == int(nk) == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_array_equal(
        _digit_sums_from_fast_acc(got, SCENE, LEAF, LEAF_Z),
        _digit_sums_from_fast_acc(ref, SCENE, LEAF, LEAF_Z),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-7, atol=1e-7
    )
    # exact mode stays the bf16x3 scheme: differs from fast by the
    # quantization bound, not bit-identical
    exact = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        use_pallas=False, quant="exact",
    )
    np.testing.assert_array_equal(np.asarray(exact[3]), np.asarray(got[3]))
    assert not np.array_equal(np.asarray(exact[:3]), np.asarray(got[:3]))


def test_stacked_accumulator_v5_bit_identical(rng):
    """The batched v5 accumulator == the per-frame v5/v4 kernels,
    bit-for-bit, with per-frame masks."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _accumulate_pallas_v5_stacked,
    )

    s, n = 3, 1024
    r = np.random.default_rng(31)
    pts = np.stack(
        [
            r.uniform(-3, 3, (s, n)),
            r.uniform(-2, 7, (s, n)),
            r.uniform(-0.5, 2.5, (s, n)),
        ],
        axis=2,
    ).astype(np.float32)
    mask = r.random((s, n)) < 0.8
    got, npts = _accumulate_pallas_v5_stacked(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    for i in range(s):
        ref, n1 = _accumulate_pallas_v4(
            jnp.asarray(pts[i]), jnp.asarray(mask[i]), SCENE, LEAF, LEAF_Z,
            block=512, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))
        assert int(npts[i]) == int(n1) == int(mask[i].sum())


def test_raw_stacked_accumulators_match_fused(rng):
    """The raw (no-in-kernel-finalize) stacked accumulators + the jnp
    finalizers == the fused stacked kernels: counts and integer digit sums
    identical, finalized f32 sums to 1 ulp (FMA-contraction freedom at the
    program boundary).  This is the space-sharded fleet's accumulate path
    (psum rides the raw exact integers — parallel/sharding.py)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4_stacked_raw,
        _accumulate_pallas_v5_stacked,
        _accumulate_pallas_v5_stacked_raw,
        _accumulate_pallas_v6_stacked,
        _accumulate_pallas_v6_stacked_raw,
        _accumulate_pallas_v3_stacked_raw,
        finalize_exact_digits,
        finalize_fast_digits,
    )

    s, n = 2, 1024
    r = np.random.default_rng(43)
    pts = np.stack(
        [
            r.uniform(-3, 3, (s, n)),
            r.uniform(-2, 7, (s, n)),
            r.uniform(-0.5, 2.5, (s, n)),
        ],
        axis=2,
    ).astype(np.float32)
    pts[0, 9, 2] = np.nan
    mask = r.random((s, n)) < 0.85
    args = (jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z)

    # fast scheme: raw v5 (f32 sums) == raw v4 (i32 sums) == fused v5
    fused, n_f = _accumulate_pallas_v5_stacked(*args, block=512, interpret=True)
    raw5, n_5 = _accumulate_pallas_v5_stacked_raw(*args, block=512, interpret=True)
    raw4, n_4 = _accumulate_pallas_v4_stacked_raw(*args, block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(raw5), np.asarray(raw4))
    np.testing.assert_array_equal(np.asarray(n_5), np.asarray(n_4))
    np.testing.assert_array_equal(np.asarray(n_5), np.asarray(n_f))
    fin = finalize_fast_digits(raw5, SCENE, LEAF, LEAF_Z)
    np.testing.assert_array_equal(np.asarray(fin[:, 3]), np.asarray(fused[:, 3]))
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(fused), rtol=3e-7, atol=1e-7
    )
    for i in range(s):
        np.testing.assert_array_equal(
            _digit_sums_from_fast_acc(fin[i], SCENE, LEAF, LEAF_Z),
            _digit_sums_from_fast_acc(fused[i], SCENE, LEAF, LEAF_Z),
        )

    # exact scheme: raw v6 (f32 sums) == raw v3 (i32 sums) == fused v6
    fused6, m_f = _accumulate_pallas_v6_stacked(*args, block=512, interpret=True)
    raw6, m_6 = _accumulate_pallas_v6_stacked_raw(*args, block=512, interpret=True)
    raw3, m_3 = _accumulate_pallas_v3_stacked_raw(*args, block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(raw6), np.asarray(raw3))
    np.testing.assert_array_equal(np.asarray(m_6), np.asarray(m_3))
    np.testing.assert_array_equal(np.asarray(m_6), np.asarray(m_f))
    fin6 = finalize_exact_digits(raw6, SCENE, LEAF, LEAF_Z)
    np.testing.assert_array_equal(np.asarray(fin6[:, 3]), np.asarray(fused6[:, 3]))
    np.testing.assert_allclose(
        np.asarray(fin6), np.asarray(fused6), rtol=3e-7, atol=1e-7
    )


def test_v6_matches_v3(rng):
    """The MXU-natural EXACT accumulator v6 (interpret) == v3 bit-for-bit —
    same two-balanced-digit quantization + finalize, f32 digit sums
    integer-exact under _v6_exact_n — including masked-out points, NaN
    coordinates, out-of-bounds points, the SMEM valid-point count, and the
    pre-staged channel-major operand path."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        _accumulate_pallas_v6,
        _v6_exact_n,
    )

    assert _v6_exact_n(106496) and not _v6_exact_n(1 << 17)
    n = 1024
    r = np.random.default_rng(37)
    pts = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 7, n), r.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    pts[7, 1] = np.nan          # NaN coordinate -> dropped in-kernel
    pts[11] = [999.0, 999.0, 999.0]  # far out of bounds
    mask = r.random(n) < 0.85
    ref, n3 = _accumulate_pallas_v3(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    got, n6 = _accumulate_pallas_v6(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(n6) == int(n3) == int(mask.sum())
    # pre-staged channel-major operand: same result
    got2, _ = _accumulate_pallas_v6(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
        points_cm=jnp.asarray(np.ascontiguousarray(pts.T)),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_stacked_accumulator_v6_bit_identical(rng):
    """The batched v6 accumulator == the per-frame v3 kernel, bit-for-bit,
    with per-frame masks."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        _accumulate_pallas_v6_stacked,
    )

    s, n = 3, 1024
    r = np.random.default_rng(41)
    pts = np.stack(
        [
            r.uniform(-3, 3, (s, n)),
            r.uniform(-2, 7, (s, n)),
            r.uniform(-0.5, 2.5, (s, n)),
        ],
        axis=2,
    ).astype(np.float32)
    mask = r.random((s, n)) < 0.8
    got, npts = _accumulate_pallas_v6_stacked(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    for i in range(s):
        ref, n1 = _accumulate_pallas_v3(
            jnp.asarray(pts[i]), jnp.asarray(mask[i]), SCENE, LEAF, LEAF_Z,
            block=512, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))
        assert int(npts[i]) == int(n1) == int(mask[i].sum())


def test_centroid_pallas_matches_table_path(rng):
    """The VMEM circumcenter kernel (interpret) == the jnp table path on
    grid-like coordinates (exact tie-break agreement)."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import (
        circumcenter_features_table,
    )
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        circumcenter_features_table_pallas,
    )

    r = np.random.default_rng(5)
    cc, p = 8, 64
    mpts = np.zeros((cc, p, 3), np.float32)
    mm = np.zeros((cc, p), bool)
    for c in range(cc):
        n = int(r.integers(0, p))
        mpts[c, :n] = np.round(r.normal(0, 1, (n, 3)) * 10) / 10
        mm[c, :n] = True
    ref = circumcenter_features_table(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    got = circumcenter_features_table_pallas(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3), interpret=True
    )
    ok = mm.any(axis=1)
    np.testing.assert_allclose(
        np.asarray(got)[ok], np.asarray(ref)[ok], rtol=0, atol=1e-5
    )


def test_centroid_pallas_v2_matches_table_path(rng):
    """The vectorized predicated circumcenter kernel (interpret) == the jnp
    table path, including exact tie-break agreement on grid-like
    coordinates, empty slots, singletons, and collinear clusters."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import (
        circumcenter_features_table,
    )
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        circumcenter_features_table_pallas_v2,
    )

    r = np.random.default_rng(11)
    cc, p = 8, 64
    mpts = np.zeros((cc, p, 3), np.float32)
    mm = np.zeros((cc, p), bool)
    for c in range(cc - 3):
        n = int(r.integers(0, p))
        mpts[c, :n] = np.round(r.normal(0, 1, (n, 3)) * 10) / 10
        mm[c, :n] = True
    # singleton cluster
    mpts[cc - 3, 0] = [1.0, 2.0, 0.5]
    mm[cc - 3, 0] = True
    # collinear cluster (G == 0 fallback to Pi)
    for k in range(5):
        mpts[cc - 2, k] = [0.1 * k, 0.2 * k, 0.0]
    mm[cc - 2, :5] = True
    # cc-1 stays empty
    ref = circumcenter_features_table(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    got = circumcenter_features_table_pallas_v2(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3), interpret=True
    )
    ok = mm.any(axis=1)
    np.testing.assert_allclose(
        np.asarray(got)[ok], np.asarray(ref)[ok], rtol=0, atol=1e-5
    )

    # multi-slab shape (P = 256 -> two 128-row slabs): cluster sizes chosen
    # to land in one slab, straddle the boundary, and fill both
    cc2, p2 = 4, 256
    mpts2 = np.zeros((cc2, p2, 3), np.float32)
    mm2 = np.zeros((cc2, p2), bool)
    for c, nmem in enumerate([40, 128, 130, 250]):
        mpts2[c, :nmem] = np.round(r.normal(0, 1, (nmem, 3)) * 10) / 10
        mm2[c, :nmem] = True
    ref2 = circumcenter_features_table(
        jnp.asarray(mpts2), jnp.asarray(mm2), jnp.float32(0.3)
    )
    got2 = circumcenter_features_table_pallas_v2(
        jnp.asarray(mpts2), jnp.asarray(mm2), jnp.float32(0.3), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(ref2), rtol=0, atol=1e-5
    )


def test_pair_stats_dyn_matches_unrolled(rng):
    """The dynamic-trip-count pair-stats kernel (_kernel_v5_dyn, interpret)
    == the unrolled _kernel_v3, BIT-for-bit, at every slab setting and
    across activity patterns: contiguous rank-ordered slots (the cluster
    table's guarantee), interior empty slots, all-empty, singletons, and
    the production multi-slab shape."""
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        pair_stats_pallas,
        pair_stats_pallas_dyn,
    )

    r = np.random.default_rng(23)
    cases = [
        (8, 384, [300, 250, 180, 40, 0, 0, 0, 0]),   # bench-like
        (8, 384, [0, 0, 7, 0, 1, 50, 0, 0]),         # gaps + singleton
        (4, 384, [0, 0, 0, 0]),                      # all empty
        (4, 256, [256, 3, 129, 9]),                  # non-384 P, slab edge
    ]
    for cc, p, sizes in cases:
        mpts = np.zeros((cc, p, 3), np.float32)
        mm = np.zeros((cc, p), bool)
        for c, n in enumerate(sizes):
            mpts[c, :n] = np.round(r.normal(0, 1, (n, 3)) * 10) / 10
            mm[c, :n] = True
        ref = pair_stats_pallas(
            jnp.asarray(mpts), jnp.asarray(mm), interpret=True
        )
        for slab in (128, p):
            got = pair_stats_pallas_dyn(
                jnp.asarray(mpts), jnp.asarray(mm), interpret=True,
                slab_rows=slab,
            )
            np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
            np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_stacked_fused_cc_matches_per_frame(rng, fixture_map):
    """fused_finalize_static_cc_stacked (interpret) == per-frame
    fused_finalize_static_cc, frame by frame, bit-for-bit."""
    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        fused_finalize_static_cc,
        fused_finalize_static_cc_stacked,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        build_cell_static_table,
        build_static_mask,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        voxel_accumulate_onehot_cm,
    )

    env = build_static_mask(fixture_map, 4, 50)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)
    table = build_cell_static_table(env, SCENE, LEAF, *dims)
    assert table is not None
    scal = jnp.stack(
        [env.origin_x, env.origin_y, env.cos_nyaw, env.sin_nyaw,
         env.inv_resolution, jnp.float32(TOL * TOL)]
    )

    r = np.random.default_rng(41)
    s, n = 3, 1500
    accs = []
    for k in range(s):
        pts = np.stack(
            [r.uniform(-2.5, 2.5, n), r.uniform(-1.5, 5.5, n), r.uniform(0, 2, n)],
            axis=1,
        ).astype(np.float32)
        accs.append(
            voxel_accumulate_onehot_cm(
                jnp.asarray(pts), jnp.ones(n, bool), SCENE, LEAF, LEAF_Z,
                use_pallas=False,
            ).astype(jnp.float32)
        )
    accs_j = jnp.stack(accs)

    kw = dict(dims=dims, tol=TOL, leaf_xy=LEAF, leaf_z=LEAF_Z, kwin=table.k,
              interpret=True)
    cents, dyns, labs, nsws, sats = fused_finalize_static_cc_stacked(
        accs_j, scal, table.base_row, table.base_col, table.bits, **kw
    )
    for k in range(s):
        cent, dyn, lab, nsw, sat = fused_finalize_static_cc(
            accs[k], scal, table.base_row, table.base_col, table.bits, **kw
        )
        np.testing.assert_array_equal(np.asarray(cents[k]), np.asarray(cent))
        np.testing.assert_array_equal(np.asarray(dyns[k]), np.asarray(dyn))
        np.testing.assert_array_equal(np.asarray(labs[k]), np.asarray(lab))
        assert int(nsws[k]) == int(nsw)
        assert int(sats[k]) == int(sat)


def test_stacked_accumulator_bit_identical(rng):
    """The batched (S, N, 3) accumulator == the per-frame kernel,
    bit-for-bit (integer digit sums)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        _accumulate_pallas_v3_stacked,
    )

    r = np.random.default_rng(31)
    s, n = 3, 1024
    pts = np.stack(
        [r.uniform(-3, 3, (s, n)), r.uniform(-2, 7, (s, n)), r.uniform(-0.5, 2.5, (s, n))],
        axis=2,
    ).astype(np.float32)
    mask = r.random((s, n)) < 0.9
    got, npts = _accumulate_pallas_v3_stacked(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(npts), mask.sum(axis=1))
    for k in range(s):
        ref, _ = _accumulate_pallas_v3(
            jnp.asarray(pts[k]), jnp.asarray(mask[k]), SCENE, LEAF, LEAF_Z,
            block=512, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref))


def test_stacked_accumulator_v4_bit_identical(rng):
    """The batched single-digit (quant="fast") accumulator == the per-frame
    v4 kernel, bit-for-bit (integer digit sums)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _accumulate_pallas_v4_stacked,
    )

    r = np.random.default_rng(37)
    s, n = 3, 1024
    pts = np.stack(
        [r.uniform(-3, 3, (s, n)), r.uniform(-2, 7, (s, n)), r.uniform(-0.5, 2.5, (s, n))],
        axis=2,
    ).astype(np.float32)
    mask = r.random((s, n)) < 0.9
    got, npts = _accumulate_pallas_v4_stacked(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(npts), mask.sum(axis=1))
    for k in range(s):
        ref, _ = _accumulate_pallas_v4(
            jnp.asarray(pts[k]), jnp.asarray(mask[k]), SCENE, LEAF, LEAF_Z,
            block=512, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref))


def test_accumulator_negative_mask_semantics(rng):
    """Docstrings promise "nonzero = keep": a mask of -1.0 keeps a point in
    the kernels (interpret) exactly like the jnp path (review r3: kernels
    used to test mask > 0 and silently dropped negative-valued masks)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        _accumulate_pallas_v4,
        voxel_accumulate_onehot_cm,
    )

    n = 512
    r = np.random.default_rng(47)
    pts = np.stack(
        [r.uniform(-1.5, 1.5, n), r.uniform(-0.5, 4.5, n), r.uniform(0.2, 1.8, n)],
        axis=1,
    ).astype(np.float32)
    mask = np.where(r.random(n) < 0.5, -1.0, 0.0).astype(np.float32)
    ref = voxel_accumulate_onehot_cm(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z, use_pallas=False
    )
    got3, n3 = _accumulate_pallas_v3(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    got4, n4 = _accumulate_pallas_v4(
        jnp.asarray(pts), jnp.asarray(mask), SCENE, LEAF, LEAF_Z,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got3[3]), np.asarray(ref[3]))
    np.testing.assert_array_equal(np.asarray(got4[3]), np.asarray(ref[3]))
    assert int(n3) == int((mask != 0).sum()) == int(n4)
