"""On-device parity of every Pallas kernel against its jnp twin."""

import numpy as np

import jax
import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.config import SceneBounds

SCENE = SceneBounds(x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0)
LEAF, LEAF_Z, TOL = 0.1, 2.0, 0.15


def _points(rng, n):
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 10, n), rng.uniform(-0.5, 2.5, n)],
        axis=1,
    ).astype(np.float32)
    mask = rng.random(n) < 0.9
    return jnp.asarray(pts), jnp.asarray(mask)


def test_v3_accumulator_hw(rng):
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        voxel_accumulate_onehot_cm,
    )

    pts, mask = _points(rng, 8192)
    ref = voxel_accumulate_onehot_cm(pts, mask, SCENE, LEAF, LEAF_Z, use_pallas=False)
    got, npts3 = _accumulate_pallas_v3(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    assert int(npts3) == int(np.asarray(mask).sum())
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    cnt = np.maximum(np.asarray(ref[3]), 1)
    cd = np.abs(np.asarray(got[:3]) - np.asarray(ref[:3])) / cnt
    assert cd[:2].max() < 5e-6
    assert cd[2].max() < 6e-5
    # bit-determinism on-device: two executions agree exactly
    got2, _ = _accumulate_pallas_v3(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_v6_accumulator_hw(rng):
    """MXU-natural EXACT kernel on hardware: bit-identical to the v3 it
    replaces on the exact path (same digits, f32 sums integer-exact under
    _v6_exact_n), bit-deterministic across executions."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v3,
        _accumulate_pallas_v6,
    )

    pts, mask = _points(rng, 8192)
    ref, n3 = _accumulate_pallas_v3(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    got, n6 = _accumulate_pallas_v6(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    assert int(n6) == int(n3) == int(np.asarray(mask).sum())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    got2, _ = _accumulate_pallas_v6(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_v5_accumulator_hw(rng):
    """MXU-natural FAST kernel on hardware — the kernel the library default
    executes on single-frame dispatches (VERDICT r4 #8): bit-identical to
    the v4 it replaces (same single-digit quantization, f32 sums integer-
    exact under _v5_exact_n), bit-deterministic across executions."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _accumulate_pallas_v5,
    )

    pts, mask = _points(rng, 8192)
    ref, n4 = _accumulate_pallas_v4(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    got, n5 = _accumulate_pallas_v5(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    assert int(n5) == int(n4) == int(np.asarray(mask).sum())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    got2, _ = _accumulate_pallas_v5(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_raw_stacked_fast_hw(rng):
    """The space-sharded fleet's accumulate path on hardware: raw v5 digit
    sums + the jnp finalize reproduce the fused stacked v5's counts and
    integer digit sums exactly; finalized f32 sums to 1 ulp (FMA-contraction
    freedom at the program boundary)."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v5_stacked,
        _accumulate_pallas_v5_stacked_raw,
        finalize_fast_digits,
    )

    pts0, mask0 = _points(rng, 4096)
    pts = jnp.stack([pts0, pts0[::-1]])
    mask = jnp.stack([mask0, mask0[::-1]])
    fused, n_f = _accumulate_pallas_v5_stacked(
        pts, mask, SCENE, LEAF, LEAF_Z, block=2048
    )
    raw, n_r = _accumulate_pallas_v5_stacked_raw(
        pts, mask, SCENE, LEAF, LEAF_Z, block=2048
    )
    fin = finalize_fast_digits(raw, SCENE, LEAF, LEAF_Z)
    np.testing.assert_array_equal(np.asarray(n_r), np.asarray(n_f))
    np.testing.assert_array_equal(np.asarray(fin[:, 3]), np.asarray(fused[:, 3]))
    np.testing.assert_allclose(
        np.asarray(fin), np.asarray(fused), rtol=3e-7, atol=1e-7
    )


def test_v4_accumulator_hw(rng):
    """Single-digit (voxel_quant="fast") kernel on hardware: counts exact,
    centroids within the documented per-axis quantization bound,
    bit-deterministic across executions."""
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        _accumulate_pallas_v4,
        _v4_shifts,
        voxel_accumulate_onehot_cm,
    )

    pts, mask = _points(rng, 8192)
    ref = voxel_accumulate_onehot_cm(pts, mask, SCENE, LEAF, LEAF_Z, use_pallas=False)
    got, npts = _accumulate_pallas_v4(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    assert int(npts) == int(np.asarray(mask).sum())
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    cnt = np.maximum(np.asarray(ref[3]), 1)
    cd = np.abs(np.asarray(got[:3]) - np.asarray(ref[:3])) / cnt
    kx, kz = _v4_shifts(LEAF, LEAF_Z)
    assert cd[:2].max() < 2.0 ** -(kx + 1) + 1e-5
    assert cd[2].max() < 2.0 ** -(kz + 1) + 1e-5
    got2, _ = _accumulate_pallas_v4(pts, mask, SCENE, LEAF, LEAF_Z, block=2048)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_fused_finalize_static_cc_hw(rng):
    from multiple_object_tracking_lidar_tpu.ops.cluster_grid import (
        connected_components_grid,
    )
    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        fused_finalize_static_cc,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        build_cell_static_table,
        build_static_mask,
        remove_static_cells,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
        finalize_dense_cm,
        voxel_accumulate_onehot_cm,
    )
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml
    import os

    ymap = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    env = build_static_mask(load_map_yaml(ymap), 4, 50)
    dims = grid_shape(SCENE, LEAF, LEAF_Z)
    table = build_cell_static_table(env, SCENE, LEAF, *dims)
    assert table is not None

    pts, mask = _points(rng, 8192)
    acc = voxel_accumulate_onehot_cm(pts, mask, SCENE, LEAF, LEAF_Z, use_pallas=False)
    cent, occ, _ = finalize_dense_cm(acc)
    dyn = remove_static_cells(cent, occ, jax.device_put(env), jax.device_put(table))
    lab_ref, _, _ = connected_components_grid(cent, dyn, dims, TOL, LEAF, LEAF_Z, 64, 4)

    scal = jnp.stack(
        [env.origin_x, env.origin_y, env.cos_nyaw, env.sin_nyaw,
         env.inv_resolution, jnp.float32(TOL * TOL)]
    )
    cent_k, dyn_k, lab_k, nsw, cc_sat = fused_finalize_static_cc(
        acc, scal, table.base_row, table.base_col, table.bits,
        dims=dims, tol=TOL, leaf_xy=LEAF, leaf_z=LEAF_Z, kwin=table.k,
    )
    np.testing.assert_array_equal(np.asarray(dyn_k), np.asarray(dyn))
    np.testing.assert_array_equal(np.asarray(cent_k), np.asarray(cent))
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_ref))
    assert int(nsw) > 0
    assert int(cc_sat) == 0


def test_runs_voxelizer_hw(rng):
    from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_accumulate
    from multiple_object_tracking_lidar_tpu.ops.voxel_pallas import (
        voxel_accumulate_runs_cm,
    )

    pts, mask = _points(rng, 8192)
    ref = voxel_accumulate(pts, mask, SCENE, LEAF, LEAF_Z).T
    got = voxel_accumulate_runs_cm(pts, mask, SCENE, LEAF, LEAF_Z)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(ref[:3]), rtol=0, atol=2e-5
    )


def test_centroid_kernel_hw(rng):
    from multiple_object_tracking_lidar_tpu.ops.centroid import (
        circumcenter_features_table,
    )
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        circumcenter_features_table_pallas,
    )

    cc, p = 32, 384
    mpts = np.zeros((cc, p, 3), np.float32)
    mm = np.zeros((cc, p), bool)
    for c in range(6):
        n = int(rng.integers(30, 300))
        mpts[c, :n] = np.round(rng.normal(0, 1, (n, 3)) * 10) / 10
        mm[c, :n] = True
    ref = circumcenter_features_table(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    got = circumcenter_features_table_pallas(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    ok = mm.any(axis=1)
    np.testing.assert_allclose(
        np.asarray(got)[ok], np.asarray(ref)[ok], rtol=0, atol=1e-5
    )


def test_stacked_multi_equals_per_frame_hw(rng):
    """bind_env_multi == frame-by-frame bind_env on-device: bit-identical
    tracking chain.  On this onehot+grid f32 config bind_env_multi hoists
    the whole stack's accumulation into _accumulate_pallas_v3_stacked
    (round 3), so this also pins the stacked kernel against the per-frame
    path end-to-end; its unit parity coverage is
    tests/test_grid.py::test_stacked_accumulator_bit_identical."""
    import os

    from multiple_object_tracking_lidar_tpu.config import (
        Capacities,
        SceneBounds,
        TrackerConfig,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    ymap = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    grid = load_map_yaml(ymap)
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=10,
        cluster_backend="grid",
        voxel_mode="onehot",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
        ),
        caps=Capacities(
            n_max_points=2048, m_max_voxels=512, m_max_dynamic=256,
            c_max_clusters=16, p_max_cluster=64, k_max_tracks=16,
        ),
    )
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    tracker = Tracker(cfg)

    s, n = 4, 2048
    pts = np.asarray(rng.normal([0.5, 2.0, 0.5], 0.2, (s, n, 3)), np.float32)
    frames = Frame(
        points=jnp.asarray(pts),
        mask=jnp.ones((s, n), bool),
        t=jnp.arange(s, dtype=jnp.float32) * 0.1 + 0.1,
    )

    multi = tracker.bind_env_multi(env, donate_state=False)
    sm, outs = multi(tracker.init_state(), frames)

    step1 = tracker.bind_env(env, donate_state=False)
    s1 = tracker.init_state()
    for k in range(s):
        s1, out1 = step1(
            s1,
            Frame(points=frames.points[k], mask=frames.mask[k], t=frames.t[k]),
        )
    np.testing.assert_array_equal(np.asarray(outs.pos[-1]), np.asarray(out1.pos))
    np.testing.assert_array_equal(np.asarray(outs.vel[-1]), np.asarray(out1.vel))
    np.testing.assert_array_equal(
        np.asarray(sm.bank.window), np.asarray(s1.bank.window)
    )


def test_assoc_scan_kernel_hw(rng):
    """VMEM association-scan kernel compiled for the real Mosaic target ==
    jnp lax.scan decisions, on conflict-heavy frames (duplicate gating,
    in-frame register-then-match, interp gaps).  CPU-side parity lives in
    tests/test_assign_pallas.py; this asserts the on-device compile."""
    import jax.numpy as jnp

    from multiple_object_tracking_lidar_tpu.ops.assign import associate_and_update
    from multiple_object_tracking_lidar_tpu.tracker.state import init_state

    K, L = 16, 6
    st = init_state(K, L, jnp.float32)
    bank = st.bank
    n_alive = 6
    window = np.zeros((K, L, 4), np.float32)
    pos = rng.uniform(-2, 2, (n_alive, 2)).astype(np.float32)
    window[:n_alive, :, 0] = pos[:, 0:1]
    window[:n_alive, :, 1] = pos[:, 1:2]
    bank = bank._replace(
        alive=jnp.asarray(np.arange(K) < n_alive),
        obj_id=jnp.asarray(np.where(np.arange(K) < n_alive, np.arange(K), -1).astype(np.int32)),
        birth_seq=jnp.asarray(np.where(np.arange(K) < n_alive, np.arange(K), 2**30).astype(np.int32)),
        window=jnp.asarray(window),
    )
    D = 24
    dets = np.zeros((D, 4), np.float32)
    dets[:, :2] = np.repeat(pos, 4, axis=0)[:D] + rng.normal(0, 0.2, (D, 2))
    dets[:, 3] = rng.choice([0.1, 0.55], D)
    dv = rng.uniform(size=D) > 0.15
    args = (
        bank,
        jnp.int32(n_alive),
        jnp.int32(n_alive),
        jnp.asarray(dets),
        jnp.asarray(dv),
    )
    kw = dict(id_threshold=0.5, dt_gp=0.1)
    a = associate_and_update(*args, backend="jnp", **kw)
    b = associate_and_update(*args, backend="pallas", **kw)
    ok = np.asarray(a.det_ok)
    for name in a._fields:
        x, y = getattr(a, name), getattr(b, name)
        if name == "bank":
            for bn in x._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(x, bn)), np.asarray(getattr(y, bn)),
                    err_msg=f"bank.{bn}",
                )
        elif name == "det_slot":
            np.testing.assert_array_equal(
                np.asarray(x)[ok], np.asarray(y)[ok], err_msg="det_slot[ok]"
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=name
            )


def test_sharded_fleet_step_hw(rng):
    """ShardedTracker's fleet step compiles and runs on the REAL chip with a
    1x1 mesh.  The CPU-mesh suite cannot catch TPU-only shard_map failures —
    e.g. the association kernel's VMA-less outputs under shard_map+vmap
    (round 3) — because kernels are auto-disabled on the cpu backend."""
    import os

    from multiple_object_tracking_lidar_tpu.config import (
        Capacities,
        SceneBounds,
        TrackerConfig,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.parallel.sharding import (
        ShardedTracker,
        make_mesh,
    )
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    ymap = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    grid = load_map_yaml(ymap)
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=10,
        cluster_backend="grid",
        voxel_mode="onehot",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
        ),
        caps=Capacities(
            n_max_points=2048, m_max_voxels=512, m_max_dynamic=256,
            c_max_clusters=16, p_max_cluster=64, k_max_tracks=16,
        ),
    )
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    tracker = Tracker(cfg)
    st = ShardedTracker(tracker, make_mesh(1, 1))

    b, n = 2, 2048
    pts = np.asarray(rng.normal([0.5, 2.0, 0.5], 0.2, (b, n, 3)), np.float32)
    state = st.init_state(b)
    state, out = st.step(
        state,
        jnp.asarray(pts),
        jnp.ones((b, n), bool),
        jnp.full((b,), 0.1, jnp.float32),
        jax.device_put(env),
    )
    jax.block_until_ready(out)
    assert out.n_points.shape == (b,)
    assert int(out.n_points[0]) == n


def test_pipelined_dispatch_hw(rng):
    """bind_env_pipelined works on the onehot+grid kernel config on real
    hardware (round 3: it used to crash — Mosaic rejects the per-frame
    kernels' 1-D scalar outputs under vmap; it now delegates to the multi
    program there) and its outputs match bind_env_multi."""
    import os

    from multiple_object_tracking_lidar_tpu.config import (
        Capacities,
        SceneBounds,
        TrackerConfig,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    ymap = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    grid = load_map_yaml(ymap)
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=10,
        cluster_backend="grid",
        voxel_mode="onehot",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
        ),
        caps=Capacities(
            n_max_points=2048, m_max_voxels=512, m_max_dynamic=256,
            c_max_clusters=16, p_max_cluster=64, k_max_tracks=16,
        ),
    )
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    tracker = Tracker(cfg)

    s, n = 4, 2048
    pts = np.asarray(rng.normal([0.5, 2.0, 0.5], 0.2, (s, n, 3)), np.float32)
    frames = Frame(
        points=jnp.asarray(pts),
        mask=jnp.ones((s, n), bool),
        t=jnp.arange(s, dtype=jnp.float32) * 0.1 + 0.1,
    )
    run = tracker.bind_env_pipelined(env, donate_state=False)
    multi = tracker.bind_env_multi(env, donate_state=False)
    s1, o1 = run(tracker.init_state(), frames)
    s2, o2 = multi(tracker.init_state(), frames)
    np.testing.assert_array_equal(np.asarray(o1.obj_id), np.asarray(o2.obj_id))
    np.testing.assert_array_equal(np.asarray(o1.pos), np.asarray(o2.pos))


def test_centroid_v2_kernel_hw(rng):
    """The predicated pair-stats kernel + shared jnp tail (the grid path's
    default) == the jnp table path ON HARDWARE.  Pins the TPU-only bf16
    DEFAULT-precision hazard: the one-hot extraction dots must run at
    HIGHEST precision or pi/pj/pk come back bf16-rounded (~1e-2 absolute at
    scene coordinates), breaking value-equality skips and G == 0."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import (
        circumcenter_features_table,
    )
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        circumcenter_features_table_pallas_v2,
    )

    cc, p = 32, 384
    mpts = np.zeros((cc, p, 3), np.float32)
    mm = np.zeros((cc, p), bool)
    for c in range(6):
        n = int(rng.integers(30, 300))
        mpts[c, :n] = np.round(rng.normal(0, 1, (n, 3)) * 10) / 10
        mm[c, :n] = True
    # collinear cluster: exercises the G == 0 fallback on-device
    for k in range(5):
        mpts[6, k] = [0.1 * k, 0.2 * k, 0.0]
    mm[6, :5] = True
    ref = circumcenter_features_table(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    got = circumcenter_features_table_pallas_v2(
        jnp.asarray(mpts), jnp.asarray(mm), jnp.float32(0.3)
    )
    ok = mm.any(axis=1)
    np.testing.assert_allclose(
        np.asarray(got)[ok], np.asarray(ref)[ok], rtol=0, atol=1e-5
    )


def test_multi_falls_back_on_undividable_n_hw(rng):
    """bind_env_multi with an N no accumulator block divides falls back to
    the per-frame scan instead of under-iterating the stacked kernel grid
    (review r3: a capacity-derived block could silently drop points)."""
    import os

    from multiple_object_tracking_lidar_tpu.config import (
        Capacities,
        SceneBounds,
        TrackerConfig,
    )
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    ymap = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    grid = load_map_yaml(ymap)
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=10,
        cluster_backend="grid",
        voxel_mode="onehot",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=2.0
        ),
        caps=Capacities(
            n_max_points=2048, m_max_voxels=512, m_max_dynamic=256,
            c_max_clusters=16, p_max_cluster=64, k_max_tracks=16,
        ),
    )
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    tracker = Tracker(cfg)

    s, n = 3, 1500  # no block divides 1500
    pts = np.asarray(rng.normal([0.5, 2.0, 0.5], 0.2, (s, n, 3)), np.float32)
    frames = Frame(
        points=jnp.asarray(pts),
        mask=jnp.ones((s, n), bool),
        t=jnp.arange(s, dtype=jnp.float32) * 0.1 + 0.1,
    )
    multi = tracker.bind_env_multi(env, donate_state=False)
    step1 = tracker.bind_env(env, donate_state=False)
    sm, om = multi(tracker.init_state(), frames)
    s1 = tracker.init_state()
    for k in range(s):
        s1, o1 = step1(s1, Frame(frames.points[k], frames.mask[k], frames.t[k]))
    assert int(om.n_points[0]) == n  # every point counted, none dropped
    np.testing.assert_array_equal(np.asarray(om.obj_id[-1]), np.asarray(o1.obj_id))
    np.testing.assert_array_equal(np.asarray(om.pos[-1]), np.asarray(o1.pos))


def test_pair_stats_dyn_kernel_hw(rng):
    """The dynamic-trip-count pair-stats kernel (_kernel_v5_dyn — what the
    grid path's default wrapper now executes) is BIT-identical on hardware
    to the unrolled _kernel_v3, at both slab settings, including interior
    empty slots the dynamic bound must step over."""
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        pair_stats_pallas,
        pair_stats_pallas_dyn,
    )

    cc, p = 32, 384
    mpts = np.zeros((cc, p, 3), np.float32)
    mm = np.zeros((cc, p), bool)
    for c in range(5):
        n = int(rng.integers(30, 340))
        mpts[c, :n] = np.round(rng.normal(0, 1, (n, 3)) * 10) / 10
        mm[c, :n] = True
    mpts[7, 0] = [1.0, 2.0, 0.5]  # singleton after a 2-slot gap
    mm[7, 0] = True
    ref = pair_stats_pallas(jnp.asarray(mpts), jnp.asarray(mm))
    for slab in (128, p):
        got = pair_stats_pallas_dyn(
            jnp.asarray(mpts), jnp.asarray(mm), slab_rows=slab
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
