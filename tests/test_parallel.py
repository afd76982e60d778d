"""Multi-chip sharding on the CPU-emulated 8-device mesh (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
from multiple_object_tracking_lidar_tpu.parallel.sharding import ShardedTracker, make_mesh
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
from multiple_object_tracking_lidar_tpu.tracker.state import Frame


def _cfg():
    return TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=6,
        caps=Capacities(
            n_max_points=512,
            m_max_voxels=256,
            m_max_dynamic=128,
            c_max_clusters=8,
            p_max_cluster=32,
            k_max_tracks=8,
        ),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_fleet_matches_single_device(fixture_map, rng):
    cfg = _cfg()
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    mesh = make_mesh(4, 2)
    st = ShardedTracker(tracker, mesh)

    b, n = 8, cfg.caps.n_max_points
    points = np.stack(
        [
            rng.uniform(-2.0, 2.0, (b, n)),
            rng.uniform(-1.0, 9.0, (b, n)),
            rng.uniform(0.0, 1.0, (b, n)),
        ],
        axis=2,
    ).astype(np.float32)
    mask = np.ones((b, n), bool)
    t = np.full(b, 0.1, np.float32)

    bstate = st.init_state(b)
    bstate, bout = st.step(bstate, jnp.asarray(points), jnp.asarray(mask), jnp.asarray(t), env)
    bout = jax.tree.map(np.asarray, bout)

    # reference: per-stream single-device steps
    for i in range(b):
        s = tracker.init_state()
        f = Frame(points=jnp.asarray(points[i]), mask=jnp.asarray(mask[i]), t=jnp.float32(0.1))
        s, out = tracker.step(s, f, env)
        out = jax.tree.map(np.asarray, out)
        assert int(bout.n_clusters[i]) == int(out.n_clusters)
        assert int(bout.n_dynamic[i]) == int(out.n_dynamic)
        np.testing.assert_array_equal(bout.obj_id[i], out.obj_id)
        np.testing.assert_allclose(bout.raw_centroid[i], out.raw_centroid, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_giant_cloud_point_sharded_clustering_matches_single_device(fixture_map, rng):
    """Cross-chip SINGLE-CLOUD clustering (SURVEY §7 P7): one cloud's points
    sharded over the full 8-device space axis cluster identically to the
    unsharded single-device step.

    No halo exchange is needed in this design: voxel accumulation is
    additive, so the one `psum` of the (small, dense) grid IS the complete
    boundary exchange — the grid-backend clustering then runs on the full
    global grid on every device, bit-identically to one chip.  This covers
    the dense-grid backend (capacity-free clustering) explicitly."""
    from multiple_object_tracking_lidar_tpu.config import SceneBounds

    cfg = _cfg().replace(
        cluster_backend="grid",
        voxel_mode="dense",
        scene=SceneBounds(
            x_min=-2.6, x_max=2.6, y_min=-1.6, y_max=9.6, z_min=0.0, z_max=1.0
        ),
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    mesh = make_mesh(1, 8)  # ONE stream, points sharded over all 8 devices
    st = ShardedTracker(tracker, mesh)

    n = cfg.caps.n_max_points
    # two clusters spanning shard boundaries (points are interleaved across
    # shards by position in the array, so every object straddles every shard)
    obj1 = rng.normal([0.5, 2.0, 0.5], 0.15, (n // 2, 3))
    obj2 = rng.normal([-0.8, 5.0, 0.5], 0.15, (n - n // 2, 3))
    points = np.concatenate([obj1, obj2]).astype(np.float32)
    rng.shuffle(points)
    mask = np.ones(n, bool)

    bstate = st.init_state(1)
    bstate, bout = st.step(
        bstate,
        jnp.asarray(points[None]),
        jnp.asarray(mask[None]),
        jnp.asarray([0.1], np.float32),
        env,
    )
    bout = jax.tree.map(np.asarray, bout)

    s = tracker.init_state()
    s, out = tracker.step(
        s,
        Frame(points=jnp.asarray(points), mask=jnp.asarray(mask), t=jnp.float32(0.1)),
        env,
    )
    out = jax.tree.map(np.asarray, out)

    assert int(out.n_clusters) == 2
    assert int(bout.n_clusters[0]) == int(out.n_clusters)
    assert int(bout.n_dynamic[0]) == int(out.n_dynamic)
    np.testing.assert_array_equal(bout.obj_id[0], out.obj_id)
    np.testing.assert_allclose(
        bout.raw_centroid[0], out.raw_centroid, rtol=0, atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_kernel_fleet_matches_single_device_kernel_step(fixture_map, rng):
    """VERDICT r3 #1: the sharded program must take the KERNEL path.  The
    kernel fleet (onehot+grid config, kernel_path='on') runs the stacked
    Pallas accumulate + the fused-CC / predicated-circumcenter / association
    kernels UNVMAPPED per device (interpret mode on this CPU mesh,
    real Mosaic on TPU — grid_cc/assoc_backend='pallas' force the kernels:
    if they could not lower under shard_map, this test would error rather
    than silently degrade).  Two chained steps per stream must match the
    single-device kernel step bit-exactly."""
    from multiple_object_tracking_lidar_tpu.io.scenario import (
        Scenario,
        ScenarioObject,
    )

    cfg = _cfg().replace(
        voxel_mode="onehot",
        cluster_backend="grid",
        grid_cc="pallas",
        assoc_backend="pallas",
        dtype="float32",
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    mesh = make_mesh(4, 2)
    st = ShardedTracker(tracker, mesh, kernel_path="on")
    assert st._use_kernel_fleet

    b, n = 8, cfg.caps.n_max_points
    # per-stream scenarios with REAL objects so clusters/tracks exist
    frames = []
    for s in range(b):
        sc = Scenario(
            grid=fixture_map,
            objects=[
                ScenarioObject(0.0 + 0.1 * s, 1.0, 0.0, 0.4, points_per_frame=40),
                ScenarioObject(0.9, 6.0, -0.3, 0.0, points_per_frame=40),
            ],
            static_points_per_frame=200,
            seed=100 + s,
        )
        per_stream = []
        for k in range(2):
            pts, t = sc.frame_arrays(k)
            buf = np.zeros((n, 3), np.float32)
            buf[: len(pts)] = pts[:n]
            msk = np.zeros(n, bool)
            msk[: min(len(pts), n)] = True
            per_stream.append((buf, msk, t))
        frames.append(per_stream)

    bstate = st.init_state(b)
    bouts = []
    for k in range(2):
        points = jnp.asarray(np.stack([frames[s][k][0] for s in range(b)]))
        mask = jnp.asarray(np.stack([frames[s][k][1] for s in range(b)]))
        t = jnp.asarray(np.array([frames[s][k][2] for s in range(b)], np.float32))
        bstate, bout = st.step(bstate, points, mask, t, env)
        bouts.append(jax.tree.map(np.asarray, bout))

    for s in range(b):
        sngl = tracker.init_state()
        for k in range(2):
            buf, msk, t = frames[s][k]
            sngl, out = tracker.step(
                sngl, Frame(jnp.asarray(buf), jnp.asarray(msk), jnp.float32(t)), env
            )
            out = jax.tree.map(np.asarray, out)
            assert int(bouts[k].n_clusters[s]) == int(out.n_clusters)
            np.testing.assert_array_equal(bouts[k].obj_id[s], out.obj_id)
            np.testing.assert_array_equal(bouts[k].valid[s], out.valid)
            # decisions identical; float outputs to ulp tolerance (the scan
            # body and the standalone step are different XLA programs, so
            # elementwise fusions may reassociate a rounding step).  vel is
            # a finite difference of positions over dt=0.1, so the permitted
            # ~1e-7 position rounding amplifies ~20x there
            np.testing.assert_allclose(bouts[k].pos[s], out.pos, rtol=2e-7, atol=1e-7)
            np.testing.assert_allclose(bouts[k].vel[s], out.vel, rtol=2e-7, atol=1e-5)
        assert int(bouts[1].n_clusters[s]) >= 1  # real objects were tracked


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_kernel_fleet_space_sharding_psum(fixture_map, rng):
    """Kernel fleet with points sharded over space: the stacked accumulate
    runs per point-shard and ONE psum reconstitutes the global grids —
    results must be independent of the space factor."""
    cfg = _cfg().replace(
        voxel_mode="onehot", cluster_backend="grid", dtype="float32"
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    b, n = 2, cfg.caps.n_max_points
    obj1 = rng.normal([0.5, 2.0, 0.5], 0.1, (n // 2, 3))
    obj2 = rng.normal([-0.8, 5.0, 0.5], 0.1, (n - n // 2, 3))
    points = np.concatenate([obj1, obj2]).astype(np.float32)
    rng.shuffle(points)
    points = np.stack([points, points[::-1]])
    mask = np.ones((b, n), bool)
    t = np.full(b, 0.1, np.float32)

    outs = []
    for n_space in (1, 4):
        st = ShardedTracker(tracker, make_mesh(2, n_space), kernel_path="on")
        bstate = st.init_state(b)
        _, bout = st.step(
            bstate, jnp.asarray(points), jnp.asarray(mask), jnp.asarray(t), env
        )
        outs.append(jax.tree.map(np.asarray, bout))
    np.testing.assert_array_equal(outs[0].n_clusters, outs[1].n_clusters)
    np.testing.assert_array_equal(outs[0].obj_id, outs[1].obj_id)
    # precision mode is shard-invariant (VERDICT r4 #2): every space factor
    # runs the same stacked-kernel quantization scheme (untileable local N
    # is padded with masked rows), and the integer digit sums psum exactly —
    # results are BIT-IDENTICAL across n_space, not merely close
    np.testing.assert_array_equal(outs[0].raw_centroid, outs[1].raw_centroid)
    np.testing.assert_array_equal(outs[0].pos, outs[1].pos)
    np.testing.assert_array_equal(outs[0].vel, outs[1].vel)
    assert int(outs[0].n_clusters[0]) == 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_kernel_fleet_collective_set_is_exactly_two_psums(fixture_map):
    """Fence for the ``check_vma=False`` waiver (parallel/sharding.py): the
    kernel fleet runs with the varying-manual-axes checker OFF, so nothing
    STATIC would catch a future local_fn edit that leaves cross-shard state
    unreduced.  This test lowers the fleet program and asserts its collective
    set is exactly the two expected psums (raw digit grids + point counts
    over the space axis) — an edit that adds or drops a collective fails
    loudly here."""
    cfg = _cfg().replace(
        voxel_mode="onehot", cluster_backend="grid", dtype="float32"
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    b, n = 2, cfg.caps.n_max_points
    st = ShardedTracker(tracker, make_mesh(2, 4), kernel_path="on")
    bstate = st.init_state(b)
    env_h, table_h = st._env_args(env)
    lowered = st._step.lower(
        bstate,
        jnp.zeros((b, n, 3), jnp.float32),
        jnp.zeros((b, n), bool),
        jnp.zeros((b,), jnp.float32),
        env_h,
        table_h,
    )
    txt = lowered.as_text()
    n_all_reduce = txt.count("all_reduce") + txt.count("all-reduce")
    assert n_all_reduce == 2, (
        f"kernel fleet must lower to EXACTLY 2 all-reduces (raw digit psum + "
        f"count psum over 'space'); got {n_all_reduce} — if you changed "
        "local_fn, re-verify its manual collectives and update this fence"
    )
    for op in (
        "all_gather", "all-gather",
        "all_to_all", "all-to-all",
        "collective_permute", "collective-permute",
        "reduce_scatter", "reduce-scatter",
    ):
        assert op not in txt, f"unexpected collective {op} in the fleet program"


def test_kernel_path_on_rejects_non_kernel_config():
    cfg = _cfg()  # dense/jnp
    with pytest.raises(ValueError, match="kernel_path='on'"):
        ShardedTracker(Tracker(cfg), make_mesh(1, 1), kernel_path="on")
