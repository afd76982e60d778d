"""End-to-end parity: jitted TPU pipeline vs the full reference oracle.

Replays a synthetic scenario (the stand-in for gazebo_sim_01.bag, SURVEY §4)
through both the fused jitted step and the loop-based NumPy oracle and checks
cluster counts, track IDs, positions and velocities frame by frame — the
parity metric BASELINE.json names.
"""

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
from multiple_object_tracking_lidar_tpu.tracker.state import Frame


def _make(cfg, fixture_map):
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    return tracker, tracker.init_state(), env


def _frame(pts, t, n_max):
    out = np.zeros((n_max, 3), np.float32)
    out[: len(pts)] = pts[:n_max]
    mask = np.zeros(n_max, bool)
    mask[: len(pts)] = True
    return Frame(points=jnp.asarray(out), mask=jnp.asarray(mask), t=jnp.float32(t))


import pytest


@pytest.mark.parametrize(
    "dtype,pos_atol,vel_atol",
    [
        ("float64", 1e-9, 1e-8),   # logic parity: exact to numerics
        ("float32", 5e-3, 5e-2),   # production dtype: bounded f32 divergence
    ],
)
def test_pipeline_matches_reference_oracle(fixture_map, tiny_config, dtype, pos_atol, vel_atol):
    cfg = tiny_config.replace(dtype=dtype)
    tracker, state, env = _make(cfg, fixture_map)
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

    n_frames = 25
    for k in range(n_frames):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
        out = jax.tree.map(np.asarray, out)
        ref_out = ref.step(pts.astype(np.float64), t)

        if k == 0:
            assert not out.publish  # first frame registers only (cpp:126-161)
            assert len(ref_out) == 0
            continue

        got = [
            {"id": int(out.obj_id[i]), "pos": out.pos[i], "vel": out.vel[i]}
            for i in range(len(out.valid))
            if out.valid[i]
        ]
        assert out.publish
        assert len(got) == len(ref_out), f"frame {k}: det count mismatch"
        for g, r in zip(got, ref_out):
            assert g["id"] == r["id"], f"frame {k}: id mismatch {g['id']} vs {r['id']}"
            np.testing.assert_allclose(g["pos"], r["pos"], atol=pos_atol)
            np.testing.assert_allclose(g["vel"], r["vel"], atol=vel_atol)

    # velocities should have converged near ground truth by the last frame
    gt = sc.ground_truth(n_frames - 1)
    vels = {g["id"]: g["vel"] for g in got}
    speeds = sorted(float(np.hypot(*v)) for v in vels.values())
    want = sorted(float(np.hypot(o["vx"], o["vy"])) for o in gt)
    np.testing.assert_allclose(speeds, want, atol=0.12)


def test_empty_frames_do_not_change_state(fixture_map, tiny_config):
    cfg = tiny_config
    tracker, state, env = _make(cfg, fixture_map)
    sc = Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(0.0, 1.0, 0.0, 0.4)],
        static_points_per_frame=300,
        seed=3,
    )
    pts, t = sc.frame_arrays(0)
    state, _ = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
    pts, t = sc.frame_arrays(1)
    state, out1 = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
    assert out1.publish

    # an all-static frame: no detections -> "No obstacles around" (cpp:170-174)
    empty = np.zeros((0, 3), np.float32)
    state2, out2 = tracker.step(state, _frame(empty, t + 0.1, cfg.caps.n_max_points), env)
    assert not bool(out2.publish)
    assert int(out2.n_clusters) == 0
    np.testing.assert_array_equal(
        np.asarray(state2.bank.window), np.asarray(state.bank.window)
    )
    assert int(state2.spin_counter) == int(state.spin_counter)


def test_track_expiry_after_disappearance(fixture_map):
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=6,
        prune_period=1.0,  # speed the test up: expire after 1 s
        caps=Capacities(
            n_max_points=1024,
            m_max_voxels=512,
            m_max_dynamic=128,
            c_max_clusters=8,
            p_max_cluster=64,
            k_max_tracks=8,
        ),
    )
    tracker, state, env = _make(cfg, fixture_map)
    sc = Scenario(
        grid=fixture_map,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.0),
            ScenarioObject(1.0, 6.0, 0.0, 0.0),
        ],
        static_points_per_frame=0,
        seed=5,
    )
    # run both objects for 5 frames, then drop object 1 for > 2x prune period
    for k in range(5):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
    assert int(out.n_alive) == 2

    sc.objects.pop(1)
    for k in range(5, 35):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
    assert int(out.n_alive) == 1  # stale track pruned (cpp:545-584)
    # the survivor is the object still in view, at (0, 1)
    assert bool(out.valid[0])
    np.testing.assert_allclose(np.asarray(out.pos[0]), [0.0, 1.0], atol=0.15)


def test_track_ids_stable_under_motion(fixture_map, tiny_config):
    cfg = tiny_config
    tracker, state, env = _make(cfg, fixture_map)
    sc = Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(-0.5, 2.0, 0.3, 0.2)],
        static_points_per_frame=400,
        seed=11,
    )
    ids = set()
    for k in range(30):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
        out = jax.tree.map(np.asarray, out)
        for i in range(len(out.valid)):
            if out.valid[i]:
                ids.add(int(out.obj_id[i]))
    assert ids == {0}, f"track fragmented: {ids}"


def test_dynamic_capacity_overflow_reported(fixture_map):
    """More dynamic points than m_max_dynamic: truncated (documented
    deviation) and reported via n_dynamic > capacity; pipeline keeps working."""
    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=6,
        caps=Capacities(
            n_max_points=2048,
            m_max_voxels=512,
            m_max_dynamic=32,   # tiny: the object alone overflows it
            c_max_clusters=8,
            p_max_cluster=32,
            k_max_tracks=8,
        ),
    )
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance)
    sc = Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(0.0, 1.0, 0.0, 0.0, points_per_frame=600, radius=0.8)],
        static_points_per_frame=0,
        seed=13,
    )
    state = tracker.init_state()
    for k in range(3):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
    assert int(out.n_dynamic) > cfg.caps.m_max_dynamic  # true count reported
    assert np.isfinite(np.asarray(out.pos)).all()
