"""Oracle parity on the VERBATIM reference scene (assets/sim_01/).

The map (93x214 PGM + YAML, ref map/sim_01.{yaml,pgm}) and the launch file
(ref launch/simTracker.launch) are shipped byte-for-byte from the reference
(MIT-licensed test fixtures, SURVEY C22 "ship verbatim").  This runs the
end-to-end parity suite over the actual gazebo_sim_01 occupancy grid with
the actual launch parameters (leaf 0.1, data_length 40, max 300,
id_threshold 0.4, lpf_tau 0.03) — BASELINE.json's parity clause on the real
scenario, not a synthetic stand-in.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from multiple_object_tracking_lidar_tpu.config import Capacities, load_launch_xml
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
from multiple_object_tracking_lidar_tpu.tracker.state import Frame
from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "sim_01")


@pytest.fixture(scope="module")
def sim01_map():
    return load_map_yaml(os.path.join(ASSETS, "sim_01.yaml"))


@pytest.fixture(scope="module")
def launch_cfg():
    cfg = load_launch_xml(os.path.join(ASSETS, "simTracker.launch"))
    # capacities are framework-side (the reference has none); shrink for the
    # 1-core test box while keeping every launch parameter authoritative
    return cfg.replace(
        caps=Capacities(
            n_max_points=2048,
            m_max_voxels=768,
            m_max_dynamic=256,
            c_max_clusters=16,
            p_max_cluster=64,
            k_max_tracks=16,
        )
    )


def test_launch_values_loaded(launch_cfg):
    # the actual launch file exercises both reference quirks: the misspelled
    # static_tolerance key (silently ignored -> default 2) and the malformed
    # value=-'3.5' attribute (launch:34)
    assert launch_cfg.frequency == 10.0
    assert launch_cfg.cluster_tolerance == 0.15
    assert launch_cfg.min_cluster_size == 5
    assert launch_cfg.max_cluster_size == 300
    assert launch_cfg.voxel_leaf_size == 0.1
    assert launch_cfg.static_tolarance == 2
    assert launch_cfg.id_threshold == 0.4
    assert launch_cfg.lpf_tau == 0.03
    assert launch_cfg.logMagnSigma2_y == -3.5
    assert launch_cfg.data_length == 40


def _frame(pts, t, n_max):
    out = np.zeros((n_max, 3), np.float32)
    out[: len(pts)] = pts[:n_max]
    mask = np.zeros(n_max, bool)
    mask[: len(pts)] = True
    return Frame(points=jnp.asarray(out), mask=jnp.asarray(mask), t=jnp.float32(t))


@pytest.mark.parametrize(
    "dtype,pos_atol,vel_atol",
    [
        ("float64", 1e-9, 1e-8),
        ("float32", 5e-3, 5e-2),
    ],
)
def test_sim01_pipeline_matches_oracle(sim01_map, launch_cfg, dtype, pos_atol, vel_atol):
    cfg = launch_cfg.replace(dtype=dtype)
    tracker = Tracker(cfg)
    state = tracker.init_state()
    env = build_static_mask(sim01_map, cfg.static_tolarance, cfg.occupied_threshold)
    ref = oracle.ReferenceTracker(cfg, grid=sim01_map)

    sc = Scenario(
        grid=sim01_map,
        objects=[
            ScenarioObject(0.0, 1.0, 0.0, 0.45),
            ScenarioObject(-0.8, 4.0, 0.35, 0.0),
        ],
        static_points_per_frame=600,
        seed=21,
    )

    n_frames = 20
    for k in range(n_frames):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
        out = jax.tree.map(np.asarray, out)
        ref_out = ref.step(pts.astype(np.float64), t)

        if k == 0:
            assert not out.publish
            assert len(ref_out) == 0
            continue

        got = [
            {"id": int(out.obj_id[i]), "pos": out.pos[i], "vel": out.vel[i]}
            for i in range(len(out.valid))
            if out.valid[i]
        ]
        assert len(got) == len(ref_out), f"frame {k}: det count mismatch"
        for g, r in zip(got, ref_out):
            assert g["id"] == r["id"], f"frame {k}: id {g['id']} vs {r['id']}"
            np.testing.assert_allclose(g["pos"], r["pos"], atol=pos_atol)
            np.testing.assert_allclose(g["vel"], r["vel"], atol=vel_atol)

    # track-ID stability and speed accuracy on the real scene
    assert {g["id"] for g in got} == {0, 1}
    gt = sc.ground_truth(n_frames - 1)
    speeds = sorted(float(np.hypot(*g["vel"])) for g in got)
    want = sorted(float(np.hypot(o["vx"], o["vy"])) for o in gt)
    np.testing.assert_allclose(speeds, want, atol=0.12)


def test_sim01_static_mask_suppresses_walls(sim01_map, launch_cfg):
    """Frames with ONLY wall returns must produce zero detections on the
    real map (removeStatic semantics, cpp:664-706)."""
    cfg = launch_cfg.replace(dtype="float32")
    tracker = Tracker(cfg)
    state = tracker.init_state()
    env = build_static_mask(sim01_map, cfg.static_tolarance, cfg.occupied_threshold)
    sc = Scenario(grid=sim01_map, objects=[], static_points_per_frame=1500, seed=3)
    for k in range(3):
        pts, t = sc.frame_arrays(k)
        state, out = tracker.step(state, _frame(pts, t, cfg.caps.n_max_points), env)
        assert int(out.n_clusters) == 0
        assert not bool(out.publish)
