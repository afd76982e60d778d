"""Host runtime: node shell, colors, checkpoint/resume."""

import numpy as np

from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
from multiple_object_tracking_lidar_tpu.runtime.checkpoint import load_state, save_state
from multiple_object_tracking_lidar_tpu.runtime.node import TrackerNode
from multiple_object_tracking_lidar_tpu.utils.colors import make_colorset


def _node_cfg():
    return TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=6,
        caps=Capacities(
            n_max_points=1024,
            m_max_voxels=512,
            m_max_dynamic=128,
            c_max_clusters=8,
            p_max_cluster=64,
            k_max_tracks=8,
        ),
    )


def _scenario(fixture_map, n_static=300):
    return Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(0.0, 1.0, 0.0, 0.4)],
        static_points_per_frame=n_static,
        seed=9,
    )


def test_node_gates_on_map(fixture_map):
    node = TrackerNode(_node_cfg())
    sc = _scenario(fixture_map)
    assert node.on_pointcloud(sc.frame(0)) is None  # no map yet (cpp:128-131)
    node.on_map(fixture_map)
    assert node.on_pointcloud(sc.frame(0)) is None  # first frame: register only
    out = node.on_pointcloud(sc.frame(1))
    assert out is not None
    obstacles, markers, pose = out
    assert len(obstacles.obstacles) >= 1
    assert obstacles.obstacles[0].id == 0


def test_node_colors_match_reference_stream(fixture_map):
    node = TrackerNode(_node_cfg())
    node.on_map(fixture_map)
    sc = _scenario(fixture_map)
    for k in range(3):
        node.on_pointcloud(sc.frame(k))
    want = make_colorset(len(node.colors), seed=5323)
    for oid in range(len(node.colors)):
        np.testing.assert_allclose(node.colors[oid], want[oid], rtol=1e-6)


def test_checkpoint_resume_bitexact(fixture_map, tmp_path):
    cfg = _node_cfg()
    sc = _scenario(fixture_map)

    node = TrackerNode(cfg)
    node.on_map(fixture_map)
    for k in range(6):
        node.on_pointcloud(sc.frame(k))

    path = str(tmp_path / "ckpt.npz")
    save_state(path, node.state, extra={"frame": 6, "time_init": node.time_init})

    # resume into a fresh node and compare against the uninterrupted run
    node2 = TrackerNode(cfg)
    node2.on_map(fixture_map)
    node2.state, meta = load_state(path)
    node2.time_init = meta["time_init"]
    assert meta["frame"] == 6

    outs1, outs2 = [], []
    for k in range(6, 10):
        outs1.append(node.on_pointcloud(sc.frame(k)))
        outs2.append(node2.on_pointcloud(sc.frame(k)))
    for a, b in zip(outs1, outs2):
        assert (a is None) == (b is None)
        if a is None:
            continue
        for oa, ob in zip(a[0].obstacles, b[0].obstacles):
            assert oa.id == ob.id
            np.testing.assert_array_equal(oa.position, ob.position)
            np.testing.assert_array_equal(oa.velocity, ob.velocity)


def test_stage_timer_summary():
    import time

    from multiple_object_tracking_lidar_tpu.runtime.profiler import StageTimer

    t = StageTimer()
    for _ in range(5):
        with t.stage("decode"):
            time.sleep(0.001)
        t.record("step", 2.0)
    s = t.summary(skip_warmup=1)
    assert s["decode"].count == 5
    assert s["decode"].mean_ms >= 1.0
    assert s["step"].p50_ms == 2.0
    assert "decode" in t.report()
