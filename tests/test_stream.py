"""Wire protocol + streaming node: round-trip, async-ring equivalence, TCP
end-to-end (the live transport SURVEY C18 names; ref pubs/subs cpp:61-72)."""

import io
import socket
import threading

import numpy as np

from multiple_object_tracking_lidar_tpu.io import wire
from multiple_object_tracking_lidar_tpu.io.pointcloud2 import make_pointcloud2
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
from multiple_object_tracking_lidar_tpu.runtime.node import TrackerNode
from multiple_object_tracking_lidar_tpu.runtime.stream import StreamingNode, serve


def test_wire_roundtrip_pointcloud(rng):
    xyz = rng.normal(0, 1, (57, 3)).astype(np.float32)
    msg = make_pointcloud2(xyz, stamp=12.25, frame_id="base", extra_padding=4)
    buf = io.BytesIO()
    wire.write_frame(buf, msg)
    buf.seek(0)
    got = wire.read_message(buf)
    assert got.stamp == msg.stamp
    assert got.frame_id == "base"
    assert got.point_step == msg.point_step
    assert got.fields == msg.fields
    assert got.data == msg.data
    assert wire.read_message(buf) is None  # clean EOF


def test_wire_rejects_malformed_header():
    import pytest

    buf = io.BytesIO(b"\xff\xff\xff\xff")
    with pytest.raises(ValueError):
        wire.read_message(buf)


def test_wire_map_roundtrip(fixture_map):
    buf = io.BytesIO()
    wire.write_map(buf, fixture_map)
    buf.seek(0)
    typ, data = wire.read_message(buf)
    assert typ == "map"
    np.testing.assert_array_equal(np.asarray(data["data"], np.int8), fixture_map.data)
    assert data["info"]["resolution"] == fixture_map.info.resolution


def _frames(fixture_map, n, cfg):
    sc = Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(0.0, 1.0, 0.0, 0.45)],
        static_points_per_frame=400,
        seed=17,
    )
    return [sc.frame(k) for k in range(n)]


def test_streaming_node_matches_sync_node(fixture_map, tiny_config):
    """The async ring must publish exactly what the sync node publishes —
    same state chain, only the D2H timing differs."""
    cfg = tiny_config
    frames = _frames(fixture_map, 10, cfg)

    sync = TrackerNode(cfg)
    sync.on_map(fixture_map)
    sync_out = [sync.on_pointcloud(m) for m in frames]

    got = []
    node = StreamingNode(cfg, on_outputs=lambda *recs: got.append(recs), depth=3)
    node.on_map(fixture_map)
    for m in frames:
        node.submit(m)
    node.flush()

    want = [r for r in sync_out if r is not None]
    assert len(got) == len(want)
    for (a_obs, a_mk, a_pose), (b_obs, b_mk, b_pose) in zip(got, want):
        assert [o.id for o in a_obs.obstacles] == [o.id for o in b_obs.obstacles]
        for oa, ob in zip(a_obs.obstacles, b_obs.obstacles):
            np.testing.assert_array_equal(oa.position, ob.position)
            np.testing.assert_array_equal(oa.velocity, ob.velocity)
        assert [m.text for m in a_mk.markers] == [m.text for m in b_mk.markers]
        np.testing.assert_array_equal(a_pose.points, b_pose.points)
        assert a_pose.intensity == b_pose.intensity


def test_tcp_stream_end_to_end(fixture_map, tiny_config):
    """Full transport: map + frames over TCP in, records + summary out."""
    cfg = tiny_config
    node = StreamingNode(cfg, depth=2)
    ready = threading.Event()
    result = {}

    def run():
        result.update(serve(node, port=0 or 18329, max_frames=8, ready=ready))

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(10)

    conn = socket.create_connection(("127.0.0.1", 18329), timeout=30)
    wf = conn.makefile("wb")
    rf = conn.makefile("rb")
    wire.write_map(wf, fixture_map)
    for m in _frames(fixture_map, 8, cfg):
        wire.write_frame(wf, m)
    wf.flush()
    conn.shutdown(socket.SHUT_WR)

    records = []
    while True:
        m = wire.read_message(rf)
        if m is None:
            break
        records.append(m)
        if isinstance(m, tuple) and m[0] == "summary":
            break
    th.join(30)
    conn.close()

    kinds = [r[0] for r in records if isinstance(r, tuple)]
    assert kinds.count("ObstacleArray") >= 6   # first frame registers only
    assert kinds.count("MarkerArray") == kinds.count("ObstacleArray")
    assert kinds[-1] == "summary"
    assert result["frames"] == 8
    obstacles = [r for r in records if isinstance(r, tuple) and r[0] == "ObstacleArray"]
    ids = {o["id"] for r in obstacles for o in r[1]["obstacles"]}
    assert ids == {0}
