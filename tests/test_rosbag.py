"""ROS1 .bag (v2.0) container tests — the reference's actual input artifact
(ref: README.md:37-43 plays bag/gazebo_sim_01.bag)."""

import bz2
import json
import struct
import subprocess
import sys

import numpy as np
import pytest

from multiple_object_tracking_lidar_tpu.io import rosbag as rb
from multiple_object_tracking_lidar_tpu.io.bag import record_bag, replay_bag
from multiple_object_tracking_lidar_tpu.io.pointcloud2 import (
    decode_pointcloud2,
    make_pointcloud2,
)
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject


def _frames(n=4, pts=64):
    r = np.random.default_rng(7)
    out = []
    for k in range(n):
        xyz = r.normal([0.5, 2.0, 0.5], 0.2, (pts, 3)).astype(np.float32)
        out.append(
            make_pointcloud2(xyz, stamp=0.1 * (k + 1), frame_id="velodyne")
        )
    return out


def test_rosbag_roundtrip_bitexact(tmp_path):
    """write_rosbag -> read_rosbag preserves every message field and the
    point payload byte-for-byte; stamps to nsec resolution."""
    frames = _frames()
    path = str(tmp_path / "rt.bag")
    assert rb.write_rosbag(path, frames) == len(frames)
    back = list(rb.read_rosbag(path))
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert b.data == a.data
        assert b.fields == a.fields
        assert (b.height, b.width) == (a.height, a.width)
        assert (b.point_step, b.row_step) == (a.point_step, a.row_step)
        assert b.frame_id == a.frame_id
        assert b.is_bigendian == a.is_bigendian
        assert b.is_dense == a.is_dense
        assert abs(b.stamp - a.stamp) < 1e-9


def test_rosbag_layout_is_spec_conformant(tmp_path):
    """The written container carries the spec's record skeleton: magic, a
    4096-byte padded bag header whose index_pos points at the trailing
    connection record, one chunk, one index record, one chunk info."""
    frames = _frames(n=2, pts=8)
    path = str(tmp_path / "spec.bag")
    rb.write_rosbag(path, frames, topic="/points")
    buf = open(path, "rb").read()
    assert buf.startswith(b"#ROSBAG V2.0\n")
    pos = 13
    fields, data, pos_after_hdr = rb._read_record(buf, pos)
    assert fields["op"][0] == rb._OP_BAG_HEADER
    assert pos_after_hdr - pos == 4096  # padded record
    (index_pos,) = struct.unpack("<Q", fields["index_pos"])
    assert struct.unpack("<I", fields["conn_count"]) == (1,)
    assert struct.unpack("<I", fields["chunk_count"]) == (1,)
    # ops in stream order: chunk, index, connection (at index_pos), chunk info
    ops = []
    p = pos_after_hdr
    while p < len(buf):
        f, d, p2 = rb._read_record(buf, p)
        ops.append((f["op"][0], p))
        p = p2
    assert [o for o, _ in ops] == [
        rb._OP_CHUNK, rb._OP_INDEX, rb._OP_CONNECTION, rb._OP_CHUNK_INFO
    ]
    assert ops[2][1] == index_pos
    # the connection advertises the right type/md5
    conn_fields, conn_data, _ = rb._read_record(buf, index_pos)
    info = rb._parse_header(conn_data)
    assert info["type"] == rb.PC2_TYPE.encode()
    assert info["md5sum"] == rb.PC2_MD5.encode()
    assert info["topic"] == b"/points"


def test_rosbag_bz2_chunk(tmp_path):
    """bz2-compressed chunks decode identically (the other compression the
    ROS recorder ships by default)."""
    frames = _frames(n=3)
    path = str(tmp_path / "plain.bag")
    rb.write_rosbag(path, frames)
    buf = open(path, "rb").read()
    # recompress the single chunk record with bz2
    pos = 13
    _, _, pos = rb._read_record(buf, pos)  # bag header
    chunk_start = pos
    fields, payload, chunk_end = rb._read_record(buf, pos)
    assert fields["op"][0] == rb._OP_CHUNK
    comp = bz2.compress(payload)
    rec = rb._record(
        {
            "op": bytes([rb._OP_CHUNK]),
            "compression": b"bz2",
            "size": struct.pack("<I", len(payload)),
        },
        comp,
    )
    out = buf[:chunk_start] + rec + buf[chunk_end:]
    path2 = str(tmp_path / "bz2.bag")
    open(path2, "wb").write(out)
    a = list(rb.read_rosbag(path))
    b = list(rb.read_rosbag(path2))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x.data == y.data and x.stamp == y.stamp


def test_rosbag_topic_filter_and_type_gate(tmp_path):
    frames = _frames(n=2)
    path = str(tmp_path / "t.bag")
    rb.write_rosbag(path, frames, topic="/scan_matched_points2")
    assert len(list(rb.read_rosbag(path, topic="/scan_matched_points2"))) == 2
    assert list(rb.read_rosbag(path, topic="/other")) == []
    info = rb.rosbag_info(path)
    assert info["frames"] == 2 and info["t1"] > info["t0"]


def test_rosbag_rejects_non_bag(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"#ROSBAG V1.2\n junk")
    with pytest.raises(ValueError, match="unsupported rosbag version"):
        list(rb.read_rosbag(str(p)))
    p.write_bytes(b"PK\x03\x04 not a bag")
    with pytest.raises(ValueError, match="not a ROS1 bag"):
        list(rb.read_rosbag(str(p)))


def test_rosbag_replay_matches_npz_replay(tmp_path):
    """The same Scenario recorded into the ROS container and into the npz
    bag decodes to BIT-IDENTICAL frame tensors (the tracker input contract),
    so replay outputs are identical by construction."""
    sc = Scenario(
        grid=None,
        objects=[ScenarioObject(x0=0.0, y0=1.0, vx=0.0, vy=0.45)],
        static_points_per_frame=128,
    )
    frames = [sc.frame(k) for k in range(3)]
    npz = str(tmp_path / "a.npz")
    bag = str(tmp_path / "a.bag")
    record_bag(npz, frames)
    rb.write_rosbag(bag, frames)
    n_max = 256
    for x, y in zip(replay_bag(npz), rb.read_rosbag(bag)):
        px, mx = decode_pointcloud2(x, n_max)
        py, my = decode_pointcloud2(y, n_max)
        np.testing.assert_array_equal(px, py)
        np.testing.assert_array_equal(mx, my)
        assert np.float32(x.stamp) == np.float32(y.stamp)


@pytest.mark.slow
def test_cli_run_rosbag_path(fixture_map, tmp_path):
    """End-to-end CLI: record a ROS .bag, replay it, outputs byte-identical
    to the synthesizing run that recorded it (same contract the npz bag
    keeps in test_cli.py)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "voxel_leaf_size: 0.1\n"
        "data_length: 6\n"
        "caps:\n"
        "  n_max_points: 1024\n"
        "  m_max_voxels: 512\n"
        "  m_max_dynamic: 128\n"
        "  c_max_clusters: 8\n"
        "  p_max_cluster: 64\n"
        "  k_max_tracks: 8\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    bag = str(tmp_path / "cli.bag")

    def _run(extra):
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from multiple_object_tracking_lidar_tpu.runtime.cli import main;"
            f"raise SystemExit(main(['run','--map','{root}/assets/sim_map.yaml',"
            f"'--config','{cfg}','--frames','4','--objects','1'] + {extra!r}))"
        )
        return subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=600,
        )

    r1 = _run(["--record-bag", bag])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(["--bag", bag])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r1.stdout == r2.stdout
    assert any(
        "obstacles" in json.loads(x)
        for x in r1.stdout.strip().splitlines()
        if x.startswith("{")
    )
