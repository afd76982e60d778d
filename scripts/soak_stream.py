"""Live-stream soak: TCP server + scripted client at a fixed frame rate.

Drives the StreamingNode over the wire protocol exactly as a live deployment
would: a client streams PointCloud2 frames at --hz over TCP, the server
tracks with the async decode->dispatch ring and answers with
ObstacleArray/MarkerArray/pose records.  Prints per-frame arrival stats and
the node's stage-timer summary; exits nonzero if the node fell behind
real time (sustained p99 dispatch+decode > frame period).

Usage: python scripts/soak_stream.py [--frames 300] [--hz 10] [--points 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--hz", type=float, default=10.0)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--port", type=int, default=18327)
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    from __graft_entry__ import _bench_config
    from multiple_object_tracking_lidar_tpu.io import wire
    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.runtime.stream import StreamingNode, serve
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grid = load_map_yaml(os.path.join(here, "assets", "sim_map.yaml"))
    cfg = _bench_config()

    node = StreamingNode(cfg, depth=args.depth)
    node.on_map(grid)

    ready = threading.Event()
    result: dict = {}

    def run_server():
        result.update(serve(node, port=args.port, max_frames=args.frames, ready=ready))

    th = threading.Thread(target=run_server, daemon=True)
    th.start()
    ready.wait(10)

    n_valid = args.points
    sc = Scenario(
        grid=grid,
        objects=[
            # patrols (turn_every) keep the objects inside the map however
            # long the soak runs — constant-velocity walkers exit the scene
            # after ~10-20 s and the publish gate correctly goes quiet,
            # which is a scenario artifact, not a node failure
            ScenarioObject(0.0, 1.0, 0.0, 0.45, points_per_frame=1500,
                           turn_every=8.0),
            ScenarioObject(-0.8, 4.0, 0.35, 0.0, points_per_frame=1500,
                           turn_every=6.0),
        ],
        static_points_per_frame=max(0, n_valid - 3000),
        seed=99,
        frequency=args.hz,
    )

    conn = socket.create_connection(("127.0.0.1", args.port))
    wf = conn.makefile("wb")
    rf = conn.makefile("rb")
    records = []
    done = threading.Event()

    def reader():
        while True:
            m = wire.read_message(rf)
            if m is None:
                break
            records.append(m)
            if isinstance(m, tuple) and m[0] == "summary":
                break
        done.set()

    rth = threading.Thread(target=reader, daemon=True)
    rth.start()

    period = 1.0 / args.hz
    late = 0
    t_start = time.perf_counter()
    for k in range(args.frames):
        target = t_start + k * period
        now = time.perf_counter()
        if now < target:
            time.sleep(target - now)
        elif now - target > period:
            late += 1
        wire.write_frame(wf, sc.frame(k))
        wf.flush()
    wf.flush()
    conn.shutdown(socket.SHUT_WR)
    done.wait(60)
    th.join(60)

    summary = result or {}
    obstacles = [r for r in records if isinstance(r, tuple) and r[0] == "ObstacleArray"]
    ids = {o["id"] for r in obstacles for o in r[1]["obstacles"]}
    out = {
        "frames_sent": args.frames,
        "hz": args.hz,
        "late_sends": late,
        "obstacle_records": len(obstacles),
        "track_ids": sorted(ids),
        **summary,
    }
    print(json.dumps(out))
    hot_p99 = (summary.get("decode_ms_p50") or 0) + (summary.get("dispatch_ms_p99") or 0)
    realtime = hot_p99 < 1e3 * period and len(obstacles) >= args.frames - 10
    print(json.dumps({"realtime": realtime, "hot_path_p99_ms": round(hot_p99, 2)}))
    return 0 if realtime else 1


if __name__ == "__main__":
    raise SystemExit(main())
