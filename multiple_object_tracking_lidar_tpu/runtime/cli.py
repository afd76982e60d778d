"""Command-line driver — the framework's `main()` (ref: node.cpp:4-33).

Subcommands:
  run    replay a scenario ("bag") through the tracker, emit JSON-lines
  bench  run the throughput benchmark
  info   print config + device summary
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _load_cfg(args):
    from multiple_object_tracking_lidar_tpu.config import TrackerConfig, load_config

    cfg = load_config(args.config) if args.config else TrackerConfig()
    if args.data_length:
        cfg = cfg.replace(data_length=args.data_length)
    return cfg


def cmd_run(args) -> int:
    import numpy as np

    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.runtime.node import TrackerNode
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    cfg = _load_cfg(args)
    node = TrackerNode(cfg)
    grid = load_map_yaml(args.map)
    node.on_map(grid)

    objs = [
        ScenarioObject(x0=0.0, y0=1.0, vx=0.0, vy=0.45, turn_every=8.0),
        ScenarioObject(x0=-0.8, y0=4.0, vx=0.35, vy=0.0, turn_every=6.0),
        ScenarioObject(x0=0.9, y0=6.5, vx=-0.25, vy=0.25, turn_every=7.0),
    ][: args.objects]
    # scale the synthetic static returns to the configured point capacity so
    # object returns are never truncated away
    sc = Scenario(
        grid=grid,
        objects=objs,
        frequency=cfg.frequency,
        static_points_per_frame=min(4000, cfg.caps.n_max_points // 2),
    )

    for k in range(args.frames):
        msg = sc.frame(k)
        result = node.on_pointcloud(msg)
        if result is None:
            continue
        obstacles, markers, _ = result
        rec = {
            "frame": k,
            "t": round(msg.stamp, 3),
            "obstacles": [
                {
                    "id": o.id,
                    "pos": [round(v, 4) for v in o.position[:2]],
                    "vel": [round(v, 4) for v in o.velocity[:2]],
                }
                for o in obstacles.obstacles
            ],
            "speed_labels": [m.text for m in markers.markers],
        }
        print(json.dumps(rec))

    if node.stats:
        wall = [s.wall_ms for s in node.stats[3:]] or [s.wall_ms for s in node.stats]
        print(
            json.dumps(
                {
                    "summary": {
                        "frames": len(node.stats),
                        "mean_ms": round(float(np.mean(wall)), 3),
                        "p50_ms": round(float(np.percentile(wall, 50)), 3),
                        "p99_ms": round(float(np.percentile(wall, 99)), 3),
                    }
                }
            ),
            file=sys.stderr,
        )
    return 0


def cmd_bench(_args) -> int:
    import runpy
    import os

    runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "bench.py"),
        run_name="__main__",
    )
    return 0


def cmd_info(args) -> int:
    import jax

    cfg = _load_cfg(args)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))
    print(f"devices: {jax.devices()}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mot-lidar", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="replay a scenario through the tracker")
    pr.add_argument("--map", required=True, help="map YAML (map_server format)")
    pr.add_argument("--config", help="config file (.yaml/.json/.launch)")
    pr.add_argument("--frames", type=int, default=100)
    pr.add_argument("--objects", type=int, default=2)
    pr.add_argument("--data-length", type=int, dest="data_length")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="run the throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    pi = sub.add_parser("info", help="print config and devices")
    pi.add_argument("--config", help="config file")
    pi.add_argument("--data-length", type=int, dest="data_length")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
