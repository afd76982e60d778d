"""A/B device time: hoist='on' (per-frame perception scan) vs
hoist='batch' (frame-batched perception ahead of the tracking scan).

Round-5 lever: the per-frame cluster-table chain is latency-bound (~27.5
us/frame of small fusions on the round-5 timeline); batching it over the
8-frame ring runs the same math once on (S, ...) operands.  This script
measures the whole multi program's profiler-derived device time for both
bodies on the real chip (same staged frames, same config).

Usage: python scripts/micro_batch_tail.py [n_scans]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _load_grid, _stage_frames, _traced_device_us_impl, stage_stacked  # noqa: E402
from __graft_entry__ import _bench_config  # noqa: E402
from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject  # noqa: E402
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask  # noqa: E402
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker  # noqa: E402


def main() -> None:
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    grid = _load_grid()
    cfg = _bench_config()
    n_valid = 100_000
    objs = [
        ScenarioObject(0.0, 1.0, 0.0, 0.45, points_per_frame=1500),
        ScenarioObject(-0.8, 4.0, 0.35, 0.0, points_per_frame=1500),
        ScenarioObject(0.9, 6.5, -0.25, 0.25, points_per_frame=1500),
    ]
    sc = Scenario(
        grid=grid, objects=objs,
        static_points_per_frame=n_valid - 3 * 1500 - 300,
        clutter_points=300, seed=123,
    )
    tracker = Tracker(cfg)
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)
    frames = _stage_frames(sc, cfg.caps.n_max_points, 8)
    stacked = stage_stacked(frames, cfg.caps.n_max_points)

    for mode in ("on", "batch"):
        step = tracker.bind_env_multi(env, hoist=mode)
        state = tracker.init_state()
        for _ in range(2):
            state, out = step(state, stacked)
        np.asarray(out.n_clusters)

        def once(state, step=step):
            for _ in range(n_scans):
                state, out = step(state, stacked)
            np.asarray(out.n_clusters)
            return state

        us, spread = _traced_device_us_impl(
            once, n_scans * 8, tracker.init_state, n_reps=3
        )
        print(json.dumps({
            "hoist": mode,
            "device_us_per_cloud": round(us, 2),
            "spread_pct": round(spread, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
