"""Per-op device profile of the EXACT bench.py workloads (xplane aggregation).

Usage: python scripts/profile_bench.py [headline|dense] [multi|single] [top_n]

Unlike scripts/profile_step.py (pipeline variants), this traces the very
(cfg, env, scenario) tuples bench.py measures, so the op table explains the
headline / dense_scene numbers directly.  Parses the xplane protobuf raw
(the tensorboard converter is broken on this image).
"""

from __future__ import annotations

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    # force the streaming dispatch mode first: in the deferred-enqueue mode
    # block_until_ready does not synchronize, so the traced window would not
    # contain the executions (docs/PERFORMANCE.md round-3 dispatch modes)
    np.asarray(jnp.zeros((), jnp.int32) + 1)

    case = sys.argv[1] if len(sys.argv) > 1 else "headline"
    dispatch = sys.argv[2] if len(sys.argv) > 2 else "multi"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    import bench
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame

    cfg, env, sc = bench.headline_case() if case == "headline" else bench.dense_case()
    tracker = Tracker(cfg)
    frames = bench._stage_frames(sc, cfg.caps.n_max_points, 8)

    if dispatch == "multi":
        step = tracker.bind_env_multi(env)
        stacked = bench.stage_stacked(frames, cfg.caps.n_max_points)
        run = lambda s: step(s, stacked)
        clouds_per_dispatch = 8
    else:
        step1 = tracker.bind_env(env)

        def run(s):
            out = None
            for f in frames:
                s, out = step1(s, f)
            return s, out

        clouds_per_dispatch = 8

    state = tracker.init_state()
    for _ in range(3):
        state, out = run(state)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    logdir = "/tmp/motl_profile_bench"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    n_scans = 10
    for _ in range(n_scans):
        state, out = run(state)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    agg: dict[str, float] = {}
    total = 0.0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ms
                    agg[name] = agg.get(name, 0.0) + dur
                    total += dur
    denom = n_scans * clouds_per_dispatch
    per_step = {k: v / denom for k, v in agg.items()}
    print(
        f"case={case} dispatch={dispatch}  total_ms_per_cloud={total / denom:.4f}"
    )
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms * 1000:9.1f} us  {name[:110]}")


if __name__ == "__main__":
    main()
