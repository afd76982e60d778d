"""Per-op device profile of one pipeline variant (xplane trace aggregation).

Usage: python scripts/profile_step.py [variant] [top_n]
Parses the xplane protobuf directly (the tensorboard converter is broken on
this image); aggregates XLA op durations per step over the steady-state scans.
"""

from __future__ import annotations

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "onehot-grid"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from scripts.bench_variants import build

    tracker, env, stacked = build(variant, dense_scene=variant.endswith("-dense"))
    step = tracker.bind_env_multi(env)
    state = tracker.init_state()
    for _ in range(3):
        state, out = step(state, stacked)
    jax.block_until_ready(out)

    logdir = "/tmp/motl_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    n_scans = 10
    for _ in range(n_scans):
        state, out = step(state, stacked)
    jax.block_until_ready(out)
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
    per_step = {k: v / (n_scans * 8) for k, v in agg.items()}  # per cloud
    print(f"variant={variant}  total_ms_per_cloud={total / (n_scans * 8):.4f}")
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:9.4f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
