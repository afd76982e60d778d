"""Event TIMELINE of one steady-state dispatch (xplane, real chip).

profile_step.py aggregates durations — fine for sync ops, misleading for
async copy-start/copy-done pairs whose "duration" is pending time that may
or may not overlap compute.  This script prints every event of the LAST
profiled module execution with absolute offsets from module start, so gaps
on the critical path are visible directly.

Usage: python scripts/profile_timeline.py [variant] [max_events]
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
    max_events = int(sys.argv[2]) if len(sys.argv) > 2 else 120

    from scripts.bench_variants import build

    tracker, env, stacked = build(variant, dense_scene=variant.endswith("-dense"))
    step = tracker.bind_env_multi(env)
    state = tracker.init_state()
    for _ in range(3):
        state, out = step(state, stacked)
    jax.block_until_ready(out)

    logdir = "/tmp/motl_timeline"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(4):
        state, out = step(state, stacked)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    modules = []  # (start_ps, end_ps) of XLA Modules line events
    ops = []      # (start_ps, dur_ps, name)
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                base = line.timestamp_ns * 1000
                if "XLA Modules" in line.name:
                    for ev in line.events:
                        modules.append(
                            (base + ev.offset_ps, ev.duration_ps,
                             plane.event_metadata[ev.metadata_id].name)
                        )
                elif "XLA Ops" in line.name or "xla op" in line.name.lower():
                    for ev in line.events:
                        ops.append(
                            (base + ev.offset_ps, ev.duration_ps,
                             plane.event_metadata[ev.metadata_id].name)
                        )
    if not modules:
        print("no XLA Modules events found")
        return
    modules.sort()
    print("== module executions (start rel to first, dur, gap-from-prev) ==")
    t0 = modules[0][0]
    prev_end = None
    for s, d, n in modules:
        gap = (s - prev_end) / 1e6 if prev_end is not None else 0.0
        print(
            f"  +{(s - t0)/1e6:10.1f} us  dur={d/1e6:8.1f} us  "
            f"gap={gap:8.1f} us  {n[:60]}"
        )
        prev_end = s + d
    # pick the last full module execution
    m_start, m_dur, m_name = modules[-1]
    print(f"module {m_name[:60]}  dur={m_dur/1e9:.1f} us" .replace("1e9", ""))
    print(f"module dur = {m_dur/1e6:.1f} us")
    inside = [
        (s - m_start, d, n)
        for (s, d, n) in ops
        if s >= m_start - 1 and s < m_start + m_dur
    ]
    inside.sort()
    print(f"{len(inside)} op events; showing first {max_events}")
    print(f"{'start_us':>10} {'end_us':>10} {'dur_us':>9}  op")
    for s, d, n in inside[:max_events]:
        print(f"{s/1e6:10.1f} {(s+d)/1e6:10.1f} {d/1e6:9.1f}  {n[:100]}")


if __name__ == "__main__":
    main()
