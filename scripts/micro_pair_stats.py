"""Kernel-event A/B for pair-stats kernel formulations (real chip).

Two findings live here (xplane device events, bit-parity asserted, so
the numbers are immune to the tunnel and to XLA-side staging):

1. Batching strategy (round-5 negative result, docs/PERFORMANCE.md):
   the kernel's cost is its per-ACTIVE-slot serial chain, invariant to
   HOW calls are batched — 8 x gridless 219.6 us vs one flattened
   (S*C)-slot call 222.0 us; a grid=(S,) blocked form added ~7.6
   us/step of pipeline machinery on top (280.5 us).  The stacked
   variant was reverted; A (the scan shape) is what ships.

2. Slab size: _kernel_v3 tiles each slot's (P, P) distance block into
   (slab_rows, P) passes.  128-row slabs skip work for clusters
   smaller than a slab, but headline clusters (~200-340 members of
   P=384) run all 3 slabs anyway — at 3x the serial issue count.  One
   full-P pass computes bit-identical outputs (the cross-slab
   max/min-tie chain == single-pass reductions) from ~1/3 the ops.

Usage: python scripts/micro_pair_stats.py
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

from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
    pair_stats_pallas,
)

S, C, P = 8, 32, 384


def make_operands():
    r = np.random.default_rng(7)
    mpts = np.zeros((S, C, P, 3), np.float32)
    mm = np.zeros((S, C, P), bool)
    for f in range(S):
        for c in range(4):  # headline frames have 3-4 active slots
            n = int(r.integers(180, 340))
            mpts[f, c, :n] = r.normal(0, 1, (n, 3)).astype(np.float32)
            mm[f, c, :n] = True
    return jnp.asarray(mpts), jnp.asarray(mm)


def make_variant(slab_rows):
    @jax.jit
    def fn(mpts, mm):
        outs = [
            pair_stats_pallas(mpts[f], mm[f], slab_rows=slab_rows)
            for f in range(S)
        ]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    return fn


def device_events(fn, mpts, mm, tag):
    out = fn(mpts, mm)
    jax.block_until_ready(out)
    logdir = f"/tmp/motl_micro_ps_{tag}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(6):
        out = fn(mpts, mm)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total_kernel_ps = 0
    total_other_ps = 0
    n_execs = 0
    for path in glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                if line.name == "XLA Modules":
                    n_execs += len(line.events)
                    continue
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    # pallas calls carry the jit function's name or
                    # closed_call/custom-call markers depending on how
                    # XLA names them — match on custom-call presence in
                    # the HLO text instead of guessing
                    if "custom-call" in name or "closed_call" in name or (
                        "fn" in name and "fusion" not in name
                    ):
                        total_kernel_ps += ev.duration_ps
                    else:
                        total_other_ps += ev.duration_ps
    n = max(n_execs, 1)
    return total_kernel_ps / n / 1e6, total_other_ps / n / 1e6


def main() -> None:
    mpts, mm = make_operands()
    f128 = make_variant(128)
    ffull = make_variant(P)
    r128 = f128(mpts, mm)
    rfull = ffull(mpts, mm)
    np.testing.assert_array_equal(np.asarray(r128[0]), np.asarray(rfull[0]))
    np.testing.assert_array_equal(np.asarray(r128[1]), np.asarray(rfull[1]))
    print("bit-parity slab128 == slabP ok", flush=True)

    for tag, fn in (("slab128", f128), ("slabP", ffull)):
        k_us, o_us = device_events(fn, mpts, mm, tag)
        print(
            f'{{"variant": "{tag}", "kernel_us_per_dispatch_8f": {k_us:.1f}, '
            f'"xla_side_us": {o_us:.1f}}}',
            flush=True,
        )


if __name__ == "__main__":
    main()
