"""Kernel-event A/B/C for the pair-stats kernel batching strategy.

Round-5 finding: wiring pair_stats into the batched prelude as a
grid=(S,) stacked pallas_call REGRESSED the multi program 1247.7 ->
1349.5 us/dispatch — the stacked kernel ran 258.2 us vs 8 x 18.7 us for
the per-frame gridless calls (timeline r5d vs r5f), plus a 26.5 us
relayout copy feeding it.  This script traces three formulations on the
real chip and prints the PALLAS EVENT time (xplane device events, not
wall) so the comparison is immune to the tunnel and to XLA-side operand
staging differences:

  A  8 sequential gridless pair_stats_pallas calls (the r5d scan shape)
  B  pair_stats_pallas_stacked: grid=(S,), blocked specs (the regression)
  C  one gridless call on the FLATTENED (S*C) slot axis — one launch,
     one output fill, the proven whole-VMEM program shape

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
    pair_stats_pallas_stacked,
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


@jax.jit
def variant_a(mpts, mm):
    outs = [pair_stats_pallas(mpts[f], mm[f]) for f in range(S)]
    return (
        jnp.stack([o[0] for o in outs]),
        jnp.stack([o[1] for o in outs]),
    )


@jax.jit
def variant_b(mpts, mm):
    return pair_stats_pallas_stacked(mpts, mm)


@jax.jit
def variant_c(mpts, mm):
    cm, fr = pair_stats_pallas(
        mpts.reshape(S * C, P, 3), mm.reshape(S * C, P)
    )
    return cm.reshape(S, C, P), fr.reshape(S, C, P)


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

    total_pallas_ps = 0
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
                    if "custom-call" in name or any(
                        k in name
                        for k in ("closed_call", "pair", "multi", "pallas")
                    ):
                        total_pallas_ps += ev.duration_ps
                    else:
                        total_other_ps += ev.duration_ps
    n = max(n_execs, 1)
    return total_pallas_ps / n / 1e6, total_other_ps / n / 1e6


def main() -> None:
    mpts, mm = make_operands()
    ra = variant_a(mpts, mm)
    rb = variant_b(mpts, mm)
    rc = variant_c(mpts, mm)
    np.testing.assert_array_equal(np.asarray(ra[0]), np.asarray(rb[0]))
    np.testing.assert_array_equal(np.asarray(ra[1]), np.asarray(rb[1]))
    np.testing.assert_array_equal(np.asarray(ra[0]), np.asarray(rc[0]))
    np.testing.assert_array_equal(np.asarray(ra[1]), np.asarray(rc[1]))
    print("bit-parity A==B==C ok", flush=True)

    for tag, fn in (("A_8x_gridless", variant_a),
                    ("B_stacked_grid", variant_b),
                    ("C_flattened", variant_c)):
        k_us, o_us = device_events(fn, mpts, mm, tag)
        print(
            f'{{"variant": "{tag}", "pallas_us_per_dispatch": {k_us:.1f}, '
            f'"xla_side_us": {o_us:.1f}}}',
            flush=True,
        )


if __name__ == "__main__":
    main()
