"""Pallas TPU kernel: the order-faithful greedy association scan in VMEM.

The reference's association is an inherently sequential double loop — each
detection claims the first gated track in registration order, and its
updates (position writes, new-track registrations) are visible to the next
detection (cpp:177-219).  `ops/assign.py` expresses that as a `lax.scan`
with one-hot row reads/writes, but XLA executes each scan iteration as a
separately scheduled fusion: the per-iteration cost is a flat ~9-10 us of
issue overhead regardless of body size (measured; fully unrolling the scan
does not help — the chain itself serializes).  At D=64 detections that is
~600 us/frame whenever the frame is not provably order-independent, which
in dense scenes is every frame (docs/PERFORMANCE.md round 3).

This kernel runs the SAME scan with the whole state resident in VMEM/VREGs:
one fori_loop trip per detection, ~50 single-VREG VPU ops per trip, no HBM
traffic and no per-iteration scheduling — two orders of magnitude less
overhead.  Decisions are bit-identical to the jnp scan:

  * the bank state rides in (3, 128) f32/i32 carries
    (af = [last_x, last_y, last_t], ai = [alive, obj_id, birth_seq]);
  * dets live in SMEM and are read as scalars per trip;
  * argmin-free: birth_seq values are unique among alive tracks and slot
    indices are unique, so every argmin is a min + an equality one-hot;
  * row writes are one-hot selects; the per-detection output row is a
    masked column write into a (5, 128) i32 carry.

Capacity: K <= 128 tracks and D <= 128 detections (single-VREG lanes);
`associate_and_update` falls back to the jnp scan beyond that.

Reference: greedy first-match gating cpp:177-219, registration cpp:507-543,
interp trigger cpp:197-200.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BIG = 2**30


def _kernel(
    dets_ref,    # SMEM (D, 4) f32: x, y, _, t
    dv_ref,      # SMEM (D,) i32 valid
    cnt_ref,     # SMEM (2,) i32: next_obj_num, next_birth
    af_ref,      # VMEM (3, 128) f32: last_x, last_y, last_t per slot
    ai_ref,      # VMEM (3, 128) i32: alive, obj_id, birth_seq per slot
    allow_ref,   # VMEM (1, 128) i32: per-slot gate allow (frame scalar bcast)
    ai_out,      # VMEM (3, 128) i32
    outs_out,    # VMEM (5, 128) i32: slot, id, new, ok, interp per detection
    cnt_out,     # SMEM (3,) i32: next_obj_num, next_birth, overflow
    *,
    n_dets: int,
    k: int,
    thr: float,
    dt_gp: float,
    interp_gap_factor: float,
):
    f32 = jnp.float32
    i32 = jnp.int32

    lane = jax.lax.broadcasted_iota(i32, (1, _LANES), 1)
    lane_k = lane < k
    dlane = lane < n_dets
    allow = allow_ref[...] != 0

    af0 = af_ref[...]
    ai0 = ai_ref[...]
    outs0 = jnp.where(
        jax.lax.broadcasted_iota(i32, (5, _LANES), 0) == 1, -1, 0
    )  # id row defaults to -1 (dropped), everything else 0
    outs0 = jnp.where(dlane, outs0, 0)

    def trip(j, carry):
        af, ai, outs, nobj, nbirth, ovf = carry
        d0 = dets_ref[j, 0]
        d1 = dets_ref[j, 1]
        d3 = dets_ref[j, 3]
        dv = dv_ref[j] != 0

        alive = (ai[0:1] > 0) & lane_k
        dx = d0 - af[0:1]
        dy = d1 - af[1:2]
        dist = jnp.sqrt(dx * dx + dy * dy)
        gate = alive & (dist < thr) & allow
        am = jnp.max(gate.astype(i32), axis=1, keepdims=True) > 0  # (1,1)

        # slot_m: min birth_seq among gated (births unique among alive)
        bsel = jnp.where(gate, ai[2:3], _BIG)
        bmin = jnp.min(bsel, axis=1, keepdims=True)
        sel_m = gate & (bsel == bmin)
        # slot_n: first free slot (indices unique)
        free = ~alive & lane_k
        fsel = jnp.where(free, lane, _BIG)
        fmin = jnp.min(fsel, axis=1, keepdims=True)
        sel_n = free & (fsel == fmin)
        bank_full = jnp.min((alive | ~lane_k).astype(i32), axis=1, keepdims=True) > 0

        # select in i32: Mosaic rejects select_n on i1 vector operands
        sel = (
            jnp.where(am, sel_m.astype(i32), sel_n.astype(i32)) > 0
        )  # (1, 128) one-hot (or all-false)

        t_slot = jnp.sum(jnp.where(sel, af[2:3], 0.0), axis=1, keepdims=True)
        id_slot = jnp.sum(jnp.where(sel, ai[1:2], 0), axis=1, keepdims=True)
        gap = d3 - t_slot
        do_interp = am & (gap > interp_gap_factor * dt_gp) & (
            jnp.round(gap / dt_gp) - 1.0 >= 1.0
        )

        register = dv & ~am & ~bank_full          # (1,1)
        matched = dv & am
        write = matched | register
        ri = register.astype(i32)

        wf = sel & write                          # (1, 128)
        rowf = jax.lax.broadcasted_iota(i32, (3, _LANES), 0)
        newf = jnp.where(rowf == 0, d0, jnp.where(rowf == 1, d1, d3))
        af = jnp.where(wf, newf, af)
        wreg = sel & register
        newi = jnp.where(rowf == 0, 1, jnp.where(rowf == 1, nobj, nbirth))
        ai = jnp.where(wreg, newi, ai)

        slot_v = jnp.sum(jnp.where(sel, lane, 0), axis=1, keepdims=True)
        out_id = jnp.where(matched, id_slot, jnp.where(register, nobj, -1))
        row5 = jax.lax.broadcasted_iota(i32, (5, _LANES), 0)
        val = jnp.where(
            row5 == 0,
            slot_v,
            jnp.where(
                row5 == 1,
                out_id,
                jnp.where(
                    row5 == 2,
                    ri,
                    jnp.where(
                        row5 == 3,
                        write.astype(i32),
                        (do_interp & write).astype(i32),
                    ),
                ),
            ),
        )
        outs = jnp.where(lane == j, val, outs)

        nobj = nobj + ri[0, 0]
        nbirth = nbirth + ri[0, 0]
        ovf = ovf + (dv & ~am & bank_full).astype(i32)[0, 0]
        return af, ai, outs, nobj, nbirth, ovf

    nobj0 = cnt_ref[0]
    nbirth0 = cnt_ref[1]

    # Dynamic trip count: a trip whose detection is INVALID mutates nothing
    # (write/register/ovf all gate on dv) and writes exactly the outs0
    # defaults to its output lane — except the slot row, which is contract-
    # free off ok-lanes (ops/assign.py AssocResult: det_slot is defined
    # only where det_ok; the jnp fast path already zeroes it there, and the
    # parity suite compares it only where ok).  So the scan only needs to
    # run through the LAST valid detection; at bench activity that is ~4-5
    # trips instead of D=32 (~8 us/frame saved; docs/PERFORMANCE.md r5).
    # The bound comes from a scalar SMEM scan, so interior invalid lanes
    # still execute their (no-op) trips — correct for any validity pattern,
    # not just the rank-ordered contiguous one the cluster table produces.
    def last_valid(i, m):
        return jnp.where(dv_ref[i] != 0, i + 1, m)

    bound = jax.lax.fori_loop(0, n_dets, last_valid, jnp.int32(0))
    _, ai_f, outs_f, nobj_f, nbirth_f, ovf_f = jax.lax.fori_loop(
        0, bound, trip, (af0, ai0, outs0, nobj0, nbirth0, jnp.int32(0))
    )
    ai_out[...] = ai_f
    outs_out[...] = outs_f
    cnt_out[0] = nobj_f
    cnt_out[1] = nbirth_f
    cnt_out[2] = ovf_f


@functools.partial(
    jax.jit,
    static_argnames=("thr", "dt_gp", "interp_gap_factor", "interpret"),
)
def assoc_scan_pallas(
    af0: jax.Array,         # (K, 3) f32 [last_x, last_y, last_t]
    ai0: jax.Array,         # (K, 3) i32 [alive, obj_id, birth_seq]
    dets: jax.Array,        # (D, 4) f32
    det_valid: jax.Array,   # (D,) bool
    allow: jax.Array,       # scalar bool — frame-level gate allow
    next_obj_num: jax.Array,
    next_birth: jax.Array,
    *,
    thr: float,
    dt_gp: float,
    interp_gap_factor: float,
    interpret: bool = False,
):
    """Greedy association decisions, bit-identical to the jnp scan in
    ops/assign.py.  Returns (alive (K,), obj_id (K,), birth_seq (K,),
    next_obj_num, next_birth, overflow, slots (D,), ids (D,), news (D,),
    oks (D,), interps (D,))."""
    k = af0.shape[0]
    d = dets.shape[0]
    assert k <= _LANES and d <= _LANES, "assoc kernel capacity: K,D <= 128"

    afp = jnp.zeros((3, _LANES), jnp.float32).at[:, :k].set(
        af0.astype(jnp.float32).T
    )
    aip = jnp.zeros((3, _LANES), jnp.int32).at[:, :k].set(ai0.T)
    allow_v = jnp.broadcast_to(
        allow.astype(jnp.int32).reshape(1, 1), (1, _LANES)
    )

    ai_f, outs, cnt = pl.pallas_call(
        functools.partial(
            _kernel,
            n_dets=d,
            k=k,
            thr=float(thr),
            dt_gp=float(dt_gp),
            interp_gap_factor=float(interp_gap_factor),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((5, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((3,), jnp.int32),
        ],
        interpret=interpret,
    )(
        dets.astype(jnp.float32),
        det_valid.astype(jnp.int32),
        jnp.stack([next_obj_num, next_birth]).astype(jnp.int32),
        afp,
        aip,
        allow_v,
    )

    return (
        ai_f[0, :k] > 0,
        ai_f[1, :k],
        ai_f[2, :k],
        cnt[0],
        cnt[1],
        cnt[2],
        outs[0, :d],
        outs[1, :d],
        outs[2, :d] > 0,
        outs[3, :d] > 0,
        outs[4, :d] > 0,
    )
