"""Pallas TPU kernel: per-cluster circumcenter features, VMEM-resident.

The XLA lowering of `ops.centroid.circumcenter_features_table` materializes
the (C, P, P) pairwise-distance tensor in HBM (~19 MB at bench shapes) and
reads it back through the max/argmax reductions — ~90 us/frame of pure HBM
traffic for ~1 MB of useful input.  This kernel runs the whole farthest-pair
+ farthest-from-line + circumcenter chain (ref getCentroid,
src/multiple_object_tracking_lidar.cpp:708-822) with the per-cluster (P, P)
distance matrix living only in VMEM: the streamed input is just the member
table itself.

Semantics match the jnp path: same centered-gram d2, same first-maximum
tie-breaks (row-major lexicographic (i, j) — the reference's strict->
update rule), same value-equality skip for the third point, same G==0
collinear fallback.  In-cluster f32 reduction order may differ from XLA's
at the ulp level (documented; the parity test allows it).

Layout notes: Mosaic transposes are relayouts, so the host passes each
cluster's members in BOTH orientations ((P, 3) sublane-major for the gram
lhs, (3, P) lane-major for row broadcasts) and the mask likewise; the
duplicated operands total ~300 KB per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _one(mp, mpt, mm_row, mm_col, p):
    """mp (P,3), mpt (3,P), mm_row (1,P), mm_col (P,1) 0/1 f32 -> scalars."""
    f32 = jnp.float32
    n_m = jnp.sum(mm_row)
    cnt = jnp.maximum(n_m, 1.0)
    any_m = (n_m > 0.0).astype(f32)

    # --- 1. farthest 3-D pair via the centered gram (cpp:731-759) ---
    c_row = any_m * jnp.sum(mp * mm_col, axis=0, keepdims=True) / cnt  # (1,3)
    cxs, cys, czs = c_row[0, 0], c_row[0, 1], c_row[0, 2]
    i31 = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    c_col = jnp.where(i31 == 0, cxs, jnp.where(i31 == 1, cys, czs))    # (3,1)
    pc = (mp - c_row) * mm_col                                         # (P,3)
    pct = (mpt - c_col) * mm_row                                       # (3,P)
    sq_col = jnp.sum(pc * pc, axis=1, keepdims=True)                   # (P,1)
    sq_row = jnp.sum(pct * pct, axis=0, keepdims=True)                 # (1,P)
    gram = jax.lax.dot_general(
        pc, pct, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                                  # (P,P)
    d2 = sq_col + sq_row - 2.0 * gram
    rowi = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    pair_ok = (mm_col > 0.0) & (mm_row > 0.0) & (rowi < coli)
    d2m = jnp.where(pair_ok, d2, -1.0)
    # first lexicographic (i, j) maximum == (first max row, first max col)
    row_max = jnp.max(d2m, axis=1, keepdims=True)                      # (P,1)
    row_arg = jnp.min(
        jnp.where(d2m == row_max, coli, p), axis=1, keepdims=True
    )                                                                  # (P,1)
    gmax = jnp.max(row_max)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    i_star = jnp.min(jnp.where(row_max == gmax, iota_c, p))            # scalar
    oh_i = (iota_c == i_star).astype(jnp.float32)                      # (P,1)
    j_star = jnp.sum(oh_i * row_arg.astype(jnp.float32)).astype(jnp.int32)
    oh_j = (iota_c == j_star).astype(jnp.float32)
    # row extraction via one-hot reduction (dynamic_slice on values is not
    # lowerable in Mosaic): exact — exactly one nonzero term
    pi = jnp.sum(mp * oh_i, axis=0, keepdims=True)                     # (1,3)
    pj = jnp.sum(mp * oh_j, axis=0, keepdims=True)
    pix, piy, piz = pi[0, 0], pi[0, 1], pi[0, 2]
    pjx, pjy, pjz = pj[0, 0], pj[0, 1], pj[0, 2]

    # --- 2. farthest point from the PiPj line in XY (cpp:763-784) ---
    ex = pjx - pix
    ey = pjy - piy
    xs, ys, zs = mpt[0:1, :], mpt[1:2, :], mpt[2:3, :]
    cross = jnp.abs(ex * (ys - piy) - ey * (xs - pix))                 # (1,P)
    norm = jnp.sqrt(ex * ex + ey * ey)
    line_d = cross / jnp.maximum(norm, jnp.float32(1e-30))
    eq_i = (xs == pix) & (ys == piy) & (zs == piz)
    eq_j = (xs == pjx) & (ys == pjy) & (zs == pjz)
    k_mask = (mm_row > 0.0) & ~eq_i & ~eq_j
    ld = jnp.where(k_mask, line_d, -1.0)                               # (1,P)
    ld_max = jnp.max(ld)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    k_star = jnp.min(jnp.where(ld == ld_max, lane_p, p))               # scalar
    oh_k = (lane_p == k_star).astype(jnp.float32)                      # (1,P)
    pk = jnp.sum(mpt * oh_k, axis=1, keepdims=True)                    # (3,1)
    pkx, pky = pk[0, 0], pk[1, 0]

    # --- 3. circumcenter determinant formula (cpp:787-809) ---
    a = pjx - pix
    b = pjy - piy
    c = pkx - pix
    d = pky - piy
    e = a * (pix + pjx) + b * (piy + pjy)
    f = c * (pix + pkx) + d * (piy + pky)
    g = 2.0 * (a * (pky - pjy) - b * (pkx - pjx))
    collinear = g == 0.0
    g_safe = jnp.where(collinear, 1.0, g)
    cx = jnp.where(collinear, pix, (d * e - b * f) / g_safe)
    cy = jnp.where(collinear, piy, (a * f - c * e) / g_safe)
    return cx, cy


def _kernel(mp_ref, mpt_ref, mmr_ref, mmc_ref, out_ref, *, cb, p):
    for ci in range(cb):
        cx, cy = _one(
            mp_ref[ci],                  # (P, 3)
            mpt_ref[ci],                 # (3, P)
            mmr_ref[ci : ci + 1, :],     # (1, P)
            mmc_ref[ci],                 # (P, 1)
            p,
        )
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
        out_ref[ci : ci + 1, :] = jnp.where(lane2 == 0, cx, cy)


def circumcenter_xy_pallas(
    mpts: jax.Array,         # (C, P, 3) f32 member table
    member_mask: jax.Array,  # (C, P) bool
    cb: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(C, 2) circumcenter xy per cluster (garbage rows where no members).

    ``cb`` = clusters per grid step; Mosaic's block rule requires leading
    block dims to divide the array (trailing dims 8/128-divisible or whole),
    so a caller-passed cb is honored only when it divides C — otherwise the
    auto choice (8 if C % 8 == 0 else whole-array) applies.  ADVICE r2: the
    parameter used to be silently overwritten."""
    c, p, _ = mpts.shape
    if cb is None or c % cb != 0:
        cb = 8 if c % 8 == 0 else c
    mpts = mpts.astype(jnp.float32)
    mpt_t = jnp.swapaxes(mpts, 1, 2)                         # (C, 3, P)
    mm_r = member_mask.astype(jnp.float32)                   # (C, P)
    mm_c = mm_r[:, :, None]                                  # (C, P, 1)

    return pl.pallas_call(
        functools.partial(_kernel, cb=cb, p=p),
        grid=(c // cb,),
        in_specs=[
            pl.BlockSpec((cb, p, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 3, p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, p, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, 2), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 2), jnp.float32),
        interpret=interpret,
    )(mpts, mpt_t, mm_r, mm_c)


def _kernel_v3(
    mp_ref, mpt_ref, mm_ref, cnt_ref, cm_ref, fr_ref, *, c, p, sb_rows=None
):
    """Vectorized + validity-predicated farthest-pair kernel (phase A of the
    circumcenter feature).

    The 2024-round-2 kernel (`_kernel` above) ran ~25 scalar phases per
    cluster (extract/compare/select on Mosaic's scalar unit) and measured
    SLOWER than the XLA (C, P, P) path (99 vs 68 us).  This one computes
    ONLY the O(P^2) pair statistics, with a property XLA cannot reproduce:
    each cluster's (P, P) work runs behind a `@pl.when(any members)`
    predicate, so empty slots cost only a scalar branch (static shapes
    force the XLA path to pay all C slots; bench headline frames have 3-4
    valid slots of 32).  Two generations of trace findings are baked in:
    the round-4 v2 kernel predicated the (P, P) slabs but still paid two
    (1, P) output fills + a member-count reduction per EMPTY slot (~24
    us/cloud); v3 hoists the fills to one whole-array write each and takes
    the member counts as an SMEM (C,) i32 input (a 2 us XLA-side reduce at
    the call site), so an empty slot costs exactly one scalar compare +
    branch — outputs bit-identical to v2 (pinned on hardware,
    tests_tpu/test_kernels_hw.py::test_centroid_v2_kernel_hw).

    Outputs per cluster: ``colmax[j] = max_i d2m[i, j]`` and
    ``firstrow[j] = min {i : d2m[i, j] == colmax[j]}`` (P where no pair).
    The selection, farthest-from-line scan, and the circumcenter
    determinant happen OUTSIDE the kernel in jnp
    (ops.centroid.circumcenter_from_pair_stats) so those knife-edge
    computations (`G == 0` collinearity, value-equality skips — reference
    cpp:763-809) use the exact same arithmetic as the pure-jnp path: an
    earlier all-in-kernel variant disagreed with XLA on collinear clusters
    because Mosaic fused `a*b - c*d` into an FMA whose residual (~1e-8)
    defeated the G == 0 test that XLA's separately-rounded form satisfied.

    Tie-break equivalence with the jnp path (reference cpp:731-759 first-
    strict-max semantics): the jnp path takes (first max row i*, first max
    col within it).  Because d2m is upper-triangular-masked, no row before
    i* contains the global max, so i* = min firstrow over gmax columns and
    j* = first gmax column whose firstrow == i* — identical picks on
    identical f32 values (in-cluster reduction order may differ from XLA
    at ulp level, as for `_kernel`).  Slabs arrive in ascending row order,
    so on a colmax tie the EARLIER slab's row wins (min) — matching the
    unsliced first-row-achieving-colmax semantics."""
    f32 = jnp.float32
    i32 = jnp.int32
    if sb_rows is None:
        sb_rows = 128 if p % 128 == 0 else p
    assert p % sb_rows == 0, (p, sb_rows)
    n_slabs = p // sb_rows
    rowi_s = jax.lax.broadcasted_iota(i32, (sb_rows, p), 0)
    coli_s = jax.lax.broadcasted_iota(i32, (sb_rows, p), 1)
    ones11 = jnp.ones((1, 1), f32)

    cm_ref[...] = jnp.full((c, p), -1.0, f32)
    fr_ref[...] = jnp.full((c, p), p, i32)

    for ci in range(c):
        n_i = cnt_ref[ci]

        @pl.when(n_i > 0)
        def _(ci=ci, n_i=n_i):
            mm_row = mm_ref[ci : ci + 1, :]                # (1, P) f32 0/1
            n_m = n_i.astype(f32)
            mpt = mpt_ref[ci]                              # (3, P)
            cnt = jnp.maximum(n_m, 1.0)
            c_row3 = jnp.sum(mpt * mm_row, axis=1, keepdims=True) / cnt
            pct = (mpt - c_row3) * mm_row                  # (3, P)
            sq_row = jnp.sum(pct * pct, axis=0, keepdims=True)
            c_row = jax.lax.dot_general(
                ones11, c_row3, (((0,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (1, 3)

            for sb in range(n_slabs):
                base = sb * sb_rows

                @pl.when(n_i > base)
                def _(ci=ci, mm_row=mm_row, base=base, c_row=c_row,
                      pct=pct, sq_row=sq_row):
                    mp_s = mp_ref[ci, base : base + sb_rows, :]   # (S, 3)
                    mm_s = mm_ref[ci : ci + 1, base : base + sb_rows]
                    mmcol_s = jax.lax.dot_general(
                        mm_s, ones11, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )                                             # (S, 1)
                    pc_s = (mp_s - c_row) * mmcol_s               # (S, 3)
                    sq_col_s = jnp.sum(pc_s * pc_s, axis=1, keepdims=True)
                    gram_s = jax.lax.dot_general(
                        pc_s, pct, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )                                             # (S, P)
                    d2 = sq_col_s + sq_row - 2.0 * gram_s
                    ri = rowi_s + base
                    pair_ok = (
                        (mmcol_s > 0.0) & (mm_row > 0.0) & (ri < coli_s)
                    )
                    d2m = jnp.where(pair_ok, d2, -1.0)
                    cm_s = jnp.max(d2m, axis=0, keepdims=True)    # (1, P)
                    fr_s = jnp.min(
                        jnp.where(d2m == cm_s, ri, p), axis=0, keepdims=True
                    )
                    cm_old = cm_ref[ci : ci + 1, :]
                    fr_old = fr_ref[ci : ci + 1, :]
                    cm_ref[ci : ci + 1, :] = jnp.maximum(cm_old, cm_s)
                    fr_ref[ci : ci + 1, :] = jnp.where(
                        cm_s > cm_old,
                        fr_s,
                        jnp.where(cm_s == cm_old, jnp.minimum(fr_old, fr_s), fr_old),
                    )


def _kernel_v5_dyn(
    mp_ref, mpt_ref, mm_ref, cnt_ref, cm_ref, fr_ref, *, c, p, sb_rows
):
    """Dynamic-trip-count variant of _kernel_v3 (same per-slot arithmetic,
    same outputs bit-for-bit).

    The round-5 overhead probe (scripts/micro_pair_stats.py history,
    docs/PERFORMANCE.md round 5) showed v3's cost is NOT the per-ACTIVE-slot
    work (~2.3 us each) but a ~14 us FIXED floor at ZERO active slots —
    while a stripped kernel with the same launch, output fills, and 32
    scalar branches measures 0.9 us.  The floor scales with the number of
    UNROLLED slot bodies: 32 copies of the vectorized pair block make a
    large Mosaic program whose per-invocation load/fetch dominates, dead or
    not.  This kernel emits the slot body ONCE inside a
    `lax.fori_loop(0, bound)` where `bound` = (last slot with members) + 1,
    computed by a scalar SMEM scan — correct for ANY activity pattern, not
    just the rank-ordered-contiguous one the cluster table guarantees
    (slots past `bound` keep their init values exactly as v3's skipped
    branches; interior empty slots hit the same `n_i > 0` guard).

    Dynamic-index layout rule: every ref the loop indexes by `ci` keeps
    that axis as an UNTILED leading dim — mp (C, P, 3) and mpt (C, 3, P)
    already do; mm/cm/fr ride as (C, 1, P) so the dynamic index never
    touches a tiled (sublane/lane) dim.  The wrapper reshapes outputs back
    to (C, P)."""
    f32 = jnp.float32
    i32 = jnp.int32
    assert p % sb_rows == 0, (p, sb_rows)
    n_slabs = p // sb_rows
    rowi_s = jax.lax.broadcasted_iota(i32, (sb_rows, p), 0)
    coli_s = jax.lax.broadcasted_iota(i32, (sb_rows, p), 1)
    ones11 = jnp.ones((1, 1), f32)

    cm_ref[...] = jnp.full((c, 1, p), -1.0, f32)
    fr_ref[...] = jnp.full((c, 1, p), p, i32)

    def last_active(i, m):
        return jnp.where(cnt_ref[i] > 0, i + 1, m)

    bound = jax.lax.fori_loop(0, c, last_active, jnp.int32(0))

    def slot(ci, carry):
        n_i = cnt_ref[ci]

        @pl.when(n_i > 0)
        def _():
            mm_row = mm_ref[ci]                            # (1, P) f32 0/1
            n_m = n_i.astype(f32)
            mpt = mpt_ref[ci]                              # (3, P)
            cnt = jnp.maximum(n_m, 1.0)
            c_row3 = jnp.sum(mpt * mm_row, axis=1, keepdims=True) / cnt
            pct = (mpt - c_row3) * mm_row                  # (3, P)
            sq_row = jnp.sum(pct * pct, axis=0, keepdims=True)
            c_row = jax.lax.dot_general(
                ones11, c_row3, (((0,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (1, 3)

            for sb in range(n_slabs):
                base = sb * sb_rows

                @pl.when(n_i > base)
                def _(mm_row=mm_row, base=base, c_row=c_row,
                      pct=pct, sq_row=sq_row):
                    mp_s = mp_ref[ci, base : base + sb_rows, :]   # (S, 3)
                    mm_s = mm_ref[ci, :, base : base + sb_rows]   # (1, S)
                    mmcol_s = jax.lax.dot_general(
                        mm_s, ones11, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )                                             # (S, 1)
                    pc_s = (mp_s - c_row) * mmcol_s               # (S, 3)
                    sq_col_s = jnp.sum(pc_s * pc_s, axis=1, keepdims=True)
                    gram_s = jax.lax.dot_general(
                        pc_s, pct, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )                                             # (S, P)
                    d2 = sq_col_s + sq_row - 2.0 * gram_s
                    ri = rowi_s + base
                    pair_ok = (
                        (mmcol_s > 0.0) & (mm_row > 0.0) & (ri < coli_s)
                    )
                    d2m = jnp.where(pair_ok, d2, -1.0)
                    cm_s = jnp.max(d2m, axis=0, keepdims=True)    # (1, P)
                    fr_s = jnp.min(
                        jnp.where(d2m == cm_s, ri, p), axis=0, keepdims=True
                    )
                    cm_old = cm_ref[ci]                           # (1, P)
                    fr_old = fr_ref[ci]
                    cm_ref[ci] = jnp.maximum(cm_old, cm_s)
                    fr_ref[ci] = jnp.where(
                        cm_s > cm_old,
                        fr_s,
                        jnp.where(cm_s == cm_old, jnp.minimum(fr_old, fr_s), fr_old),
                    )

        return carry

    jax.lax.fori_loop(0, bound, slot, jnp.int32(0))


def pair_stats_pallas(
    mpts: jax.Array,         # (C, P, 3) f32 member table
    member_mask: jax.Array,  # (C, P) bool
    interpret: bool = False,
    slab_rows: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """((C, P) colmax f32, (C, P) firstrow i32) farthest-pair statistics
    via the predicated kernel (see _kernel_v3).  Whole problem
    VMEM-resident, one grid step; member counts ride in SMEM so empty
    slots cost one scalar branch.

    slab_rows: rows per (slab_rows, P) d2 block inside the per-slot scan;
    None = the kernel's default policy.  Output bits are invariant to it
    (the cross-slab max/min-tie chain == the single-pass reductions), so
    it is purely a performance knob — see docs/PERFORMANCE.md round 5."""
    c, p, _ = mpts.shape
    mpts = mpts.astype(jnp.float32)
    mpt_t = jnp.swapaxes(mpts, 1, 2)                       # (C, 3, P)
    mm = member_mask.astype(jnp.float32)                   # (C, P)
    cnt = jnp.sum(member_mask, axis=1, dtype=jnp.int32)    # (C,)

    return pl.pallas_call(
        functools.partial(_kernel_v3, c=c, p=p, sb_rows=slab_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, p), jnp.float32),
            jax.ShapeDtypeStruct((c, p), jnp.int32),
        ),
        interpret=interpret,
    )(mpts, mpt_t, mm, cnt)


def pair_stats_pallas_dyn(
    mpts: jax.Array,         # (C, P, 3) f32 member table
    member_mask: jax.Array,  # (C, P) bool
    interpret: bool = False,
    slab_rows: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """pair_stats via the dynamic-trip-count kernel (_kernel_v5_dyn):
    bit-identical outputs to pair_stats_pallas, but the slot body is
    compiled ONCE and looped with a data-dependent bound, so the kernel's
    cost is ~(active slots) x ~2.3 us instead of carrying a ~14 us fixed
    floor of unrolled dead bodies (and the gap widens with C: the dense
    scene's C=96 table pays the unrolled floor 3x)."""
    c, p, _ = mpts.shape
    if slab_rows is None:
        slab_rows = p  # one pass; cluster sizes are data-dependent anyway
    mpts = mpts.astype(jnp.float32)
    mpt_t = jnp.swapaxes(mpts, 1, 2)                       # (C, 3, P)
    mm = member_mask.astype(jnp.float32)[:, None, :]       # (C, 1, P)
    cnt = jnp.sum(member_mask, axis=1, dtype=jnp.int32)    # (C,)

    cm, fr = pl.pallas_call(
        functools.partial(_kernel_v5_dyn, c=c, p=p, sb_rows=slab_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, p), jnp.int32),
        ),
        interpret=interpret,
    )(mpts, mpt_t, mm, cnt)
    return cm[:, 0, :], fr[:, 0, :]


def circumcenter_features_table_pallas_v2(
    mpts: jax.Array,
    member_mask: jax.Array,
    t: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.centroid.circumcenter_features_table: (C, 4)
    [x, y, 0, t] detections.  Phase A (O(P^2) pair scan) in the predicated
    DYNAMIC-loop kernel (_kernel_v5_dyn — bit-identical to the unrolled v3,
    ~2.8x faster at bench activity because it carries no unrolled dead slot
    bodies); selection + line + determinant in shared jnp code."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import (
        circumcenter_from_pair_stats,
    )

    cm, fr = pair_stats_pallas_dyn(
        mpts, member_mask, interpret=interpret,
        slab_rows=128 if mpts.shape[1] % 128 == 0 else None,
    )
    return circumcenter_from_pair_stats(cm, fr, mpts, member_mask, t)


def circumcenter_features_table_pallas(
    mpts: jax.Array,
    member_mask: jax.Array,
    t: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.centroid.circumcenter_features_table: (C, 4)
    [x, y, 0, t] detections."""
    c = mpts.shape[0]
    xy = circumcenter_xy_pallas(mpts, member_mask, interpret=interpret)
    zeros = jnp.zeros((c, 1), jnp.float32)
    tcol = jnp.full((c, 1), t, jnp.float32)
    return jnp.concatenate([xy, zeros, tcol], axis=1).astype(mpts.dtype)
