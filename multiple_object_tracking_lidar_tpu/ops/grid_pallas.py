"""Pallas TPU kernel: fused voxel finalize + static drop-bit + grid CC.

The dense-grid perception tail (ops/cluster_grid.py) spends its time in
per-offset pad/slice traffic: every stencil sweep re-materializes ~74
shifted (gz, gy, gx) views of the label grid through HBM, and the
convergence `while_loop` pays dispatch overhead per trip.  At bench
shapes the whole grid is ~5.3k cells = 27 KB — it fits in VMEM hundreds
of times over.  This kernel keeps the entire tail in VMEM:

  * finalize: centroid = sums/count per cell, straight from the
    accumulator's channel-major (4, n_cells) layout
    (ref voxel semantics: PCL VoxelGrid, cpp:441-447);
  * static removal: the per-cell drop-bit window lookup
    (ops/static_mask.build_cell_static_table) — ~15 elementwise VPU ops
    (ref map test: cpp:667-687);
  * connected components: min-label stencil propagation
    (ref clustering: PCL EuclideanClusterExtraction, cpp:471-488), all
    sweeps VMEM-resident.  A shifted view is a FLAT ROLL of the
    (rows, 128) cell layout — two sublane rolls + one lane roll + a
    lane select — and per-offset adjacency is precomputed once into
    packed i32 bitplanes, so a sweep is ~7 VPU ops per stencil offset
    with zero HBM traffic.

Labels are identical to ops/cluster_grid.connected_components_grid
(min flat cell index per component; n_cells for non-dynamic cells) —
tested in interpret mode on CPU and in hardware mode in tests_tpu/.

Mosaic constraints honored: shifts via pltpu.roll, masks kept in
i32/bool vector form (no i1 reshapes), scalars in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiple_object_tracking_lidar_tpu.ops.cluster_grid import _stencil_offsets

_LANES = 128

# The kernel keeps the whole grid VMEM-resident: the measured scoped-VMEM
# footprint is ~410 bytes/cell (label + centroid + table + adjacency
# bitplanes + roll temporaries; 28 MB at 71.7k cells vs the 16 MB limit).
# Above this bound the auto path falls back to the jnp stencil CC.
MAX_KERNEL_CELLS = 32768


def fused_cc_fits(n_cells: int) -> bool:
    "True iff the fused kernel's whole-grid VMEM residency fits."
    return n_cells <= MAX_KERNEL_CELLS


def _flat_roll(a, s, rows):
    """out[flat] = a[(flat - s) mod (rows*128)] on a (rows, 128) layout."""
    s = s % (rows * _LANES)
    q, r = s // _LANES, s % _LANES
    if r == 0:
        return pltpu.roll(a, q, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    c1 = pltpu.roll(pltpu.roll(a, q, axis=0), r, axis=1)
    c2 = pltpu.roll(pltpu.roll(a, q + 1, axis=0), r, axis=1)
    return jnp.where(lane >= r, c1, c2)


def _kernel(
    scal_ref,  # SMEM (6,) f32: origin_x, origin_y, cos_nyaw, sin_nyaw, inv_res, tol2
    acc_ref,   # VMEM (4, R, 128) f32 channel-major accumulator (padded)
    brow_ref,  # VMEM (R, 128) i32 — static-table window origin rows
    bcol_ref,  # VMEM (R, 128) i32
    bits_ref,  # VMEM (R, 128) i32 — packed drop bits
    cent_ref,  # out VMEM (4, R, 128) f32 (3 centroid channels + dyn in [3])
    lab_ref,   # out VMEM (R, 128) i32
    nsw_ref,   # out SMEM (2,) i32 — [sweeps executed, saturated]
    *,
    dims: tuple[int, int, int],
    n: int,
    rows: int,
    offsets: tuple[tuple[int, int, int], ...],
    kwin: int,
    max_sweeps: int,
):
    gx, gy, gz = dims
    f32 = jnp.float32
    i32 = jnp.int32

    cnt = acc_ref[3]
    denom = jnp.maximum(cnt, 1.0)
    cmx = acc_ref[0] / denom
    cmy = acc_ref[1] / denom
    cmz = acc_ref[2] / denom

    rowi = jax.lax.broadcasted_iota(i32, (rows, _LANES), 0)
    lane = jax.lax.broadcasted_iota(i32, (rows, _LANES), 1)
    fi = rowi * _LANES + lane
    in_grid = fi < n

    # --- static removal: same per-frame f32 row/col math as the reference
    # (cpp:674-678: C-float arithmetic, trunc-toward-zero), map lookup is the
    # precomputed drop bit of this cell's window ---
    xm = cmx - scal_ref[0]
    ym = cmy - scal_ref[1]
    cosv, sinv, invr = scal_ref[2], scal_ref[3], scal_ref[4]
    col = ((cosv * xm - sinv * ym) * invr).astype(i32)
    row = ((sinv * xm + cosv * ym) * invr).astype(i32)
    qr = row - brow_ref[:]
    qc = col - bcol_ref[:]
    in_win = (qr >= 0) & (qr < kwin) & (qc >= 0) & (qc < kwin)
    bit = (
        jax.lax.shift_right_logical(
            bits_ref[:], jnp.clip(qr * kwin + qc, 0, kwin * kwin - 1)
        )
        & 1
    )
    drop = jnp.where(in_win, bit, 1)
    dyn = (cnt > 0.0) & (drop == 0) & in_grid

    cent_ref[0] = cmx
    cent_ref[1] = cmy
    cent_ref[2] = cmz
    cent_ref[3] = dyn.astype(f32)

    # --- adjacency bitplanes: one flat-rolled d2 test per stencil offset,
    # packed 32 offsets per i32 plane (computed once; sweeps only unpack) ---
    x = fi % gx
    yz = fi // gx
    y = yz % gy
    z = fi // (gx * gy)
    tol2 = scal_ref[5]
    dyn_f = dyn.astype(f32)

    n_words = (len(offsets) + 31) // 32
    planes = [jnp.zeros((rows, _LANES), i32) for _ in range(n_words)]
    for o_i, (dz, dy, dx) in enumerate(offsets):
        k_sh = dx + gx * (dy + gy * dz)
        ncx = _flat_roll(cmx, -k_sh, rows)
        ncy = _flat_roll(cmy, -k_sh, rows)
        ncz = _flat_roll(cmz, -k_sh, rows)
        ndy = _flat_roll(dyn_f, -k_sh, rows)
        ok = (
            (x + dx >= 0)
            & (x + dx < gx)
            & (y + dy >= 0)
            & (y + dy < gy)
            & (z + dz >= 0)
            & (z + dz < gz)
        )
        d2 = (cmx - ncx) ** 2 + (cmy - ncy) ** 2 + (cmz - ncz) ** 2
        adj = dyn & (ndy > 0.0) & ok & (d2 <= tol2)
        planes[o_i // 32] = planes[o_i // 32] | (
            adj.astype(i32) << jnp.int32(o_i % 32)
        )

    sentinel = jnp.int32(n)
    labels0 = jnp.where(dyn, fi, sentinel)

    def sweep(labels):
        nmin = jnp.full((rows, _LANES), sentinel, i32)
        for o_i, (dz, dy, dx) in enumerate(offsets):
            k_sh = dx + gx * (dy + gy * dz)
            nl = _flat_roll(labels, -k_sh, rows)
            adj = (
                jax.lax.shift_right_logical(
                    planes[o_i // 32], jnp.int32(o_i % 32)
                )
                & 1
            )
            nmin = jnp.minimum(nmin, jnp.where(adj == 1, nl, sentinel))
        return jnp.minimum(labels, nmin)

    # --- directional segmented min-scans (ADVICE r2): a plain stencil sweep
    # propagates labels one stencil radius, so a D-cell component needs
    # ~D/radius sweeps.  Along each grid axis, unit-step adjacency forms
    # RUNS, and the min label of a whole run spreads in log2(axis) steps by
    # prefix doubling: after the j-th step, labels cover a window of 2^(j+1)
    # chained cells and `reach` (all-pairs-chained indicator) doubles with
    # it.  Interleaving one such scan pass (both directions, each axis)
    # with each stencil sweep makes straight stretches — the shape of the
    # large bench components — converge in O(#turns) iterations instead of
    # O(diameter). ---
    axis_scan_inits = []
    for axis_off, k_sh, size in (
        ((0, 0, 1), 1, gx),
        ((0, 1, 0), gx, gy),
        ((1, 0, 0), gx * gy, gz),
    ):
        if size <= 1 or axis_off not in offsets:
            continue
        o_i = offsets.index(axis_off)
        # adj_fwd[i] <=> cells i and i+k_sh are radius-adjacent; kept in i32
        # 0/1 form — Mosaic's dynamic_rotate does not lower for i1 vectors
        adj_fwd = (
            jax.lax.shift_right_logical(planes[o_i // 32], jnp.int32(o_i % 32))
            & 1
        )
        axis_scan_inits.append((k_sh, size, adj_fwd))

    def axis_scans(labels):
        for k_sh, size, adj_fwd in axis_scan_inits:
            for sgn, reach0 in (
                (-1, adj_fwd),                        # pull from +axis side
                (+1, _flat_roll(adj_fwd, k_sh, rows)),  # pull from -axis side
            ):
                reach, s = reach0, k_sh
                while s // k_sh < size:
                    nl = _flat_roll(labels, sgn * s, rows)
                    labels = jnp.minimum(
                        labels, jnp.where(reach == 1, nl, sentinel)
                    )
                    reach = reach & _flat_roll(reach, sgn * s, rows)
                    s *= 2
        return labels

    def body(carry):
        labels, it, _ = carry
        new = axis_scans(sweep(labels))
        return new, it + 1, jnp.any(new != labels)

    def cond(carry):
        _, it, changed = carry
        return changed & (it < max_sweeps)

    labels, n_it, changed = jax.lax.while_loop(cond, body, (labels0, 0, True))
    lab_ref[:] = labels
    nsw_ref[0] = n_it
    # exited while still changing = the cap truncated propagation; labels may
    # under-merge (split clusters) — surfaced as FrameOutput.cc_saturated
    nsw_ref[1] = (changed & (n_it >= max_sweeps)).astype(i32)


class _Lead0:
    """Ref adapter prepending a leading 0 index — lets the SAME kernel body
    serve the single-frame call (blocks (4,R,128)/(R,128)) and the stacked
    call (per-frame blocks (1,4,R,128)/(1,R,128), grid over frames)."""

    def __init__(self, ref):
        self._ref = ref

    def _at(self, idx):
        return (0,) + (idx if isinstance(idx, tuple) else (idx,))

    def __getitem__(self, idx):
        return self._ref[self._at(idx)]

    def __setitem__(self, idx, v):
        self._ref[self._at(idx)] = v


class _NswCols:
    """nsw adapter for the stacked call: the (1, 2S) SMEM row stays resident
    across the whole grid; frame si writes columns (2si, 2si+1)."""

    def __init__(self, ref, si):
        self._ref = ref
        self._si = si

    def __setitem__(self, idx, v):
        self._ref[0, 2 * self._si + idx] = v


def _kernel_stacked(
    scal_ref, acc_ref, brow_ref, bcol_ref, bits_ref,
    cent_ref, lab_ref, nsw_ref, **kw
):
    si = pl.program_id(0)
    _kernel(
        scal_ref,
        _Lead0(acc_ref),
        brow_ref,
        bcol_ref,
        bits_ref,
        _Lead0(cent_ref),
        _Lead0(lab_ref),
        _NswCols(nsw_ref, si),
        **kw,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "tol", "leaf_xy", "leaf_z", "kwin", "max_sweeps", "interpret"
    ),
)
def fused_finalize_static_cc_stacked(
    accs_cm: jax.Array,   # (S, 4, n_cells) f32 channel-major accumulators
    scal: jax.Array,
    base_row: jax.Array,
    base_col: jax.Array,
    bits: jax.Array,
    *,
    dims: tuple[int, int, int],
    tol: float,
    leaf_xy: float,
    leaf_z: float,
    kwin: int,
    max_sweeps: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Whole-frame-stack variant: grid over the S frames (map operands stay
    resident; per-frame results identical to fused_finalize_static_cc —
    pinned by tests/test_grid.py::test_stacked_fused_cc_matches_per_frame).
    Returns (cent (S, 3, n), dyn (S, n) bool, labels (S, n) i32,
    n_sweeps (S,), saturated (S,)).

    STATUS: tested alternative, not wired into a dispatch path.  A fully
    frame-batched perception was measured SLOWER than the per-frame scan —
    the cluster-table rank machinery's cumsum intermediates spill to HBM in
    pathological layouts when batched (docs/PERFORMANCE.md round 3) — so
    bind_env_pipelined delegates to the scan program on this config.  Kept
    for future batched-dispatch work (e.g. a fleet tracker batching across
    streams rather than time)."""
    gx, gy, gz = dims
    n = gx * gy * gz
    if max_sweeps is None:
        max_sweeps = 2 * (gx + gy + gz)
    n_pad = -(-n // 1024) * 1024
    rows = n_pad // _LANES
    s = accs_cm.shape[0]

    offsets = tuple(
        o
        for o in _stencil_offsets(tol, leaf_xy, leaf_z)
        if abs(o[0]) < gz and abs(o[1]) < gy and abs(o[2]) < gx
    )

    acc_p = jnp.pad(
        accs_cm.astype(jnp.float32), ((0, 0), (0, 0), (0, n_pad - n))
    ).reshape(s, 4, rows, _LANES)
    pad1 = lambda a: jnp.pad(a, ((0, n_pad - n),)).reshape(rows, _LANES)

    cent4, labels, n_sw = pl.pallas_call(
        functools.partial(
            _kernel_stacked,
            dims=dims,
            n=n,
            rows=rows,
            offsets=offsets,
            kwin=kwin,
            max_sweeps=max_sweeps,
        ),
        grid=(s,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 4, rows, _LANES),
                lambda si: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, _LANES), lambda si: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda si: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda si: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 4, rows, _LANES),
                lambda si: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, _LANES), lambda si: (si, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 2 * s), lambda si: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, 4, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((s, rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 2 * s), jnp.int32),
        ],
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        acc_p,
        pad1(base_row.astype(jnp.int32)),
        pad1(base_col.astype(jnp.int32)),
        pad1(bits.astype(jnp.int32)),
    )

    flat4 = cent4.reshape(s, 4, n_pad)
    cent = flat4[:, :3, :n]
    dyn = flat4[:, 3, :n] > 0.0
    nsw = n_sw.reshape(s, 2)
    return cent, dyn, labels.reshape(s, n_pad)[:, :n], nsw[:, 0], nsw[:, 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "tol", "leaf_xy", "leaf_z", "kwin", "max_sweeps", "interpret"
    ),
)
def fused_finalize_static_cc(
    acc_cm: jax.Array,    # (4, n_cells) f32 channel-major accumulator
    scal: jax.Array,      # (6,) f32: origin_x, origin_y, cos, sin, inv_res, tol2
    base_row: jax.Array,  # (n_cells,) i32
    base_col: jax.Array,  # (n_cells,) i32
    bits: jax.Array,      # (n_cells,) i32
    *,
    dims: tuple[int, int, int],
    tol: float,
    leaf_xy: float,
    leaf_z: float,
    kwin: int,
    max_sweeps: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused finalize + static mask + CC.  Returns (cent (3, n_cells) f32,
    dyn (n_cells,) bool, labels (n_cells,) i32, n_sweeps, saturated).

    ``max_sweeps=None`` uses a grid-diameter bound, 2*(gx+gy+gz): with the
    per-iteration axis scans, each iteration merges at least one straight
    run, so only adversarial serpentine shapes approach the bound — the
    while_loop exits as soon as labels stop changing, so a generous cap
    costs nothing on real scenes.  ``saturated`` is nonzero iff the loop
    exited at the cap while labels were still changing (possible split
    clusters; ADVICE r2 asked for this to be surfaced)."""
    gx, gy, gz = dims
    n = gx * gy * gz
    if max_sweeps is None:
        max_sweeps = 2 * (gx + gy + gz)
    n_pad = -(-n // 1024) * 1024
    rows = n_pad // _LANES

    offsets = tuple(
        o
        for o in _stencil_offsets(tol, leaf_xy, leaf_z)
        if abs(o[0]) < gz and abs(o[1]) < gy and abs(o[2]) < gx
    )

    acc_p = jnp.pad(
        acc_cm.astype(jnp.float32), ((0, 0), (0, n_pad - n))
    ).reshape(4, rows, _LANES)
    pad1 = lambda a: jnp.pad(a, ((0, n_pad - n),)).reshape(rows, _LANES)

    cent4, labels, n_sw = pl.pallas_call(
        functools.partial(
            _kernel,
            dims=dims,
            n=n,
            rows=rows,
            offsets=offsets,
            kwin=kwin,
            max_sweeps=max_sweeps,
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (4, rows, _LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (4, rows, _LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        acc_p,
        pad1(base_row.astype(jnp.int32)),
        pad1(base_col.astype(jnp.int32)),
        pad1(bits.astype(jnp.int32)),
    )

    flat4 = cent4.reshape(4, n_pad)
    cent = flat4[:3, :n]
    dyn = flat4[3, :n] > 0.0
    return cent, dyn, labels.reshape(n_pad)[:n], n_sw[0], n_sw[1]
