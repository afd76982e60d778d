"""Pallas TPU kernel: segment totals over key-sorted rows.

The deterministic voxel-accumulation path (docs/PERFORMANCE.md): XLA's
scatter compilation is a lottery on this stack, and the pure-jnp scan
voxelizer pays 17 HBM-level shift-add passes.  This kernel does the same
segmented reduction entirely in VMEM:

  * the host sorts (cell_key, x, y, z, w) with `jax.lax.sort` (reliably fast);
  * the kernel walks the sorted rows in blocks, computing a segmented
    Hillis-Steele prefix per block with `pltpu.roll` (log2(B) passes, all
    VMEM-resident) and carrying the trailing partial segment across blocks
    in scratch — one HBM read + one write per row, total;
  * the last row of each segment then holds the segment total; compaction to
    the dense/compacted voxel list happens outside with gather-only ops.

Combined with `voxel_downsample_runs` this replaces both the scatter grid
and the jnp scan mode; select with ``TrackerConfig(voxel_mode="runs")``.

Mosaic constraints honored: shifts via pltpu.roll (no value slicing/concat),
broadcasts through f32/i32 (no i1 reshapes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiple_object_tracking_lidar_tpu.config import SceneBounds
from multiple_object_tracking_lidar_tpu.ops.voxel import _quantize, grid_shape

_BLOCK = 2048  # (B, 1) blocks pad to 128 lanes in VMEM; keep the padded tile ~1 MB


def _segsum_kernel(ks_ref, vals_ref, out_ref, carry_key, carry_sum, block: int):
    b = pl.program_id(0)
    ks = ks_ref[:]          # (B, 1) int32, sorted ascending (this block)
    pfx = vals_ref[:]       # (B, 4) f32

    rowidx = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    sh = 1
    while sh < block:
        same = (pltpu.roll(ks, sh, axis=0) == ks) & (rowidx >= sh)   # (B, 1)
        pfx = pfx + pltpu.roll(pfx, sh, axis=0) * same.astype(jnp.float32)
        sh *= 2

    # fold in the previous block's trailing partial segment
    @pl.when(b > 0)
    def _():
        mask = (ks == carry_key[0]).astype(jnp.float32)              # (B, 1)
        out_ref[:] = pfx + mask * carry_sum[:]

    @pl.when(b == 0)
    def _():
        out_ref[:] = pfx

    # carry = this block's final prefix (includes folded carry when the
    # segment spans the boundary, because row B-1's prefix covers the whole
    # block and the fold above is applied before we read it back)
    carry_key[0] = ks[block - 1, 0]
    carry_sum[:] = out_ref[block - 1 : block, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_totals_pallas(
    ks: jax.Array,      # (N,) int32, sorted ascending
    vals: jax.Array,    # (N, 4) f32, co-sorted
    interpret: bool = False,
) -> jax.Array:
    """(N, 4) segmented prefix sums: row i holds the sum of its segment's
    rows up to and including i — so the LAST row of each segment is the
    segment total."""
    n = ks.shape[0]
    block = min(_BLOCK, n)
    if n % block != 0:
        raise ValueError(f"N must be a multiple of {block}, got {n}")
    grid = n // block
    return pl.pallas_call(
        functools.partial(_segsum_kernel, block=block),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(ks.astype(jnp.int32)[:, None], vals.astype(jnp.float32))


def voxel_downsample_runs(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    m_max: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic voxel centroid downsample: sort + Pallas segment totals
    + gather-only compaction.  Same semantics/ordering as the dense path."""
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)

    ix, iy, iz = _quantize(points, leaf_xy, leaf_z)
    ix -= bx
    iy -= by
    iz -= bz
    in_bounds = (
        mask
        & (ix >= 0) & (ix < gx)
        & (iy >= 0) & (iy < gy)
        & (iz >= 0) & (iz < gz)
    )
    lin = ix + gx * (iy + gy * iz)
    keys = jnp.where(in_bounds, lin, n_cells).astype(jnp.int32)
    w = in_bounds.astype(jnp.float32)

    ks, xs, ys, zs = jax.lax.sort(
        (keys, points[:, 0] * w, points[:, 1] * w, points[:, 2] * w),
        num_keys=1,
    )
    tx, ty, tz = segment_totals_raster(ks, xs, ys, zs, interpret=interpret)
    totals = jnp.stack([tx, ty, tz], axis=1)

    n = points.shape[0]
    is_last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones(1, bool)]) & (ks < n_cells)
    n_vox = is_last.sum()
    # gather-only compaction via ONE MORE SORT: boundary rows keep their
    # (ascending) index, others go to the back.  jnp.searchsorted lowers to
    # ~17 rounds of random scalar gathers (~1 ms at this size) while sorts
    # are reliably fast on this stack (docs/PERFORMANCE.md).
    src = jnp.sort(
        jnp.where(is_last, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    )[:m_max]
    out_mask = src < n
    rows = totals[jnp.clip(src, 0, n - 1)]
    # per-voxel counts come free from boundary positions: segments are
    # contiguous in the sorted order, so count_j = src_j - src_{j-1}
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), src[:-1]])
    counts = jnp.where(out_mask, src - prev, 1).astype(points.dtype)
    out = rows / jnp.maximum(counts[:, None], 1.0)
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, n_vox


def voxel_accumulate_runs_cm(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """DENSE channel-major (4, n_cells) accumulator via the sort path:
    sort by cell key + Pallas segment totals + a SMALL one-hot densify
    matmul over the (<= n_cells) compacted runs.

    Rationale (xplane-trace measured): the direct one-hot MXU histogram
    pays ~N*n_cells MACs (~0.6 ms at 106k pts x 11k cells) because every
    point multiplies against the full grid.  Sorting first groups points
    into <= n_cells runs, so the densify matmul shrinks by ~10x and the
    total cost is sort + segsum + one small matmul.  All stages are
    deterministic primitives (lax.sort, the raster segsum kernel, bf16
    one-hot matmuls) — no scatter, no lowering lottery.

    Summation order is the sorted order (PCL's own accumulation order,
    ref cpp:452-456 via VoxelGrid), vs. block order for the direct kernel;
    both are f32-exact per product (bf16x3 splits)."""
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    gyz = gy * gz
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)

    ix, iy, iz = _quantize(points, leaf_xy, leaf_z)
    ix -= bx
    iy -= by
    iz -= bz
    in_bounds = (
        mask
        & (ix >= 0) & (ix < gx)
        & (iy >= 0) & (iy < gy)
        & (iz >= 0) & (iz < gz)
    )
    lin = ix + gx * (iy + gy * iz)
    keys = jnp.where(in_bounds, lin, n_cells).astype(jnp.int32)
    w = in_bounds.astype(jnp.float32)
    p32 = points.astype(jnp.float32)

    ks, xs, ys, zs = jax.lax.sort(
        (keys, p32[:, 0] * w, p32[:, 1] * w, p32[:, 2] * w),
        num_keys=1,
    )
    tx, ty, tz = segment_totals_raster(ks, xs, ys, zs, interpret=interpret)

    n = points.shape[0]
    m = -(-min(n, n_cells) // 128) * 128
    is_last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones(1, bool)]) & (ks < n_cells)
    src = jnp.sort(
        jnp.where(is_last, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    )[:m]
    run_ok = src < n
    srcc = jnp.clip(src, 0, n - 1)
    sums = jnp.stack([tx[srcc], ty[srcc], tz[srcc]], axis=1)  # (m, 3)
    keys_c = jnp.where(run_ok, ks[srcc], -1)
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), src[:-1]])
    counts = jnp.where(run_ok, src - prev, 0).astype(jnp.float32)

    # densify: factored one-hot matmul over the m compacted runs.  Channel
    # values are run SUMS (and counts up to N) — bf16x3 splits keep every
    # product f32-exact; one-hot selectors guarantee one term per output.
    kx = jnp.where(run_ok, keys_c % gx, -1)
    kyz = jnp.where(run_ok, keys_c // gx, -1)
    X = (kx[:, None] == jnp.arange(gx, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    Y = (kyz[:, None] == jnp.arange(gyz, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    cols = []
    for c in range(3):
        cols.extend(_split3(sums[:, c]))
    cols.extend(_split3(counts))
    XC = jnp.concatenate(
        [X * col[:, None].astype(jnp.bfloat16) for col in cols], axis=1
    )                                                   # (m, 12*gx)
    A = jax.lax.dot_general(
        Y, XC, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(gyz, 12, gx)
    sx = A[:, 0] + A[:, 1] + A[:, 2]
    sy = A[:, 3] + A[:, 4] + A[:, 5]
    sz = A[:, 6] + A[:, 7] + A[:, 8]
    cnt = A[:, 9] + A[:, 10] + A[:, 11]
    return jnp.stack([sx, sy, sz, cnt], axis=0).reshape(4, n_cells)


def _split3(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """f32 -> three bf16 summands, exact to f32 ulp (3x8 mantissa bits)."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    return h1, h2, r2.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Raster-layout variant: full lane utilization
# ---------------------------------------------------------------------------

_RB = 64  # raster rows per block (flat elements per block = _RB * 128)


def _segsum_raster_kernel(
    ks_ref, x_ref, y_ref, z_ref,
    ox_ref, oy_ref, oz_ref,
    ck, cx, cy, cz,
    rb: int,
):
    """Segmented prefix sums over row-major (R, 128) rasters of key-sorted
    data.  A flat shift by ``sh`` is a lane roll (+ previous-row fill) for
    sh < 128 and a row roll for multiples of 128; all resident in VMEM."""
    b = pl.program_id(0)
    lanes = 128
    ks = ks_ref[:]                       # (rb, 128) i32
    ch = [x_ref[:], y_ref[:], z_ref[:]]

    row_i = jax.lax.broadcasted_iota(jnp.int32, (rb, lanes), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rb, lanes), 1)
    flat_i = row_i * lanes + lane_i

    def shift(a, sh):
        if sh < lanes:
            rolled = pltpu.roll(a, sh, axis=1)
            prev = pltpu.roll(rolled, 1, axis=0)
            return jnp.where(lane_i >= sh, rolled, prev)
        return pltpu.roll(a, sh // lanes, axis=0)

    sh = 1
    total = rb * lanes
    while sh < total:
        ks_sh = shift(ks, sh)
        same = ((ks_sh == ks) & (flat_i >= sh)).astype(jnp.float32)
        ch = [c + shift(c, sh) * same for c in ch]
        sh *= 2

    # fold the previous block's trailing partial segment into rows whose key
    # matches the carried key (only the raster's first segment can match)
    carry = [cx, cy, cz]

    @pl.when(b > 0)
    def _():
        mask = (ks == ck[0]).astype(jnp.float32)
        for out_ref, c, cr in zip((ox_ref, oy_ref, oz_ref), ch, carry):
            out_ref[:] = c + mask * cr[0]

    @pl.when(b == 0)
    def _():
        for out_ref, c in zip((ox_ref, oy_ref, oz_ref), ch):
            out_ref[:] = c

    ck[0] = ks[rb - 1, lanes - 1]
    for cr, out_ref in zip(carry, (ox_ref, oy_ref, oz_ref)):
        cr[0] = out_ref[rb - 1, lanes - 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_totals_raster(
    ks: jax.Array,                       # (N,) int32, sorted ascending
    xs: jax.Array, ys: jax.Array, zs: jax.Array,  # (N,) f32
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-channel segmented prefix sums (row i = sum of its segment's prefix);
    the last row of each segment holds the segment total.  Full 128-lane
    utilization: inputs reshape to (N/128, 128) rasters for free."""
    n = ks.shape[0]
    lanes = 128
    if n % lanes != 0:
        raise ValueError(f"N must be a multiple of {lanes}, got {n}")
    r = n // lanes
    rb = min(_RB, r)
    if r % rb != 0:
        raise ValueError(f"N/128 must be a multiple of {rb}, got {r}")
    grid = r // rb
    shape2 = jax.ShapeDtypeStruct((r, lanes), jnp.float32)
    spec = pl.BlockSpec((rb, lanes), lambda b: (b, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_segsum_raster_kernel, rb=rb),
        grid=(grid,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape2] * 3,
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        interpret=interpret,
    )(
        ks.astype(jnp.int32).reshape(r, lanes),
        xs.astype(jnp.float32).reshape(r, lanes),
        ys.astype(jnp.float32).reshape(r, lanes),
        zs.astype(jnp.float32).reshape(r, lanes),
    )
    return tuple(o.reshape(n) for o in outs)
