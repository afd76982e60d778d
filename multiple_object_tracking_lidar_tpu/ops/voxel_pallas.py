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

    ks, xs, ys, zs, ws = jax.lax.sort(
        (keys, points[:, 0] * w, points[:, 1] * w, points[:, 2] * w, w),
        num_keys=1,
    )
    vals = jnp.stack([xs, ys, zs, ws], axis=1)
    totals = segment_totals_pallas(ks, vals, interpret=interpret)

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
    out = rows[:, :3] / jnp.maximum(rows[:, 3:4], 1.0)
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, n_vox
