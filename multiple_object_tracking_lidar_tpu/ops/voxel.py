"""Voxel-grid downsampling (PCL VoxelGrid semantics, TPU layout).

Reference behavior (ref: src/multiple_object_tracking_lidar.cpp:452-456 with
PCL VoxelGrid): voxel index = floor(p/leaf) per axis, leaf = (V, V, 20V) — the
20x z-leaf effectively flattens to 2.5-D; the output point is the CENTROID of
the member points of each voxel, emitted in ascending linearized-voxel-index
order (x-fastest, then y, then z).

TPU design: voxel boundaries sit at absolute multiples of the leaf, so the
partition is data-independent.  Two interchangeable implementations:

* ``voxel_downsample_dense`` — scatter-add points into a dense (GX*GY*GZ, 4)
  accumulator over fixed scene bounds, then cumsum-compact occupied cells.
  No sorts anywhere; the fast path for bounded scenes (maps).

* ``voxel_downsample_sort`` — lexicographic sort of quantized coords +
  segment reduction.  Handles unbounded scenes (raw Velodyne) at the cost of
  an O(N log^2 N) on-device sort.

Both emit identical results (same ordering) for in-bounds data.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.config import SceneBounds


def grid_shape(scene: SceneBounds, leaf_xy: float, leaf_z: float) -> tuple[int, int, int]:
    """Static dense-grid dims covering the scene with floor(p/leaf) indexing."""
    gx = int(math.floor(scene.x_max / leaf_xy) - math.floor(scene.x_min / leaf_xy)) + 1
    gy = int(math.floor(scene.y_max / leaf_xy) - math.floor(scene.y_min / leaf_xy)) + 1
    gz = int(math.floor(scene.z_max / leaf_z) - math.floor(scene.z_min / leaf_z)) + 1
    return gx, gy, gz


def _quantize(points, leaf_xy, leaf_z):
    # Quantization is ALWAYS f32 multiply-by-inverse + floor: PCL computes
    # voxel indices in float with a precomputed inverse leaf, and the C++
    # reference is float throughout — boundary behavior must not depend on
    # the pipeline's compute dtype.
    p32 = points.astype(jnp.float32)
    inv_xy = jnp.float32(1.0 / leaf_xy)
    inv_z = jnp.float32(1.0 / leaf_z)
    ix = jnp.floor(p32[:, 0] * inv_xy).astype(jnp.int32)
    iy = jnp.floor(p32[:, 1] * inv_xy).astype(jnp.int32)
    iz = jnp.floor(p32[:, 2] * inv_z).astype(jnp.int32)
    return ix, iy, iz


def voxel_accumulate(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
) -> jnp.ndarray:
    """Scatter-add points into the dense (n_cells, 4) [sum_xyz, count]
    accumulator.  Additive — partial accumulators from point shards on
    different devices combine with one `psum` (see parallel/sharding.py)."""
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
    lin = ix + gx * (iy + gy * iz)            # ascending == PCL output order

    # TPU scatter serializes on repeated-address runs (measured up to ~300x
    # slower than decorrelated updates).  The padded/invalid tail — tens of
    # thousands of points — must NOT share one dump slot: spread the dump
    # region by point index so consecutive invalid updates hit distinct
    # addresses (6-50x measured speedup on realistic frames).
    dump = 4096
    n = points.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    lin2 = jnp.where(in_bounds, lin, n_cells + (i & (dump - 1)))

    w = in_bounds.astype(points.dtype)
    vals = jnp.concatenate([points * w[:, None], w[:, None]], axis=1)  # (N,4)
    acc = jnp.zeros((n_cells + dump, 4), dtype=points.dtype)
    acc = acc.at[lin2].add(vals, mode="drop")
    return acc[:n_cells]


def voxel_finalize(
    acc: jnp.ndarray, m_max: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense accumulator -> compacted (m_max, 3) voxel centroids."""
    n_cells = acc.shape[0]
    occupied = acc[:, 3] > 0
    centroids_full = acc[:, :3] / jnp.maximum(acc[:, 3:4], 1.0)

    # cumsum-compact occupied cells, order preserved (= ascending lin)
    pos = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    n_vox = jnp.where(n_cells > 0, pos[-1] + 1, 0)
    slot = jnp.where(occupied & (pos < m_max), pos, m_max)
    out = jnp.zeros((m_max + 1, 3), dtype=acc.dtype).at[slot].set(centroids_full, mode="drop")
    out_mask = jnp.zeros(m_max + 1, dtype=bool).at[slot].set(occupied, mode="drop")
    return out[:m_max], out_mask[:m_max], n_vox


def voxel_downsample_dense(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    m_max: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense-grid voxel centroid downsample (accumulate + finalize)."""
    return voxel_finalize(voxel_accumulate(points, mask, scene, leaf_xy, leaf_z), m_max)


def voxel_downsample_scan(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    m_max: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter-free voxel centroid downsample (same semantics/ordering as the
    dense path): co-sort points by linearized cell, segmented Hillis-Steele
    prefix sums (the last row of each segment holds the segment total), then
    gather-only compaction via cumsum+searchsorted.

    Exists because XLA's scatter compilation is nondeterministically slow on
    this TPU stack (docs/PERFORMANCE.md); every primitive here — sort, shift,
    cumsum, searchsorted, gather — measures stably.  Select with
    ``TrackerConfig(voxel_mode="scan")``.
    """
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

    w = in_bounds.astype(points.dtype)
    ks, xs, ys, zs, ws = jax.lax.sort(
        (keys, points[:, 0] * w, points[:, 1] * w, points[:, 2] * w, w),
        num_keys=1,
    )
    vals = jnp.stack([xs, ys, zs, ws], axis=1)          # (N, 4), sorted by cell

    # segmented prefix sums: after all log2(N) passes, each row holds the sum
    # of its segment's prefix, so the LAST row of a segment = segment total
    n = points.shape[0]
    sh = 1
    while sh < n:
        same = jnp.concatenate([jnp.zeros(sh, bool), ks[sh:] == ks[:-sh]])
        shifted = jnp.concatenate(
            [jnp.zeros((sh, 4), vals.dtype), vals[:-sh]], axis=0
        )
        vals = vals + jnp.where(same[:, None], shifted, 0.0)
        sh *= 2

    is_last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones(1, bool)]) & (ks < n_cells)
    c = jnp.cumsum(is_last.astype(jnp.int32))
    n_vox = c[-1]
    j = jnp.arange(m_max, dtype=jnp.int32)
    src = jnp.clip(jnp.searchsorted(c, j + 1), 0, n - 1)
    rows = vals[src]
    out_mask = j < n_vox
    out = rows[:, :3] / jnp.maximum(rows[:, 3:4], 1.0)
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, n_vox


def voxel_downsample_sort(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    leaf_xy: float,
    leaf_z: float,
    m_max: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-based voxel centroid downsample for unbounded scenes.

    Orders output by (iz, iy, ix) ascending — the same ordering the dense
    path and PCL produce.
    """
    n = points.shape[0]
    ix, iy, iz = _quantize(points, leaf_xy, leaf_z)
    # lexsort: primary iz, then iy, then ix; invalid rows to the end
    big = jnp.int32(2**30)
    izk = jnp.where(mask, iz, big)
    perm = jnp.lexsort((ix, iy, izk))
    ixs, iys, izs = ix[perm], iy[perm], iz[perm]
    ps = points[perm]
    ms = mask[perm]

    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (ixs[1:] != ixs[:-1]) | (iys[1:] != iys[:-1]) | (izs[1:] != izs[:-1]),
        ]
    )
    new_seg = new_seg & ms
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1        # per sorted row
    seg_id = jnp.where(ms, seg_id, n)                          # dump invalid

    w = ms.astype(points.dtype)
    vals = jnp.concatenate([ps * w[:, None], w[:, None]], axis=1)
    acc = jnp.zeros((m_max + 1, 4), dtype=points.dtype)
    acc = acc.at[jnp.minimum(seg_id, m_max)].add(
        jnp.where((seg_id < m_max)[:, None], vals, 0.0)
    )
    counts = acc[:m_max, 3]
    out = acc[:m_max, :3] / jnp.maximum(counts[:, None], 1.0)
    out_mask = counts > 0
    n_vox = jnp.where(ms.any(), seg_id.max(initial=-1, where=ms) + 1, 0)
    return out, out_mask, n_vox
