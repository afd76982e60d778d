"""Euclidean clustering on the dense voxel grid: stencil label propagation.

Scales past the all-pairs wall (VERDICT r1: ops/cluster.py is O(M^2) with a
capped point list).  After voxel downsampling every occupied cell holds
EXACTLY ONE candidate point (its centroid), so clustering the dynamic points
is connected components on the cell grid — and two centroids within
``tol`` can only live in cells at most ``floor(tol/leaf)+1`` apart per axis
(cells d apart are separated by at least (d-1)*leaf).  The radius graph is
therefore a STATIC STENCIL on the dense (gz, gy, gx) grid:

  * adjacency per stencil offset is one shifted compare of the centroid
    grids (pad + static slice — no gathers, no pairwise matrix);
  * label propagation takes the min label over adjacent stencil neighbors;
    each sweep costs n_cells x n_offsets VPU ops REGARDLESS of how many
    points are dynamic — a fully dense scene costs the same as a sparse one,
    and there is no m_max_dynamic truncation at all;
  * sweeps run unrolled in blocks inside a convergence `while_loop`
    (sequential iterations cost ~10 us each on TPU, so the trip count is
    minimized, not the per-sweep work).

Semantics match PCL EuclideanClusterExtraction (ref cpp:471-488) exactly as
ops/cluster.py does: same point set (voxel centroids), same dist <= tol
test, and the same min-index labels — a cell's flat index is its rank in
PCL's ascending-voxel output order, so min-cell-index == min-point-index.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.ops.cluster import Clusters, cluster_postprocess


def _stencil_offsets(tol: float, leaf_xy: float, leaf_z: float) -> list[tuple[int, int, int]]:
    """All (dz, dy, dx) cell offsets that can hold a centroid within tol."""
    rx = int(math.floor(tol / leaf_xy)) + 1
    rz = int(math.floor(tol / leaf_z)) + 1
    out = []
    for dz in range(-rz, rz + 1):
        for dy in range(-rx, rx + 1):
            for dx in range(-rx, rx + 1):
                if dz == 0 and dy == 0 and dx == 0:
                    continue
                # prune offsets whose MINIMUM possible centroid distance
                # already exceeds tol: cells d apart have gap >= (|d|-1)*leaf
                min_d2 = (
                    (max(abs(dx) - 1, 0) * leaf_xy) ** 2
                    + (max(abs(dy) - 1, 0) * leaf_xy) ** 2
                    + (max(abs(dz) - 1, 0) * leaf_z) ** 2
                )
                if min_d2 <= tol * tol:
                    out.append((dz, dy, dx))
    return out


def connected_components_grid(
    cent: jnp.ndarray,        # (n_cells, 3) per-cell centroids (dense layout)
    dyn: jnp.ndarray,         # (n_cells,) cell holds a dynamic point
    dims: tuple[int, int, int],   # (gx, gy, gz)
    tol: float,
    leaf_xy: float,
    leaf_z: float,
    max_iters: int = 32,
    sweeps_per_iter: int = 6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Min-label connected components of the radius graph on the dense grid.

    Returns (labels, n_sweeps): labels[i] = min flat cell index of i's
    component (n_cells for non-dynamic cells).
    """
    gx, gy, gz = dims
    n = gx * gy * gz
    offsets = _stencil_offsets(tol, leaf_xy, leaf_z)
    rz = max(abs(o[0]) for o in offsets)
    ry = max(abs(o[1]) for o in offsets)
    rx = max(abs(o[2]) for o in offsets)
    sentinel = jnp.int32(n)
    tol2 = jnp.asarray(tol * tol, cent.dtype)

    # dense (gz, gy, gx) views; flat index = ix + gx*(iy + gy*iz)
    c3 = [cent[:, k].reshape(gz, gy, gx) for k in range(3)]
    d3 = dyn.reshape(gz, gy, gx)

    def pad3(a, fill):
        return jnp.pad(
            a, ((rz, rz), (ry, ry), (rx, rx)), constant_values=fill
        )

    def shifted(a_pad, dz, dy, dx):
        return jax.lax.slice(
            a_pad,
            (rz + dz, ry + dy, rx + dx),
            (rz + dz + gz, ry + dy + gy, rx + dx + gx),
        )

    # adjacency per offset, computed once (does not change across sweeps)
    big = jnp.asarray(1e9, cent.dtype)
    cp = [pad3(c, big) for c in c3]
    dp = pad3(d3, False)
    adj = []
    for dz, dy, dx in offsets:
        d2 = sum(
            (c - shifted(p, dz, dy, dx)) ** 2 for c, p in zip(c3, cp)
        )
        adj.append(d3 & shifted(dp, dz, dy, dx) & (d2 <= tol2))
    adj_stack = jnp.stack(adj)                          # (n_off, gz, gy, gx)

    lin3 = jnp.arange(n, dtype=jnp.int32).reshape(gz, gy, gx)
    labels0 = jnp.where(d3, lin3, sentinel)

    def sweep(labels):
        lp = pad3(labels, sentinel)
        stack = jnp.stack([shifted(lp, *o) for o in offsets])
        nmin = jnp.min(jnp.where(adj_stack, stack, sentinel), axis=0)
        return jnp.minimum(labels, nmin)

    def body(carry):
        labels, _, it = carry
        new = labels
        for _ in range(sweeps_per_iter):
            new = sweep(new)
        return new, jnp.any(new != labels), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    changed0 = jnp.any(labels0 >= 0)
    labels, _, n_it = jax.lax.while_loop(cond, body, (labels0, changed0, jnp.int32(0)))
    return labels.reshape(n), n_it * sweeps_per_iter


def euclidean_cluster_grid(
    cent: jnp.ndarray,
    dyn: jnp.ndarray,
    dims: tuple[int, int, int],
    tol: float,
    leaf_xy: float,
    leaf_z: float,
    min_size: int,
    max_size: int,
    c_max: int,
    p_max: int,
    max_iters: int = 32,
    sweeps_per_iter: int = 6,
) -> Clusters:
    """Full PCL-semantics clustering on the dense grid (labels via stencil
    propagation, then the shared size-filter/ordering/member postprocess).
    Zero capacity truncation at the clustering stage: every dynamic cell
    participates, however dense the scene."""
    labels, n_iters = connected_components_grid(
        cent, dyn, dims, tol, leaf_xy, leaf_z, max_iters, sweeps_per_iter
    )
    return cluster_postprocess(
        labels, n_iters, cent, dyn, min_size, max_size, c_max, p_max
    )
