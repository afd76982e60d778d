"""Euclidean clustering: fixed-radius connected components on TPU.

Reference behavior (ref: src/multiple_object_tracking_lidar.cpp:471-488):
PCL KdTree + EuclideanClusterExtraction(tolerance, min/max size) — i.e. the
connected components of the "pairwise distance <= tolerance" graph, size-
filtered, with clusters returned LARGEST-FIRST (PCL sorts cluster_indices by
size descending after extraction).  The author marks this the runtime hot
spot (cpp:488).

TPU design (no KdTree — trees are hostile to the MXU/VPU):
  1. Pairwise squared distances of the (compacted, fixed-size) dynamic point
     set via one MXU matmul: ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b.
  2. Connected components by min-label propagation over the adjacency with
     pointer jumping (label doubling): per sweep, every point takes the min
     label over its neighbors, then labels chase their representative
     ``labels[labels]`` a few times — O(log diameter) sweeps instead of
     O(diameter).
  3. Size filter + deterministic ordering (size desc, root index asc — PCL's
     order up to its unstable tie-break).
  4. Member-table construction for downstream per-cluster feature extraction.

Everything is static-shape; the `while_loop` trip count is data-dependent but
bounded by ``max_iters`` (convergence is detected to exit early).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Clusters(NamedTuple):
    labels: jax.Array        # (M,) root point index per point; M = invalid
    counts: jax.Array        # (M,) component size per root (0 elsewhere)
    keep: jax.Array          # (M,) point belongs to a size-valid cluster
    roots: jax.Array         # (C,) root index per cluster, ordered
    cluster_valid: jax.Array # (C,)
    sizes: jax.Array         # (C,) points per cluster
    members: jax.Array       # (C, P) point indices (into the M point array)
    member_mask: jax.Array   # (C, P)
    sorted_pts: jax.Array    # (M + P, 3) points permuted to (cluster, index)
                             # order, zero-padded; cluster c's members are the
                             # contiguous rows [starts[c], starts[c]+sizes[c])
    starts: jax.Array        # (C,) row offsets into sorted_pts
    n_clusters: jax.Array    # scalar
    n_iters: jax.Array       # scalar — label-prop sweeps used


def _pairwise_adjacency(pts: jnp.ndarray, mask: jnp.ndarray, tol: float) -> jnp.ndarray:
    """(M, M) bool adjacency: dist^2 <= tol^2, both valid. MXU-driven."""
    # center to keep ||p||^2 small -> tight f32 error near the tol boundary
    denom = jnp.maximum(mask.sum(), 1)
    c = (pts * mask[:, None]).sum(0) / denom
    p = jnp.where(mask[:, None], pts - c, 0.0)
    sq = (p * p).sum(axis=1)
    # HIGHEST precision: the boundary test d2 <= tol^2 must be true f32 math,
    # not the default bf16 MXU passes (exactness to ~1 ulp of f32 here).
    gram = jax.lax.dot_general(
        p,
        p,
        (((1,), (1,)), ((), ())),
        preferred_element_type=p.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    adj = d2 <= jnp.asarray(tol * tol, p.dtype)
    return adj & mask[:, None] & mask[None, :]


def connected_components(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    tol: float,
    max_iters: int = 32,
    pointer_jumps: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Min-label connected components of the radius graph.

    Returns (labels, n_iters): labels[i] = min point index in i's component
    (M for invalid points).
    """
    m = pts.shape[0]
    adj = _pairwise_adjacency(pts, mask, tol)
    sentinel = jnp.int32(m)
    init_labels = jnp.where(mask, jnp.arange(m, dtype=jnp.int32), sentinel)

    def body(carry):
        labels, _, it = carry
        # min neighbor label (adjacency includes self)
        nmin = jnp.min(jnp.where(adj, labels[None, :], sentinel), axis=1)
        new = jnp.minimum(labels, nmin)
        # pointer jumping: chase representatives
        padded = jnp.concatenate([new, jnp.array([sentinel], jnp.int32)])
        for _ in range(pointer_jumps):
            new = jnp.where(mask, padded[new], sentinel)
            padded = jnp.concatenate([new, jnp.array([sentinel], jnp.int32)])
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    # derive the initial `changed` flag from data so its sharding/varying
    # type matches the body output under shard_map (always True in value)
    changed0 = jnp.any(init_labels >= 0)
    labels, _, n_iters = jax.lax.while_loop(
        cond, body, (init_labels, changed0, jnp.int32(0))
    )
    return labels, n_iters


def euclidean_cluster(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    tol: float,
    min_size: int,
    max_size: int,
    c_max: int,
    p_max: int,
    max_iters: int = 32,
    pointer_jumps: int = 4,
    backend: str = "jnp",
) -> Clusters:
    """Full PCL-semantics clustering: components -> size filter -> ordering ->
    member table.  All shapes static: (M,) points in, (C, P) members out.
    ``backend="pallas"`` runs the connected-components core as the fused VMEM
    kernel (ops/cluster_pallas.py) instead of HBM-level jnp ops."""
    m = pts.shape[0]
    if backend == "pallas":
        from multiple_object_tracking_lidar_tpu.ops.cluster_pallas import (
            connected_components_pallas,
        )

        interpret = jax.default_backend() != "tpu"
        labels = connected_components_pallas(
            pts, mask, tol, n_sweeps=8 * max_iters, interpret=interpret
        )
        n_iters = jnp.int32(-1)  # not reported by the kernel
    else:
        labels, n_iters = connected_components(pts, mask, tol, max_iters, pointer_jumps)

    return cluster_postprocess(
        labels, n_iters, pts, mask, min_size, max_size, c_max, p_max
    )


def cluster_postprocess(
    labels: jnp.ndarray,
    n_iters: jnp.ndarray,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    min_size: int,
    max_size: int,
    c_max: int,
    p_max: int,
) -> Clusters:
    """Size filter -> deterministic ordering -> member table -> contiguous
    per-cluster point layout.  Shared by the all-pairs (point list) and the
    dense-grid (stencil) connected-components front-ends; ``labels[i]`` is the
    min point/cell index of i's component (len(labels) for invalid)."""
    m = pts.shape[0]
    # component sizes at the root slot
    counts = jnp.zeros(m + 1, dtype=jnp.int32).at[labels].add(
        mask.astype(jnp.int32), mode="drop"
    )[:m]
    size_of = counts[jnp.minimum(labels, m - 1)]
    keep = mask & (size_of >= min_size) & (size_of <= max_size)

    # roots of size-valid clusters
    idx = jnp.arange(m, dtype=jnp.int32)
    is_root = keep & (labels == idx)
    # order: size descending, then root index ascending (deterministic
    # stand-in for PCL's unstable size sort)
    order_key = jnp.where(is_root, -counts * (m + 1) + idx, jnp.int32(2**30))
    order = jnp.argsort(order_key)
    roots = order[:c_max].astype(jnp.int32)
    cluster_valid = is_root[roots]
    sizes = jnp.where(cluster_valid, counts[roots], 0)
    n_clusters = is_root.sum()

    # rank per point: which output cluster its component maps to
    rank_of_root = jnp.full(m + 1, c_max, dtype=jnp.int32)
    rank_of_root = rank_of_root.at[jnp.where(cluster_valid, roots, m)].set(
        jnp.arange(c_max, dtype=jnp.int32), mode="drop"
    )
    point_rank = jnp.where(keep, rank_of_root[jnp.minimum(labels, m)], c_max)

    # member table: points sorted by (rank, index) then split at offsets
    sort_key = point_rank * m + idx
    perm = jnp.argsort(sort_key).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)[:-1]])
    gather_idx = starts[:, None] + jnp.arange(p_max, dtype=jnp.int32)[None, :]
    member_mask = (
        jnp.arange(p_max, dtype=jnp.int32)[None, :] < sizes[:, None]
    ) & cluster_valid[:, None]
    members = jnp.where(
        member_mask, perm[jnp.clip(gather_idx, 0, m - 1)], 0
    ).astype(jnp.int32)

    # contiguous member layout: one (M,3) row gather; downstream per-cluster
    # access becomes dynamic slices instead of (C*P) random scalar gathers
    # (the member table above is kept for the API and is dead-code-eliminated
    # by XLA when unused)
    sorted_pts = jnp.concatenate(
        [pts[perm], jnp.zeros((p_max, 3), pts.dtype)], axis=0
    )

    return Clusters(
        labels=labels,
        counts=counts,
        keep=keep,
        roots=roots,
        cluster_valid=cluster_valid,
        sizes=sizes,
        members=members,
        member_mask=member_mask,
        sorted_pts=sorted_pts,
        starts=starts.astype(jnp.int32),
        n_clusters=n_clusters,
        n_iters=n_iters,
    )
