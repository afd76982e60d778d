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
from typing import NamedTuple

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
    cent: jnp.ndarray,        # (3, n_cells) CHANNEL-MAJOR per-cell centroids
    dyn: jnp.ndarray,         # (n_cells,) cell holds a dynamic point
    dims: tuple[int, int, int],   # (gx, gy, gz)
    tol: float,
    leaf_xy: float,
    leaf_z: float,
    max_iters: int = 32,
    sweeps_per_iter: int = 6,
    jumps_per_iter: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Min-label connected components of the radius graph on the dense grid.

    Each iteration runs ``sweeps_per_iter`` stencil sweeps (each propagates
    labels one stencil radius) followed by ``jumps_per_iter`` pointer-jump
    rounds ``label = label[label]`` — the jump is a GATHER at the label, which
    on TPU is expressed as the factored one-hot matmul-gather (labels factor
    as ``lin = x + gx*yz``), i.e. one (cells, gx) x (gx, gyz) HIGHEST-precision
    product + a masked row reduce instead of 11k serialized scalar gathers.
    Jumping halves the remaining component depth per round, so convergence is
    O(log diameter) iterations instead of O(diameter / stencil radius).

    Returns (labels, n_sweeps, saturated): labels[i] = min flat cell index
    of i's component (n_cells for non-dynamic cells); ``saturated`` is
    nonzero iff the convergence loop exited at ``max_iters`` while labels
    were still changing (possible split clusters — surfaced rather than
    silent, ADVICE r2).  The pointer-jump rounds make convergence
    O(log diameter), so 32 iterations cover any grid this stack targets.
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
    c3 = [cent[k].reshape(gz, gy, gx) for k in range(3)]
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

    gyz = gy * gz
    iota_x = jnp.arange(gx, dtype=jnp.int32)

    def jump(labels):
        # label = label[label] via the factored one-hot matmul-gather
        lab = labels.reshape(n)
        valid = lab < n
        lx = jnp.where(valid, lab % gx, -1)
        lyz = jnp.where(valid, lab // gx, -1)
        lg = lab.reshape(gyz, gx).astype(jnp.float32)          # values < 2^24
        X = (lx[:, None] == iota_x[None, :]).astype(jnp.float32)
        t = jax.lax.dot_general(
            X, lg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                      # (cells, gyz)
        picked = jnp.sum(
            jnp.where(lyz[:, None] == jnp.arange(gyz, dtype=jnp.int32)[None, :], t, 0.0),
            axis=1,
        ).astype(jnp.int32)
        new = jnp.where(valid, picked, jnp.int32(n))
        return new.reshape(gz, gy, gx)

    def body(carry):
        labels, _, it = carry
        new = labels
        for _ in range(sweeps_per_iter):
            new = sweep(new)
        for _ in range(jumps_per_iter):
            new = jump(new)
        return new, jnp.any(new != labels), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    changed0 = jnp.any(labels0 >= 0)
    labels, changed, n_it = jax.lax.while_loop(
        cond, body, (labels0, changed0, jnp.int32(0))
    )
    saturated = (changed & (n_it >= max_iters)).astype(jnp.int32)
    return labels.reshape(n), n_it * sweeps_per_iter, saturated


def _excl_cumsum_2level(A: jnp.ndarray, gx: int) -> jnp.ndarray:
    """Exclusive cumsum of (n, k) along axis 0 via a two-level split:
    within gx-sized blocks + a block-prefix pass.  The flat log-shift
    cumsum over (n, k) was the single most expensive fusion in the step
    trace (322 us at n=11000, k=301); two-level cuts it to ~30 us, and the
    within-block level now runs as ONE batched strictly-lower-triangular
    MXU matmul instead of a log2(gx)-deep shift-add tree — the tree's ~13
    slice/pad passes over the (n/gx, gx, k) tensor were still the largest
    family in the residual small-op tail (~30 us/frame, round-3 trace).
    Exactness: f32 inputs here are 0/1 one-hot indicators, the triangular
    factor is 0/1 (both bf16-exact), and within-block sums are <= gx with
    f32 accumulation — every sum is exact.  The cross-block prefix carries
    values up to n, so it keeps the log-depth f32 scan (an f32 matmul
    would need HIGHEST precision for the same cost)."""
    n, k = A.shape
    b = n // gx
    Ar = A.reshape(b, gx, k)
    # contract: A is an f32 0/1 one-hot indicator (both call sites cast
    # explicitly, including in f64 oracle mode) — bf16 operands are exact
    lt = jnp.broadcast_to(
        jnp.tril(jnp.ones((gx, gx), jnp.bfloat16), -1), (b, gx, gx)
    )
    within = jax.lax.dot_general(
        lt,
        Ar.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # (b, gx, k)
    blocks = Ar.sum(axis=1)
    prefix = jax.lax.associative_scan(jnp.add, blocks, axis=0) - blocks
    return (within + prefix[:, None, :]).reshape(n, k)


class ClusterTable(NamedTuple):
    """Dense per-slot cluster output of the matmul postprocess."""

    mpts: jax.Array          # (C, P, 3) member points (cell centroids)
    member_mask: jax.Array   # (C, P)
    sizes: jax.Array         # (C,)
    cluster_valid: jax.Array # (C,)
    roots: jax.Array         # (C,) root cell index per slot
    n_clusters: jax.Array    # scalar — total size-valid components found
    n_iters: jax.Array       # scalar — stencil sweeps used


def cluster_table_grid(
    labels: jnp.ndarray,     # (n_cells,) min-cell-index labels (n_cells = invalid)
    n_iters: jnp.ndarray,
    cent: jnp.ndarray,       # (3, n_cells) CHANNEL-MAJOR
    dyn: jnp.ndarray,        # (n_cells,)
    gx: int,
    min_size: int,
    max_size: int,
    c_max: int,
    p_max: int,
) -> ClusterTable:
    """Size filter -> ordering -> (C, P, 3) member table, built ENTIRELY from
    one-hot matmuls and cumsums — no sort, no scatter, no gather.

    The sorted-path postprocess (`ops.cluster.cluster_postprocess`) pays one
    scatter-add (counts) and two full argsorts over the point set — ~0.5 ms at
    11k cells, and the sorts are this stack's residual compile-variance source
    (docs/PERFORMANCE.md).  Here every step is a deterministic MXU product:

      * component sizes: labels factor as ``lin = x + gx * yz``, so the
        histogram is a factored one-hot contraction ``(Y*dyn)^T @ X`` exactly
        like the voxel accumulator (0/1 bf16 operands, f32 accumulation);
      * per-cell size lookup: ``counts[lab] = rowsum(Y * (X @ counts^T))`` —
        a matmul-shaped gather;
      * cluster ordering (size desc, root index asc — PCL's order with the
        deterministic tie-break): rank(root) = #roots with larger size +
        #earlier roots of equal size, via a (cells, max_size+1) size one-hot,
        a suffix sum over the size histogram, and one exclusive cumsum;
      * the (C, P, 3) member table: output slot (c, p) is a DOUBLE one-hot
        contraction ``table[c,p] = sum_i cent_i * M[i,c] * Q[i,p]`` where
        M ranks the cell's cluster and Q its intra-cluster position
        (exclusive cumsum of M) — members land in ascending cell index order,
        the same order the sorted path produces.

    Semantics are identical to cluster_postprocess; outputs come as the dense
    (C, P, 3) table instead of the cluster-contiguous point array.
    """
    n = labels.shape[0]
    f32 = jnp.float32
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = dyn & (labels < n)
    lab_x = jnp.where(valid, labels % gx, -1)
    lab_yz = jnp.where(valid, labels // gx, -1)
    gyz = n // gx

    # component sizes on the (gyz, gx) grid: factored one-hot histogram
    X = (lab_x[:, None] == jnp.arange(gx, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    Y = (lab_yz[:, None] == jnp.arange(gyz, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        Y, X, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )                                                          # (gyz, gx)

    # per-cell component size: matmul-shaped gather of counts at the label.
    # HIGHEST precision: counts are integers up to n_cells — bf16 operand
    # truncation (DEFAULT) is only exact to 256
    t = jax.lax.dot_general(
        X.astype(f32), counts, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )                                                          # (cells, gyz)
    size_of = jnp.sum(t * Y.astype(f32), axis=1).astype(jnp.int32)

    keep = valid & (size_of >= min_size) & (size_of <= max_size)
    is_root = keep & (labels == idx)
    n_clusters = is_root.sum().astype(jnp.int32)

    # rank roots by (size desc, index asc): pack both criteria into ONE
    # integer key, size * P - idx (P = next pow2 >= n, so distinct cells
    # give distinct keys and the idx tie-break orders ascending), and take
    # jax.lax.top_k(keys, c_max).  This replaces the counting-rank chain —
    # a (cells, max_size+1) one-hot, a size histogram + suffix sum, and a
    # two-level exclusive cumsum over (cells, s_bins) — whose fusions were
    # the largest cluster-table block in the step trace (~25 us/cloud at
    # bench shapes, docs/PERFORMANCE.md round 4); top_k over one (cells,)
    # i32 vector is cheaper than materializing any of them, and the slot
    # data (roots, sizes, validity) falls straight out of the top entries.
    pw = 1 << (n - 1).bit_length()
    if max_size * pw + n >= 2**31:
        raise ValueError(
            f"rank key overflow: max_cluster_size={max_size} with "
            f"{n} grid cells exceeds int32 packing"
        )
    keys = jnp.where(is_root, size_of * pw - idx, -1)
    topv, topi = jax.lax.top_k(keys, c_max)
    cluster_valid = topv >= 0
    roots = jnp.where(cluster_valid, topi.astype(jnp.int32), 0)
    sizes = jnp.where(cluster_valid, (topv + pw - 1) // pw, 0).astype(jnp.int32)

    # per-cell rank+1 (0 = unslotted): cells compare against the c_max root
    # ids — a (cells, c_max) one-hot instead of the rank cumsum machinery
    slot_of = jnp.where(
        (idx[:, None] == roots[None, :]) & cluster_valid[None, :],
        jnp.arange(1, c_max + 1, dtype=jnp.int32)[None, :],
        0,
    ).sum(axis=1)

    # broadcast each root's rank to its members: rank grid built by the same
    # factored contraction (roots' own cell == their label), then the
    # matmul-shaped gather at every cell's label
    Yr = Y * slot_of.astype(jnp.bfloat16)[:, None]
    rank_grid = jax.lax.dot_general(
        Yr, X, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )                                                          # (gyz, gx)
    tr = jax.lax.dot_general(
        X, rank_grid, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    point_rank = jnp.sum(tr * Y.astype(f32), axis=1).astype(jnp.int32) - 1
    member = keep & (point_rank >= 0)
    point_rank = jnp.where(member, point_rank, c_max)

    # intra-cluster position: exclusive cumsum of the slot one-hot — members
    # appear in ascending cell index, matching the sorted path
    M = (
        (point_rank[:, None] == jnp.arange(c_max, dtype=jnp.int32)[None, :])
        & member[:, None]
    ).astype(f32)
    pos = jnp.sum(_excl_cumsum_2level(M, gx) * M, axis=1).astype(jnp.int32)
    Q = (
        (jnp.where(member, pos, -1)[:, None] == jnp.arange(p_max, dtype=jnp.int32)[None, :])
    ).astype(jnp.bfloat16)

    # (C, P) membership and (C, P, 3) member points: double one-hot
    # contractions; centroid channels stay f32-exact via HIGHEST precision
    Mb = M.astype(jnp.bfloat16)
    member_mask = (
        jax.lax.dot_general(
            Mb, Q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        > 0
    )
    # value-carrying contraction runs in the centroid dtype at HIGHEST
    # precision: with one-hot selectors each output has exactly one nonzero
    # term, so member points come out bit-identical to cent.  All 3 channels
    # ride ONE dot with the channel stacked into the output rows (3 separate
    # dots measured 76 us of launch/fusion overhead vs ~15 for the batch)
    vdt = cent.dtype
    Mc3 = jnp.concatenate(
        [(M.astype(vdt) * cent[ch][:, None]) for ch in range(3)], axis=1
    )                                                          # (n, 3*C)
    flat = jax.lax.dot_general(
        Mc3, Q.astype(vdt), (((0,), (0,)), ((), ())),
        preferred_element_type=vdt,
        precision=jax.lax.Precision.HIGHEST,
    )                                                          # (3*C, P)
    mpts = jnp.moveaxis(flat.reshape(3, c_max, p_max), 0, -1)  # (C, P, 3)

    return ClusterTable(
        mpts=mpts,
        member_mask=member_mask & cluster_valid[:, None],
        sizes=sizes,
        cluster_valid=cluster_valid,
        roots=roots,
        n_clusters=n_clusters,
        n_iters=n_iters,
    )


def euclidean_cluster_grid(
    cent: jnp.ndarray,       # (3, n_cells) CHANNEL-MAJOR
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
    jumps_per_iter: int = 2,
) -> Clusters:
    """Full PCL-semantics clustering on the dense grid (labels via stencil
    propagation, then the shared size-filter/ordering/member postprocess).
    Zero capacity truncation at the clustering stage: every dynamic cell
    participates, however dense the scene."""
    labels, n_iters, _ = connected_components_grid(
        cent, dyn, dims, tol, leaf_xy, leaf_z, max_iters, sweeps_per_iter,
        jumps_per_iter,
    )
    return cluster_postprocess(
        labels, n_iters, cent.T, dyn, min_size, max_size, c_max, p_max
    )
