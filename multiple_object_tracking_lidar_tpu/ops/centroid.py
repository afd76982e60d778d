"""Per-cluster "centroid" feature: circumcenter of the farthest-pair arc.

Reference behavior (ref: getCentroid, src/multiple_object_tracking_lidar.cpp:708-822):
per cluster (1) find the farthest point pair (Pi, Pj) by 3-D distance with an
O(n^2) scan (cpp:731-759), (2) find the point Pk farthest from the PiPj line
in the XY plane (cpp:763-784; points value-equal to Pi or Pj are skipped),
(3) return the circumcenter of (Pi, Pj, Pk) via the determinant formula
(cpp:787-809) with fallback to Pi when collinear (G == 0); z = 0 and the
frame timestamp is stored in the intensity channel (cpp:801, 808).

TPU design: the O(n^2) pair search becomes a masked pairwise-distance matmul
(MXU) over the fixed-size member table, vmapped per cluster and chunked with
`lax.map` to bound transient memory at (chunk, P, P).  Tie-breaking follows
the reference: its scans keep the FIRST strict maximum in (i, j) lexicographic
order, which is exactly `argmax`'s first-occurrence rule over the row-major
flattened distance matrix.

The line distance uses the mathematically identical cross-product form
|((Pj-Pi) x (P3-Pi))_z| / ||Pj-Pi||_xy instead of the reference's
slope-intercept form (cpp:753-755, 774), which is UB for vertical lines
(division by zero at cpp:753); for non-degenerate inputs they agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_cluster(mp: jnp.ndarray, mm: jnp.ndarray) -> jnp.ndarray:
    """mp: (P, 3) member points, mm: (P,) mask -> (2,) circumcenter xy."""
    p = mp.shape[0]
    # --- 1. farthest pair by 3-D distance (cpp:731-759) ---
    # centered gram trick on the MXU (HIGHEST precision = true f32): the
    # elementwise (P, P, 3) diff tensor would be 3x the bytes for no FLOP win
    c = jnp.where(mm.any(), (mp * mm[:, None]).sum(0) / jnp.maximum(mm.sum(), 1), 0.0)
    pc = jnp.where(mm[:, None], mp - c, 0.0)
    sq = (pc * pc).sum(-1)
    gram = jax.lax.dot_general(
        pc, pc, (((1,), (1,)), ((), ())),
        preferred_element_type=pc.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    iu = jnp.arange(p)
    pair_mask = mm[:, None] & mm[None, :] & (iu[:, None] < iu[None, :])
    d2m = jnp.where(pair_mask, d2, -1.0)
    # first max in (i, j) lexicographic order, via row-wise reduction (the
    # flattened-argmax form forces a (P, P) transpose copy on TPU):
    # argmax picks the FIRST max along each axis, so (first max row, first
    # max col within it) == first lexicographic (i, j) — the reference's
    # strict-> update rule (cpp:749)
    row_max = jnp.max(d2m, axis=1)
    row_arg = jnp.argmax(d2m, axis=1)
    i_star = jnp.argmax(row_max)
    j_star = row_arg[i_star]
    pi = mp[i_star]
    pj = mp[j_star]

    # --- 2. farthest point from the PiPj line in XY (cpp:763-784) ---
    ex = pj[0] - pi[0]
    ey = pj[1] - pi[1]
    cross = jnp.abs(ex * (mp[:, 1] - pi[1]) - ey * (mp[:, 0] - pi[0]))
    norm = jnp.sqrt(ex * ex + ey * ey)
    line_d = cross / jnp.maximum(norm, jnp.asarray(1e-30, mp.dtype))
    eq_i = jnp.all(mp == pi, axis=1)
    eq_j = jnp.all(mp == pj, axis=1)
    k_mask = mm & ~eq_i & ~eq_j
    k_star = jnp.argmax(jnp.where(k_mask, line_d, -1.0))
    pk = mp[k_star]

    # --- 3. circumcenter determinant formula (cpp:787-809) ---
    a = pj[0] - pi[0]
    b = pj[1] - pi[1]
    c = pk[0] - pi[0]
    d = pk[1] - pi[1]
    e = a * (pi[0] + pj[0]) + b * (pi[1] + pj[1])
    f = c * (pi[0] + pk[0]) + d * (pi[1] + pk[1])
    g = 2.0 * (a * (pk[1] - pj[1]) - b * (pk[0] - pj[0]))
    collinear = g == 0.0
    g_safe = jnp.where(collinear, 1.0, g)
    cx = jnp.where(collinear, pi[0], (d * e - b * f) / g_safe)
    cy = jnp.where(collinear, pi[1], (a * f - c * e) / g_safe)
    return jnp.stack([cx, cy])


def circumcenter_features(
    pts: jnp.ndarray,
    members: jnp.ndarray,
    member_mask: jnp.ndarray,
    cluster_valid: jnp.ndarray,
    t: jnp.ndarray,
    chunk: int = 0,
) -> jnp.ndarray:
    """Compute per-cluster centroids.

    Args:
      pts: (M, 3) compacted dynamic points.
      members: (C, P) member indices, member_mask: (C, P).
      cluster_valid: (C,), t: scalar frame time (seconds since time_init).
    Returns:
      (C, 4) [x, y, 0, t] detections (garbage rows where ~cluster_valid).
    """
    c, p = members.shape
    mpts = pts[members]  # (C, P, 3)
    if chunk <= 0 or c % chunk != 0:
        # single fused vmap: XLA streams the (C, P, P) distance tensor through
        # the reductions; no sequential chunk loop
        xy = jax.vmap(_one_cluster)(mpts, member_mask)
    else:
        mp_r = mpts.reshape(c // chunk, chunk, p, 3)
        mm_r = member_mask.reshape(c // chunk, chunk, p)
        xy = jax.lax.map(
            lambda ab: jax.vmap(_one_cluster)(ab[0], ab[1]), (mp_r, mm_r)
        ).reshape(c, 2)
    zeros = jnp.zeros((c, 1), dtype=pts.dtype)
    tcol = jnp.full((c, 1), t, dtype=pts.dtype)
    return jnp.concatenate([xy, zeros, tcol], axis=1)


def circumcenter_features_table(
    mpts: jnp.ndarray,         # (C, P, 3) member points (dense table)
    member_mask: jnp.ndarray,  # (C, P)
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Same feature, but members arrive as the dense (C, P, 3) table the
    matmul postprocess (ops.cluster_grid.cluster_table_grid) emits — no
    member gather or slice at all."""
    c = mpts.shape[0]
    xy = jax.vmap(_one_cluster)(mpts, member_mask)
    zeros = jnp.zeros((c, 1), dtype=mpts.dtype)
    tcol = jnp.full((c, 1), t, dtype=mpts.dtype)
    return jnp.concatenate([xy, zeros, tcol], axis=1)


def circumcenter_from_pair_stats(
    cm: jnp.ndarray,           # (C, P) colmax: max_i d2m[i, j] per column
    fr: jnp.ndarray,           # (C, P) firstrow: min row achieving colmax
    mpts: jnp.ndarray,         # (C, P, 3) member points
    member_mask: jnp.ndarray,  # (C, P)
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Circumcenter features from precomputed farthest-pair column stats
    (ops.centroid_pallas.pair_stats_pallas).  Pair selection, the
    farthest-from-line scan (cpp:763-784), and the determinant (cpp:787-809)
    run here in jnp, vectorized over clusters, using the SAME formulas as
    `_one_cluster` — keeping the knife-edge computations (G == 0 collinear
    test, value-equality skips) in one implementation regardless of which
    engine produced the pair stats (Mosaic fuses a*b - c*d into FMAs whose
    residuals break G == 0 agreement otherwise).

    Pick equivalence with `_one_cluster`'s (first max row, first max col):
    d2m is upper-triangular-masked, so no row before the first-max row i*
    holds the global max; hence i* = min over gmax columns of firstrow and
    j* = first gmax column with firstrow == i*.  Empty/singleton clusters
    (no i < j pair anywhere) resolve to index 0 for both, matching argmax
    over an all(-1) matrix."""
    c, p = cm.shape
    dtype = mpts.dtype
    lane = jnp.arange(p, dtype=jnp.int32)[None, :]
    gmax = jnp.max(cm, axis=1, keepdims=True)              # (C, 1)
    have = gmax > -0.5
    hit = (cm == gmax) & have
    i_star = jnp.where(
        have[:, 0], jnp.where(hit, fr, p).min(axis=1), 0
    )                                                      # (C,)
    j_star = jnp.where(
        have[:, 0],
        jnp.where(hit & (fr == i_star[:, None]), lane, p).min(axis=1),
        0,
    )
    # row extraction via one-hot sums: exactly one nonzero term, and
    # HIGHEST precision keeps the 1.0 * v product in full f32 — TPU's
    # DEFAULT matmul precision multiplies in bf16, which would round the
    # extracted coordinates and break the value-equality skips and the
    # G == 0 collinearity test below
    hi = jax.lax.Precision.HIGHEST
    oh_i = (lane == i_star[:, None]).astype(dtype)         # (C, P)
    oh_j = (lane == j_star[:, None]).astype(dtype)
    pi = jnp.einsum("cp,cpk->ck", oh_i, mpts, precision=hi)  # (C, 3)
    pj = jnp.einsum("cp,cpk->ck", oh_j, mpts, precision=hi)

    xs, ys, zs = mpts[:, :, 0], mpts[:, :, 1], mpts[:, :, 2]
    pix, piy, piz = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    pjx, pjy, pjz = pj[:, 0:1], pj[:, 1:2], pj[:, 2:3]
    ex = pjx - pix
    ey = pjy - piy
    cross = jnp.abs(ex * (ys - piy) - ey * (xs - pix))
    norm = jnp.sqrt(ex * ex + ey * ey)
    line_d = cross / jnp.maximum(norm, jnp.asarray(1e-30, dtype))
    eq_i = (xs == pix) & (ys == piy) & (zs == piz)
    eq_j = (xs == pjx) & (ys == pjy) & (zs == pjz)
    k_mask = member_mask & ~eq_i & ~eq_j
    k_star = jnp.argmax(jnp.where(k_mask, line_d, -1.0), axis=1)
    oh_k = (lane == k_star[:, None]).astype(dtype)
    pk = jnp.einsum("cp,cpk->ck", oh_k, mpts, precision=hi)
    pkx, pky = pk[:, 0:1], pk[:, 1:2]

    a = pjx - pix
    b = pjy - piy
    cc = pkx - pix
    d = pky - piy
    e = a * (pix + pjx) + b * (piy + pjy)
    f = cc * (pix + pkx) + d * (piy + pky)
    g = 2.0 * (a * (pky - pjy) - b * (pkx - pjx))
    collinear = g == 0.0
    g_safe = jnp.where(collinear, 1.0, g)
    cx = jnp.where(collinear, pix, (d * e - b * f) / g_safe)
    cy = jnp.where(collinear, piy, (a * f - cc * e) / g_safe)
    zeros = jnp.zeros((c, 1), dtype)
    tcol = jnp.full((c, 1), t, dtype)
    return jnp.concatenate([cx, cy, zeros, tcol], axis=1)


def circumcenter_features_sorted(
    sorted_pts: jnp.ndarray,   # (M + P, 3) cluster-contiguous points
    starts: jnp.ndarray,       # (C,)
    sizes: jnp.ndarray,        # (C,)
    cluster_valid: jnp.ndarray,
    t: jnp.ndarray,
    p_max: int,
) -> jnp.ndarray:
    """Same feature as circumcenter_features, but members are fetched as
    CONTIGUOUS slices of the cluster-sorted point array (vmapped
    dynamic_slice) instead of a (C, P) random gather — ~5x cheaper member
    access on TPU."""
    c = starts.shape[0]
    mpts = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(
            sorted_pts, (s0, jnp.zeros((), s0.dtype)), (p_max, 3)
        )
    )(starts)
    mm = (
        jnp.arange(p_max, dtype=jnp.int32)[None, :] < sizes[:, None]
    ) & cluster_valid[:, None]
    xy = jax.vmap(_one_cluster)(mpts, mm)
    zeros = jnp.zeros((c, 1), dtype=sorted_pts.dtype)
    tcol = jnp.full((c, 1), t, dtype=sorted_pts.dtype)
    return jnp.concatenate([xy, zeros, tcol], axis=1)
