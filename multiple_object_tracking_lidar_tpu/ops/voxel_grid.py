"""MXU-native dense voxel accumulation: factored one-hot matmuls.

Same semantics as ``ops.voxel.voxel_accumulate`` (PCL VoxelGrid binning, ref
src/multiple_object_tracking_lidar.cpp:452-456): scatter-add every valid
point's (x, y, z, 1) into its dense grid cell.  But expressed as matrix
products instead of a scatter — the cell index factors as
``lin = ix + gx * iyz``, so the accumulation is a pair of one-hot projections

    acc[iyz, ix] (channel c) = sum_i v_i * Y[i, iyz] * X[i, ix]
                             = ((Y * v)^T @ X)[iyz, ix]

i.e. ONE dot_general per channel over one-hot matrices built with iota
compares.  Why this beats both alternatives on TPU:

  * the XLA scatter path is a compile lottery on this stack (byte-identical
    programs land 0.02 ms or 1.6+ ms; docs/PERFORMANCE.md) — matmuls are
    deterministic;
  * the sort+segsum path pays an O(N log^2 N) 4-operand sort (~0.25 ms at
    106k points) — the one-hot contraction is N x n_cells MACs on the MXU
    (~18 GMAC at 106k x 21k cells: well under 0.1 ms), with zero sorts.

Exactness: one-hot entries are exactly representable in bf16, and each f32
coordinate is split into three bf16 summands (8+8+8 mantissa bits >= f32's
24), so every product is exact and accumulation happens in f32 — the result
matches the scatter path to f32 summation-order differences only.  The count
channel is exact outright (0/1 values).

The output is additive, so point-sharded deployments ``psum`` partial
accumulators exactly like the scatter path (parallel/sharding.py).
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


def _split3_bf16(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """f32 -> three bf16 summands, exact to f32 ulp (3x8 mantissa bits)."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return h1, h2, h3


def voxel_accumulate_onehot(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    use_pallas: bool | None = None,
    block: int | None = None,
) -> jnp.ndarray:
    """Dense (n_cells, 4) [sum_x, sum_y, sum_z, count] accumulator — the
    scatter-accumulator-compatible layout.  The pipeline's dense-grid path
    uses voxel_accumulate_onehot_cm instead (channel-major: slicing a channel
    out of an (N, 4) array costs a ~0.25 ms minor-dim relayout per slice on
    this TPU, while (4, N) rows are free)."""
    cm = voxel_accumulate_onehot_cm(
        points, mask, scene, leaf_xy, leaf_z, use_pallas, block
    )
    return cm.T


def voxel_accumulate_onehot_cm(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    use_pallas: bool | None = None,
    block: int | None = None,
    quant: str = "exact",
    with_npts: bool = False,
) -> jnp.ndarray:
    """Dense CHANNEL-MAJOR (4, n_cells) [sum_x, sum_y, sum_z, count]
    accumulator, built with one-hot matmuls (no scatter, no sort).
    ``with_npts=True`` additionally returns the scalar valid-point count
    (mask sum) — the v4 kernel accumulates it in SMEM for free, while an
    XLA-side reduce over the mask in its pinned kernel-operand layout
    costs ~72 us/frame (1 of 128 lanes).

    ``use_pallas=None`` auto-selects: the fused VMEM kernel on TPU (one-hots
    built in VMEM per block — the XLA lowering materializes an (N, 10*gx)
    bf16 operand in HBM, ~100 MB at bench shapes), the jnp lowering
    elsewhere.  Results agree to f32 summation order.

    ``quant="fast"`` selects the 4-channel single-digit scheme: one int8
    digit per axis instead of two, so the per-point coordinate is
    quantized to leaf/2^(k+1) with 2^k the largest power of two holding
    leaf/2*2^k <= 126 (~0.12 mm xy / ~3.9 mm z at the 0.05 m bench leaf —
    far below sensor noise and the voxel size itself).  Sums stay
    bit-deterministic integers; the digit channel count drops 7 -> 4.

    Kernel selection within each mode is automatic: the MXU-natural
    single-dot kernels (v5 fast / v6 exact — no per-dot operand relayouts)
    whenever the per-frame N keeps their f32 digit sums integer-exact
    (n*127 resp. n*128 < 2^24), else the i32-accumulating v4/v3.  All four
    produce bit-identical outputs within their mode."""
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    gyz = gy * gz
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)

    if block is None:
        block = _pick_block(points.shape[0])
    if use_pallas is None:
        use_pallas = (
            points.dtype != jnp.float64
            and jax.default_backend() == "tpu"
            and block is not None
        )
    if use_pallas and block is not None:
        if quant == "fast":
            # v5 (MXU-natural orientation, f32 accumulation) while the
            # integer-exactness bound holds; the i32-accumulating v4 beyond
            fast_acc = (
                _accumulate_pallas_v5
                if _v5_exact_n(points.shape[0])
                else _accumulate_pallas_v4
            )
            acc, npts = fast_acc(points, mask, scene, leaf_xy, leaf_z, block)
            acc = acc.astype(points.dtype)
            return (acc, npts) if with_npts else acc
        # v3 kernel: quantize + mask-fold in-kernel from the raw (N, 3)
        # points + (N, 1) mask operands, int8 fixed-point digit channels
        # (bit-deterministic integer sums; see kernel doc).  Its two balanced
        # int8 digits represent |frac| <= leaf/2 at the fixed 2^19 / 2^14
        # scales only while leaf/2 * scale fits the digit pair (32640), i.e.
        # leaf_xy <= ~0.124 m / leaf_z <= ~3.98 m — beyond that the i32
        # frac silently wraps in the int8 narrow, so fall back to the bf16x3
        # v2 kernel (exact at any leaf size).  ADVICE r2.
        if _v3_leaf_ok(leaf_xy, leaf_z):
            # MXU-natural v6 (one dot per block, no per-dot relayouts)
            # while its f32 accumulation stays integer-exact; the
            # i32-accumulating v3 beyond.  Bit-identical outputs.
            exact_acc = (
                _accumulate_pallas_v6
                if _v6_exact_n(points.shape[0])
                else _accumulate_pallas_v3
            )
            acc, npts = exact_acc(
                points, mask, scene, leaf_xy, leaf_z, block
            )
            acc = acc.astype(points.dtype)
            return (acc, npts) if with_npts else acc
        acc = _accumulate_pallas_v2(
            points, mask, scene, leaf_xy, leaf_z, block
        ).astype(points.dtype)
        if with_npts:
            return acc, (mask.ravel() != 0).sum()
        return acc

    # jnp one-hot lowerings: quantize + bounds-test up front.  Masks may
    # arrive pre-staged as (N, 1) f32 (bench.stage_stacked layout pinning);
    # normalize to a flat bool for the elementwise path.
    maskb = (mask != 0).reshape(points.shape[0])
    ix, iy, iz = _quantize(points, leaf_xy, leaf_z)
    ix -= bx
    iy -= by
    iz -= bz
    in_bounds = (
        maskb
        & (ix >= 0) & (ix < gx)
        & (iy >= 0) & (iy < gy)
        & (iz >= 0) & (iz < gz)
        # NaN coords drop here, matching the kernels — the f32->i32 cast of
        # NaN is implementation-defined and can land in bounds
        & jnp.all(points == points, axis=1)
    )
    # invalid points select no one-hot column -> contribute nothing
    ix = jnp.where(in_bounds, ix, -1)
    iyz = jnp.where(in_bounds, iy + gy * iz, -1)

    if quant == "fast":
        # Single-digit (v4/v5) scheme in the jnp lowering: precision mode is
        # a CONFIG property, not an artifact of which backend or shard tiling
        # the dispatch landed on (VERDICT r4 #2).  Same f32 quantize/digit
        # products as _acc_v4_body, exact i32 one-hot accumulation, and the
        # same f32 finalize products as _v4_finalize_into — outputs are
        # bit-identical to the v4/v5 kernels for identical inputs
        # (tests/test_grid.py::test_jnp_fast_matches_kernel).
        f32, i32 = jnp.float32, jnp.int32
        kx, kz = _v4_shifts(leaf_xy, leaf_z)
        p32 = points.astype(f32)
        okf = in_bounds                               # NaN already dropped
        ixm = ix
        iyzm = iyz
        leafv = jnp.stack(
            [f32(leaf_xy), f32(leaf_xy), f32(leaf_z)]
        )[None, :]
        sv = jnp.stack([f32(2.0**kx), f32(2.0**kx), f32(2.0**kz)])[None, :]
        iabs = jnp.stack([ix + bx, iy + by, iz + bz], axis=1).astype(f32)
        cell0 = iabs * leafv                          # same product as recon
        frac = p32 - cell0 - 0.5 * leafv
        fq = jnp.round(jnp.where(okf[:, None], frac, 0.0) * sv).astype(i32)
        fq = jnp.clip(fq, -127, 127)

        Xi = (ixm[:, None] == jnp.arange(gx, dtype=i32)[None, :]).astype(jnp.int8)
        Yi = (iyzm[:, None] == jnp.arange(gyz, dtype=i32)[None, :]).astype(jnp.int8)
        digs = jnp.concatenate([fq, okf[:, None].astype(i32)], axis=1)  # (N, 4)
        XC = (
            Xi[:, None, :].astype(i32) * digs[:, :, None]
        ).astype(jnp.int8).reshape(points.shape[0], 4 * gx)
        S = jax.lax.dot_general(
            Yi, XC, (((0,), (0,)), ((), ())), preferred_element_type=i32
        ).reshape(gyz, 4, gx)                         # exact integer sums
        s_x = jnp.moveaxis(S, 1, 0).reshape(4, gyz * gx).astype(f32)

        lin = jnp.arange(gyz * gx, dtype=i32)
        ix_c = lin % gx
        iyz_c = lin // gx
        iy_c = iyz_c % gy
        iz_c = iyz_c // gy
        cx = (bx + ix_c).astype(f32) * f32(leaf_xy)
        cy = (by + iy_c).astype(f32) * f32(leaf_xy)
        cz = (bz + iz_c).astype(f32) * f32(leaf_z)
        cnt = s_x[3]
        acc = jnp.stack(
            [
                cnt * (cx + f32(0.5 * leaf_xy)) + s_x[0] * f32(2.0**-kx),
                cnt * (cy + f32(0.5 * leaf_xy)) + s_x[1] * f32(2.0**-kx),
                cnt * (cz + f32(0.5 * leaf_z)) + s_x[2] * f32(2.0**-kz),
                cnt,
            ],
            axis=0,
        ).astype(points.dtype)
        return (acc, maskb.sum()) if with_npts else acc

    if points.dtype == jnp.float64:
        # f64 mode (CPU parity tests): plain f64 one-hot contraction, exact
        # to f64 summation order
        X = (ix[:, None] == jnp.arange(gx, dtype=jnp.int32)[None, :]).astype(points.dtype)
        Y = (iyz[:, None] == jnp.arange(gyz, dtype=jnp.int32)[None, :]).astype(points.dtype)
        w = in_bounds.astype(points.dtype)
        v = jnp.concatenate([points * w[:, None], w[:, None]], axis=1)       # (N, 4)
        XC = (X[:, None, :] * v[:, :, None]).reshape(points.shape[0], 4 * gx)
        A = jax.lax.dot_general(
            Y, XC, (((0,), (0,)), ((), ())), preferred_element_type=points.dtype
        ).reshape(gyz, 4, gx)
        acc = jnp.moveaxis(A, 1, 0).reshape(4, gyz * gx)
        return (acc, maskb.sum()) if with_npts else acc

    X = (ix[:, None] == jnp.arange(gx, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    Y = (iyz[:, None] == jnp.arange(gyz, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)

    w = in_bounds.astype(jnp.float32)
    p32 = points.astype(jnp.float32) * w[:, None]
    cols = []
    for c in range(3):
        cols.extend(_split3_bf16(p32[:, c]))
    cols.append(w)  # counts: 0/1, exact in bf16
    XC = jnp.concatenate([X * col[:, None].astype(jnp.bfloat16) for col in cols], axis=1)

    # (gyz, 10*gx) f32 = Y^T @ XC — bf16 operands (exact), f32 accumulation
    A = jax.lax.dot_general(
        Y, XC, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    A = A.reshape(gyz, 10, gx)
    sx = A[:, 0] + A[:, 1] + A[:, 2]
    sy = A[:, 3] + A[:, 4] + A[:, 5]
    sz = A[:, 6] + A[:, 7] + A[:, 8]
    cnt = A[:, 9]
    acc = jnp.stack([sx, sy, sz, cnt], axis=0)           # (4, gyz, gx)
    acc = acc.reshape(4, gyz * gx).astype(points.dtype)
    return (acc, maskb.sum()) if with_npts else acc


def _pick_block(n: int) -> int | None:
    """Point-block size that tiles N exactly.  Measured via xplane traces
    (the only trustworthy timing on this remote-dispatch stack): per-grid-
    step overhead dominates below 2048 (v2 kernel: 964/759/629/629 us at
    512/1024/2048/4096 for N=106496; v3: 692/638 at 2048/4096), and 8192
    exceeds Mosaic's scoped VMEM."""
    for b in (4096, 2048, 1024, 512):
        if n % b == 0:
            return b
    return None


def _cap_block(block: int, n: int) -> int:
    """Cap the point block at the scoped-VMEM limit (2048) and fail loudly if
    the capped block no longer tiles N: a silently under-iterated grid
    (``grid = n // block``) would drop tail points (ADVICE r3)."""
    block = min(block, 2048)
    if n % block != 0:
        raise ValueError(
            f"point block {block} does not tile N={n} (after the 2048 "
            "scoped-VMEM cap); choose a block that divides N — see _pick_block"
        )
    return block


def _acc_kernel(ix_ref, iyz_ref, vals_ref, out_ref, *, block, gx, gyz, nch):
    """One grid step = one point block: build the (B, gyz)/(B, gx) one-hots
    in VMEM, take nch MXU products, accumulate into the resident output."""
    b = pl.program_id(0)
    ix = ix_ref[:]                                   # (B, 1) i32
    iyz = iyz_ref[:]                                 # (B, 1) i32
    vals = vals_ref[:]                               # (B, nch) f32 (bf16-exact)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (block, gx), 1)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (block, gyz), 1)
    Y = (iyz == iota_y).astype(jnp.bfloat16)         # invalid rows: all-zero
    ex = ix == iota_x

    for c in range(nch):
        Xc = jnp.where(ex, vals[:, c : c + 1], 0.0).astype(jnp.bfloat16)
        acc_c = jax.lax.dot_general(
            Y, Xc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                            # (gyz, gx)

        @pl.when(b == 0)
        def _():
            out_ref[c] = acc_c

        @pl.when(b > 0)
        def _():
            out_ref[c] = out_ref[c] + acc_c


def _acc_kernel_v2(
    pts_ref, msk_ref, out_ref, *, block, gx, gy, gz, gyz, inv_xy, inv_z, bx, by, bz
):
    """One grid step = one point block, quantization IN-KERNEL.

    v1 (`_acc_kernel`) took host-prepared (ix, iyz, vals) operands; the
    tiled->linear relayout copies XLA inserts in front of the custom call
    cost ~160 us/frame at bench shapes (measured from the xplane trace) and
    the host-side prep another ~35 us.  Here the only operand is the raw
    (N, 3) point block: quantize (f32 multiply + floor, identical to
    ops.voxel._quantize), bounds-test, bf16x3-split and one-hot build all
    happen in VMEM.  Masked points arrive pushed out of bounds (sentinel
    coords) and contribute nothing.

    Output layout is (10, gx, gyz): the dot contracts the point dim with
    gyz on the LANES (220 of 256 used vs 50 of 128 for the v1 orientation).
    """
    b = pl.program_id(0)
    p = pts_ref[...]                                  # (B, 3) f32
    f32 = jnp.float32
    # quantize + bounds-test VECTORIZED on the (B, 3) block: per-lane (B, 1)
    # arithmetic is poison in Mosaic (1 of 128 lanes used per op), so all
    # scalar-ish math happens on 3 lanes at once and only the final slices
    # touch (B, 1) shapes
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (block, 3), 1)
    inv3 = jnp.where(lane3 == 2, inv_z, inv_xy).astype(f32)
    b3 = (
        jnp.where(lane3 == 0, bx, jnp.where(lane3 == 1, by, bz))
    ).astype(jnp.int32)
    g3 = (
        jnp.where(lane3 == 0, gx, jnp.where(lane3 == 1, gy, gz))
    ).astype(jnp.int32)
    i3 = jnp.floor(p * inv3).astype(jnp.int32) - b3   # (B, 3)
    ok3 = (i3 >= 0) & (i3 < g3)
    ok = jnp.all(ok3, axis=1, keepdims=True) & (msk_ref[...] != 0.0)  # (B, 1)

    ix = i3[:, 0:1]
    iyz = i3[:, 1:2] + gy * i3[:, 2:3]                # (B, 1)
    ixm = jnp.where(ok, ix, -1)
    iyzm = jnp.where(ok, iyz, -1)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (block, gx), 1)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (block, gyz), 1)
    Y = (iyzm == iota_y).astype(jnp.bfloat16)
    exb = (ixm == iota_x).astype(jnp.bfloat16)        # exact 0/1

    # bf16x3 split, vectorized on (B, 3)
    v3 = jnp.where(ok, p, 0.0)
    h1 = v3.astype(jnp.bfloat16)
    r1 = v3 - h1.astype(f32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(f32)).astype(jnp.bfloat16)
    vals = [
        h1[:, 0:1], h2[:, 0:1], h3[:, 0:1],
        h1[:, 1:2], h2[:, 1:2], h3[:, 1:2],
        h1[:, 2:3], h2[:, 2:3], h3[:, 2:3],
        ok.astype(jnp.bfloat16),
    ]

    for c in range(10):
        Xc = exb * vals[c]                            # (B, gx) bf16
        acc_c = jax.lax.dot_general(
            Xc, Y, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )                                             # (gx, gyz)

        @pl.when(b == 0)
        def _():
            out_ref[c] = acc_c

        @pl.when(b > 0)
        def _():
            out_ref[c] = out_ref[c] + acc_c


def _accumulate_pallas_v2(
    points: jnp.ndarray,   # (N, 3) f32 RAW frame points (no host-side prep)
    mask: jnp.ndarray,     # (N,) or (N, 1) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(4, n_cells) channel-major accumulator via the in-kernel-quantize
    kernel.  n_cells flat order is PCL's (x-fastest): the kernel emits
    (gx, gyz) and the (cheap, 264 KB) transpose restores (gyz, gx).

    The points operand is the RAW frame array: any XLA-side fold of the
    mask into (N, 3) costs ~70 us (12-byte rows defeat vectorization in
    the linear layout the custom call requires — measured), so the mask
    rides as a second (N, 1) operand (contiguous floats, cheap) and the
    fold happens in VMEM."""
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    gyz = gy * gz
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    n = points.shape[0]
    grid = n // block

    out = pl.pallas_call(
        functools.partial(
            _acc_kernel_v2,
            block=block,
            gx=gx,
            gy=gy,
            gz=gz,
            gyz=gyz,
            inv_xy=float(1.0 / leaf_xy),
            inv_z=float(1.0 / leaf_z),
            bx=bx,
            by=by,
            bz=bz,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (10, gx, gyz), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((10, gx, gyz), jnp.float32),
        interpret=interpret,
    )(points.astype(jnp.float32), mask.astype(jnp.float32).reshape(n, 1))

    sx = out[0] + out[1] + out[2]
    sy = out[3] + out[4] + out[5]
    sz = out[6] + out[7] + out[8]
    acc = jnp.stack([sx, sy, sz, out[9]], axis=0)     # (4, gx, gyz)
    return jnp.swapaxes(acc, 1, 2).reshape(4, gyz * gx)


_FXP_XY = 19  # xy frac scale: 2^19 ~ 1.9 um resolution over [0, leaf)
_FXP_Z = 14   # z frac scale over [0, 20*leaf): ~3e-5 m resolution


def _v3_leaf_ok(leaf_xy: float, leaf_z: float) -> bool:
    """True iff the v3 kernel's two balanced int8 digits can represent the
    quantized cell-relative frac exactly: |frac| <= leaf/2, and the digit
    pair covers [-32896, 32639]; require |fq| <= 127*256 = 32512 for margin
    over the rounding step."""
    return (
        leaf_xy / 2.0 * (1 << _FXP_XY) <= 32512.0
        and leaf_z / 2.0 * (1 << _FXP_Z) <= 32512.0
    )


def _acc_kernel_v3(
    pts_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy, gz, gyz,
    w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    b = pl.program_id(0)
    _acc_v3_body(
        pts_ref[...], msk_ref[...], acc_ref, (), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[...] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, 0] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, 0] = npts_ref[0, 0] + blk

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        _v3_finalize_into(
            out_ref, acc_ref, (), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
        )


def _acc_kernel_v3_stacked(
    pts_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy, gz, gyz,
    w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    """Batched variant: grid (S, N//block); one revolving output per frame.
    Accumulating ALL frames of a scan dispatch in ONE call keeps the big
    (S, N, 3) operand's tiled->linear relayout loop-invariant (XLA hoists
    it out of the scan) instead of paying ~110 us of per-frame slice+copy
    inside the sequential chain (trace-measured)."""
    b = pl.program_id(1)
    si = pl.program_id(0)
    _acc_v3_body(
        pts_ref[0], msk_ref[0], acc_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk

    @pl.when(b == pl.num_programs(1) - 1)
    def _():
        _v3_finalize_into(
            out_ref, acc_ref, (0,), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
        )


def _v3_finalize_into(
    out_ref, acc_ref, lead, *, gx, gy, w1, leaf_xy, leaf_z, bx, by, bz
):
    """In-kernel v3 finalize (same rationale as _v4_finalize_into): the
    7 integer digit-sum channels -> f32 [sum_x, sum_y, sum_z, count] on the
    (w1, 128) grid.  Cell centers use the SAME f32 products as the kernel's
    quantize step; results are bit-identical to the old XLA-side
    reconstruction."""
    f32 = jnp.float32
    i32 = jnp.int32
    u = jax.lax.broadcasted_iota(i32, (w1, 128), 0)
    v = jax.lax.broadcasted_iota(i32, (w1, 128), 1)
    lin = 128 * u + v
    ix = lin % gx
    iyz = lin // gx
    iy = iyz % gy
    iz = iyz // gy
    cx = (bx + ix).astype(f32) * f32(leaf_xy)
    cy = (by + iy).astype(f32) * f32(leaf_xy)
    cz = (bz + iz).astype(f32) * f32(leaf_z)
    inv_xyq = f32(1.0 / (1 << _FXP_XY))
    inv_zq = f32(1.0 / (1 << _FXP_Z))
    half_xy = f32(0.5 * leaf_xy)
    half_z = f32(0.5 * leaf_z)
    cnt = acc_ref[lead + (6,)].astype(f32)
    s0 = acc_ref[lead + (0,)].astype(f32)
    s1 = acc_ref[lead + (1,)].astype(f32)
    s2 = acc_ref[lead + (2,)].astype(f32)
    s3 = acc_ref[lead + (3,)].astype(f32)
    s4 = acc_ref[lead + (4,)].astype(f32)
    s5 = acc_ref[lead + (5,)].astype(f32)
    out_ref[lead + (0,)] = cnt * (cx + half_xy) + (s0 + 256.0 * s1) * inv_xyq
    out_ref[lead + (1,)] = cnt * (cy + half_xy) + (s2 + 256.0 * s3) * inv_xyq
    out_ref[lead + (2,)] = cnt * (cz + half_z) + (s4 + 256.0 * s5) * inv_zq
    out_ref[lead + (3,)] = cnt


def _acc_v3_body(
    p, m, out_ref, lead, first, *, block, gx, gy, gz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    """int8 fixed-point histogram step.  Design notes (all trace-measured):

    * the flat cell index factors as ``lin = 128*u + v`` (NOT the (gx, gyz)
      geometry factors): v has power-of-two width so u/v are a shift/mask,
      and the (w1, 128) output is row-major flat cell order — the dense
      (4, n_cells) reconstruction is a pure reshape, and each channel's
      output fits max(1, w1/128) MXU tiles instead of the 2+ the
      (gx, gyz)=(50, 220) layout needed;
    * coordinates ride as TWO balanced int8 digits of the CELL-RELATIVE
      offset ``round((x - cell_x0 - leaf/2) * 2^19)`` — the cell base is
      a pure function of the cell index, reconstructed exactly at finalize
      as count*cell_center + digit_sums/2^19, so only the sub-leaf frac
      needs digits (2 per axis instead of 3 for absolute coords).  Every
      product against the 0/1 one-hot is int8-exact and the MXU runs at
      its 2x int8 rate with i32 accumulation — per-digit sums are EXACT
      integers, making voxel sums bit-deterministic across compiles and
      summation orders (the bf16x3 variant is exact per product but
      f32-accumulation-order dependent).  Centroid agreement with the f32
      paths: ~1e-6 (xy), ~3e-5 (z; the 20x z-leaf spreads the same 16
      digit bits over [0, 2 m));
    * masked / out-of-scene / NaN points: the value-side one-hot row is
      all-zero (u = -1 matches nothing), so garbage digits from
      i32-overflowing sentinel coords contribute exactly 0.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    lane3 = jax.lax.broadcasted_iota(i32, (block, 3), 1)
    inv3 = jnp.where(lane3 == 2, inv_z, inv_xy).astype(f32)
    b3 = (
        jnp.where(lane3 == 0, bx, jnp.where(lane3 == 1, by, bz))
    ).astype(i32)
    g3 = (
        jnp.where(lane3 == 0, gx, jnp.where(lane3 == 1, gy, gz))
    ).astype(i32)
    i3 = jnp.floor(p * inv3).astype(i32) - b3         # (B, 3)
    ok3 = (i3 >= 0) & (i3 < g3) & (p == p)            # NaN coords drop here
    ok = jnp.all(ok3, axis=1, keepdims=True) & (m != 0.0)  # (B, 1)

    lin = i3[:, 0:1] + gx * (i3[:, 1:2] + gy * i3[:, 2:3])
    lin = jnp.where(ok, lin, -1)
    u = jax.lax.shift_right_arithmetic(lin, jnp.int32(7))  # (B, 1); -1 stays -1
    v = lin & 127

    iota_u = jax.lax.broadcasted_iota(i32, (block, w1), 1)
    iota_v = jax.lax.broadcasted_iota(i32, (block, 128), 1)
    U = (u == iota_u).astype(i32)                     # all-zero row if masked
    V = (v == iota_v).astype(jnp.int8)

    # cell-relative centered frac, 2 balanced int8 digits per axis
    leaf3 = jnp.where(lane3 == 2, leaf_z, leaf_xy).astype(f32)
    s3 = jnp.where(
        lane3 == 2, float(1 << _FXP_Z), float(1 << _FXP_XY)
    ).astype(f32)
    cell0 = (i3 + b3).astype(f32) * leaf3             # same product as recon
    frac = p - cell0 - 0.5 * leaf3                    # in [-leaf/2, leaf/2)
    fq = jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(i32)
    d0 = ((fq + 128) & 255) - 128
    d1 = jax.lax.shift_right_arithmetic(fq - d0, jnp.int32(8))
    digs = [
        d0[:, 0:1], d1[:, 0:1],
        d0[:, 1:2], d1[:, 1:2],
        d0[:, 2:3], d1[:, 2:3],
        ok.astype(i32),
    ]

    for c in range(7):
        # int8 elementwise mul is not legal in Mosaic (arith.muli on i8);
        # mask in i32 and narrow for the MXU
        Xc = (U * digs[c]).astype(jnp.int8)           # (B, w1) int8
        acc_c = jax.lax.dot_general(
            Xc, V, (((0,), (0,)), ((), ())), preferred_element_type=i32
        )                                             # (w1, 128) i32
        at = lead + (c,)

        @pl.when(first)
        def _():
            out_ref[at] = acc_c

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[at] = out_ref[at] + acc_c


def _accumulate_pallas_v3(
    points: jnp.ndarray,   # (N, 3) f32 RAW frame points
    mask: jnp.ndarray,     # (N,) or (N, 1) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """((4, n_cells) channel-major accumulator, scalar valid-point count)
    via the int8 fixed-point kernel.  Sums are bit-deterministic (integer
    digit accumulation); centroids agree with the f32 paths to ~1e-6 (xy) /
    ~3e-5 (z).  Finalize + mask count run in-kernel (same rationale as v4:
    XLA-side reconstruction costs constant prefetches + fusions per frame,
    the pinned-layout mask reduce is 1-of-128-lanes).  Block capped at 2048:
    the f32 finalize output + 7-channel i32 scratch exceed scoped VMEM at
    4096."""
    block = _cap_block(block, points.shape[0])
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    gyz = gy * gz
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    n = points.shape[0]

    out, npts = pl.pallas_call(
        functools.partial(
            _acc_kernel_v3,
            block=block,
            gx=gx,
            gy=gy,
            gz=gz,
            gyz=gyz,
            w1=w1,
            inv_xy=float(1.0 / leaf_xy),
            inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy),
            leaf_z=float(leaf_z),
            bx=bx,
            by=by,
            bz=bz,
        ),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((7, w1, 128), jnp.int32)],
        interpret=interpret,
    )(points.astype(jnp.float32), mask.astype(jnp.float32).reshape(n, 1))

    return out.reshape(4, w1 * 128)[:, :n_cells], npts[0, 0]


def _v4_shifts(leaf_xy: float, leaf_z: float) -> tuple[int, int]:
    """Largest power-of-two fixed-point shifts whose single int8 digit holds
    the centered cell-relative frac: leaf/2 * 2^k <= 126 (one count of margin
    for the rounding step plus floor-boundary f32 slop; the kernel clamps to
    [-127, 127] as well, so a pathological boundary point saturates instead
    of wrapping)."""
    kx = int(math.floor(math.log2(252.0 / leaf_xy)))
    kz = int(math.floor(math.log2(252.0 / leaf_z)))
    return kx, kz


def _acc_kernel_v4(
    pts_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy, gz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    b = pl.program_id(0)
    _acc_v4_body(
        pts_ref[...], msk_ref[...], acc_ref, (), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    # valid-point count rides out of the kernel: an XLA-side reduce over
    # the (N, 1) f32 mask in its pinned kernel-operand layout uses 1 of
    # 128 lanes (~72 us/frame measured) — in here it is one block reduce
    blk = jnp.sum((msk_ref[...] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, 0] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, 0] = npts_ref[0, 0] + blk

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        _v4_finalize_into(
            out_ref, acc_ref, (), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
        )


def _acc_kernel_v4_stacked(
    pts_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy, gz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    """Batched single-digit variant: grid (S, N//block), one revolving
    output per frame — same rationale as _acc_kernel_v3_stacked (the big
    (S, N, 3) operand's tiled->linear relayout is paid once per dispatch
    instead of ~90 us of slice+copy per scan iteration)."""
    b = pl.program_id(1)
    si = pl.program_id(0)
    _acc_v4_body(
        pts_ref[0], msk_ref[0], acc_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk

    @pl.when(b == pl.num_programs(1) - 1)
    def _():
        _v4_finalize_into(
            out_ref, acc_ref, (0,), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
        )


def _v4_finalize_into(
    out_ref, acc_ref, lead, *, gx, gy, w1, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    """In-kernel finalize: integer digit sums -> f32 [sum_x, sum_y, sum_z,
    count] on the (w1, 128) grid.  Doing this on the XLA side costs three
    s32[n_cells] folded-constant prefetches plus ~6 reconstruction fusions
    PER FRAME (trace-measured on the single-frame dispatch); in-kernel it is
    ~20 VPU passes over 5.5k cells — noise.  Cell centers use the same f32
    products as the quantize step, so results are bit-identical to the old
    host-side reconstruction."""
    f32 = jnp.float32
    i32 = jnp.int32
    u = jax.lax.broadcasted_iota(i32, (w1, 128), 0)
    v = jax.lax.broadcasted_iota(i32, (w1, 128), 1)
    lin = 128 * u + v
    ix = lin % gx
    iyz = lin // gx
    iy = iyz % gy
    iz = iyz // gy
    cx = (bx + ix).astype(f32) * f32(leaf_xy)
    cy = (by + iy).astype(f32) * f32(leaf_xy)
    cz = (bz + iz).astype(f32) * f32(leaf_z)
    inv_xyq = f32(2.0**-kx)
    inv_zq = f32(2.0**-kz)
    half_xy = f32(0.5 * leaf_xy)
    half_z = f32(0.5 * leaf_z)
    cnt = acc_ref[lead + (3,)].astype(f32)
    out_ref[lead + (0,)] = cnt * (cx + half_xy) + acc_ref[lead + (0,)].astype(f32) * inv_xyq
    out_ref[lead + (1,)] = cnt * (cy + half_xy) + acc_ref[lead + (1,)].astype(f32) * inv_xyq
    out_ref[lead + (2,)] = cnt * (cz + half_z) + acc_ref[lead + (2,)].astype(f32) * inv_zq
    out_ref[lead + (3,)] = cnt


def _acc_v4_body(
    p, m, out_ref, lead, first, *, block, gx, gy, gz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    """Single-digit variant of the v3 histogram step: 4 channels
    (frac_x, frac_y, frac_z, count) instead of 7.  Identical structure —
    factored 128*u+v one-hots, int8 MXU products, i32 accumulation — but the
    cell-relative frac rides as ONE int8 digit at the per-leaf shift from
    `_v4_shifts`, quantizing each coordinate to 2^-(k+1) (<= leaf/252).
    Sums remain bit-deterministic integers; the MXU stream count (the
    dominant in-kernel cost, ~53 us/channel at bench shapes measured from
    xplane traces) drops from 7 to 4."""
    f32 = jnp.float32
    i32 = jnp.int32
    lane3 = jax.lax.broadcasted_iota(i32, (block, 3), 1)
    inv3 = jnp.where(lane3 == 2, inv_z, inv_xy).astype(f32)
    b3 = (
        jnp.where(lane3 == 0, bx, jnp.where(lane3 == 1, by, bz))
    ).astype(i32)
    g3 = (
        jnp.where(lane3 == 0, gx, jnp.where(lane3 == 1, gy, gz))
    ).astype(i32)
    i3 = jnp.floor(p * inv3).astype(i32) - b3         # (B, 3)
    ok3 = (i3 >= 0) & (i3 < g3) & (p == p)            # NaN coords drop here
    ok = jnp.all(ok3, axis=1, keepdims=True) & (m != 0.0)  # (B, 1)

    lin = i3[:, 0:1] + gx * (i3[:, 1:2] + gy * i3[:, 2:3])
    lin = jnp.where(ok, lin, -1)
    u = jax.lax.shift_right_arithmetic(lin, jnp.int32(7))
    v = lin & 127

    iota_u = jax.lax.broadcasted_iota(i32, (block, w1), 1)
    iota_v = jax.lax.broadcasted_iota(i32, (block, 128), 1)
    U = (u == iota_u).astype(i32)
    V = (v == iota_v).astype(jnp.int8)

    leaf3 = jnp.where(lane3 == 2, leaf_z, leaf_xy).astype(f32)
    s3 = jnp.where(lane3 == 2, float(2.0**kz), float(2.0**kx)).astype(f32)
    cell0 = (i3 + b3).astype(f32) * leaf3
    frac = p - cell0 - 0.5 * leaf3
    fq = jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(i32)
    fq = jnp.clip(fq, -127, 127)
    digs = [fq[:, 0:1], fq[:, 1:2], fq[:, 2:3], ok.astype(i32)]

    for c in range(4):
        Xc = (U * digs[c]).astype(jnp.int8)           # (B, w1) int8
        acc_c = jax.lax.dot_general(
            Xc, V, (((0,), (0,)), ((), ())), preferred_element_type=i32
        )                                             # (w1, 128) i32
        at = lead + (c,)

        @pl.when(first)
        def _():
            out_ref[at] = acc_c

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[at] = out_ref[at] + acc_c


def _accumulate_pallas_v4(
    points: jnp.ndarray,   # (N, 3) f32 RAW frame points
    mask: jnp.ndarray,     # (N,) or (N, 1) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """((4, n_cells) channel-major accumulator, scalar valid-point count)
    via the single-digit int8 kernel (quant="fast").  Counts are exact;
    coordinate sums quantize each point to leaf/2^(k+1) (~0.12 mm xy /
    ~3.9 mm z at the 0.05 m bench leaf) and stay bit-deterministic across
    compiles.  Block capped at 2048: with the f32 finalize output + i32
    scratch accumulator the 4096-point block exceeds the 16 MB scoped-VMEM
    limit (17.3 MB measured)."""
    block = _cap_block(block, points.shape[0])
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    n = points.shape[0]

    out = pl.pallas_call(
        functools.partial(
            _acc_kernel_v4,
            block=block,
            gx=gx,
            gy=gy,
            gz=gz,
            w1=w1,
            inv_xy=float(1.0 / leaf_xy),
            inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy),
            leaf_z=float(leaf_z),
            bx=bx,
            by=by,
            bz=bz,
            kx=kx,
            kz=kz,
        ),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((4, w1, 128), jnp.int32)],
        interpret=interpret,
    )(points.astype(jnp.float32), mask.astype(jnp.float32).reshape(n, 1))

    out, npts = out
    return out.reshape(4, w1 * 128)[:, :n_cells], npts[0, 0]  # (4, n_cells), ()


def _accumulate_pallas_v4_stacked(
    points: jnp.ndarray,   # (S, N, 3) f32 RAW stacked frame points
    mask: jnp.ndarray,     # (S, N) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, 4, n_cells) channel-major single-digit accumulators for a whole
    frame stack in ONE kernel call; per-frame results are bit-identical to
    _accumulate_pallas_v4.  Consumed by bind_env_multi's hoisted-accumulate
    scan (the (S, N, 3) relayout is paid once per dispatch instead of ~90 us
    of slice+copy per scan iteration — docs/PERFORMANCE.md round 3)."""
    block = _cap_block(block, points.shape[1])  # cross-frame double buffering,
    #   see v3_stacked
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _acc_kernel_v4_stacked,
            block=block,
            gx=gx,
            gy=gy,
            gz=gz,
            w1=w1,
            inv_xy=float(1.0 / leaf_xy),
            inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy),
            leaf_z=float(leaf_z),
            bx=bx,
            by=by,
            bz=bz,
            kx=kx,
            kz=kz,
        ),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, block, 3), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block, 1), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            # whole (1, S) row resident (SMEM blocks must equal the array
            # dims); each frame writes its own column at program_id(0)
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 4, w1, 128), jnp.int32)],
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, n, 1),
    )

    out, npts = out
    return out.reshape(s, 4, w1 * 128)[:, :, :n_cells], npts[0]  # (S,4,cells),(S,)


def _v5_exact_n(n: int) -> bool:
    """True iff v5's f32 MXU accumulation is integer-exact for n points per
    frame: the worst-case per-cell channel sum is n * 127 (every point in one
    cell at digit extreme), which must stay below 2^24 where f32 loses
    integer exactness.  Beyond that the caller falls back to the i32-
    accumulating v4 kernel."""
    return n * 127 < (1 << 24)


def _v5_quant_cm(pc, *, gx, gy, gz, bx, by, bz, kx, kz, inv_xy, inv_z,
                 leaf_xy, leaf_z):
    """Channel-major (3, B) block -> (lin (1, B), fq (3, B), ok (1, B)).
    Identical f32 ops to _acc_v4_body's row-major quantize (floor, products,
    round, clip) so both orientations agree bitwise on the same values."""
    f32, i32 = jnp.float32, jnp.int32
    row3 = jax.lax.broadcasted_iota(i32, pc.shape, 0)
    inv3 = jnp.where(row3 == 2, inv_z, inv_xy).astype(f32)
    b3 = jnp.where(row3 == 0, bx, jnp.where(row3 == 1, by, bz)).astype(i32)
    g3 = jnp.where(row3 == 0, gx, jnp.where(row3 == 1, gy, gz)).astype(i32)
    i3 = jnp.floor(pc * inv3).astype(i32) - b3
    ok3 = (i3 >= 0) & (i3 < g3) & (pc == pc)          # NaN coords drop here
    ok = jnp.all(ok3, axis=0, keepdims=True)          # (1, B)
    lin = jnp.where(ok, i3[0:1] + gx * (i3[1:2] + gy * i3[2:3]), -1)
    leaf3 = jnp.where(row3 == 2, leaf_z, leaf_xy).astype(f32)
    s3 = jnp.where(row3 == 2, float(2.0**kz), float(2.0**kx)).astype(f32)
    cell0 = (i3 + b3).astype(f32) * leaf3
    frac = pc - cell0 - 0.5 * leaf3
    fq = jnp.clip(jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(i32),
                  -127, 127)
    return lin, fq, ok


def _acc_v5_body(p_cm, m_row, acc_ref, lead, first, *, block, gx, gy,
                 gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz):
    """MXU-NATURAL single-digit histogram step (v5): same math as
    _acc_v4_body, with the dot issued in an orientation Mosaic lowers
    without per-operand relayouts.  v4 contracts dim 0 of both (block, w1)
    x (block, 128) operands, which makes Mosaic insert a sublane<->lane
    relayout of each operand before every dot (4 channels x N/block blocks
    per frame); trace-measured at bench shapes that relayout tax — not the
    MACs — dominates the kernel (~24% of the whole accumulate,
    scripts/micro_acc_v5.py).

    This body reads the block ONCE, channel-major (3, B): the quantize runs
    once, the digit lhs comes out natively as (4*w1, B) bf16 (digit channels
    masked onto sublane u_row), and the one-hot comes out natively
    TRANSPOSED as (128, B) (sublane iota vs the lane-oriented v index) —
    the dot contracts dim 1 of BOTH operands (lhs @ rhs^T), which Mosaic
    lowers ~1.7x faster than building the (B, 128) rhs from an in-register
    (1, B)->(B, 1) transpose and ~5.7x faster than the original dual-read
    formulation whose row-major operand forced a ~9.8 MB/dispatch XLA
    relayout copy of the point ring (scripts/micro_acc_v7.py; the earlier
    dual-read variant is preserved there as the baseline).  Digits are ints
    in [-127, 127] (bf16-exact); accumulation is f32, integer-exact while
    n*127 < 2^24 (_v5_exact_n guards the dispatch).  Output is
    bit-identical to v4 (tests/test_grid.py::test_v5_matches_v4)."""
    f32, i32 = jnp.float32, jnp.int32
    bf16 = jnp.bfloat16
    kw = dict(gx=gx, gy=gy, gz=gz, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
              inv_xy=inv_xy, inv_z=inv_z, leaf_xy=leaf_xy, leaf_z=leaf_z)
    lin_c, fq_c, ok_c = _v5_quant_cm(p_cm, **kw)      # lhs rows (1/3, B)

    # bounds + NaN + external mask fold into the one-hot lane index: a
    # dropped point selects NO one-hot column, so its lhs digits — whatever
    # they carry — contribute nothing
    okm = ok_c & (m_row != 0.0)                       # (1, B)
    v_row = jnp.where(okm, lin_c & 127, -1)           # (1, B)
    iota_sub = jax.lax.broadcasted_iota(i32, (128, block), 0)
    Vt = (iota_sub == v_row).astype(bf16)             # (128, B) rhs^T

    u_row = jax.lax.shift_right_arithmetic(lin_c, jnp.int32(7))  # (1, B)
    iota_s = jax.lax.broadcasted_iota(i32, (w1, block), 0)
    eq = iota_s == u_row                              # (w1, B)
    digs = [fq_c[0:1], fq_c[1:2], fq_c[2:3], okm.astype(i32)]
    lhs = jnp.concatenate(
        [jnp.where(eq, d, 0).astype(bf16) for d in digs], axis=0
    )                                                 # (4*w1, B)
    acc = jax.lax.dot_general(
        lhs, Vt, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).reshape((1,) * len(lead) + (4, w1, 128))

    @pl.when(first)
    def _():
        acc_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[...] = acc_ref[...] + acc


def _acc_kernel_v5(
    pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    b = pl.program_id(0)
    _acc_v5_body(
        pcm_ref[...], msk_ref[...], acc_ref, (), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    blk = jnp.sum((msk_ref[...] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, 0] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, 0] = npts_ref[0, 0] + blk

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        _v4_finalize_into(
            out_ref, acc_ref, (), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
        )


def _acc_kernel_v5_stacked(
    pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v5_body(
        pcm_ref[0], msk_ref[0], acc_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk

    @pl.when(b == pl.num_programs(1) - 1)
    def _():
        _v4_finalize_into(
            out_ref, acc_ref, (0,), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
        )


def _cap_block_v5(block: int, n: int) -> int:
    """v5's scoped-VMEM envelope admits 4096-point blocks (the f32 i32
    scratch of v3/v4 is replaced by one bf16 (4*w1, B) lhs); same loud
    divisibility contract as _cap_block (ADVICE r3)."""
    block = min(block, 4096)
    if n % block != 0:
        raise ValueError(
            f"point block {block} does not tile N={n} (after the 4096 "
            "scoped-VMEM cap); choose a block that divides N — see _pick_block"
        )
    return block


def _v5_kernel_params(scene, leaf_xy, leaf_z):
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    return dict(
        gx=gx, gy=gy, gz=gz, w1=w1,
        inv_xy=float(1.0 / leaf_xy), inv_z=float(1.0 / leaf_z),
        leaf_xy=float(leaf_xy), leaf_z=float(leaf_z),
        bx=math.floor(scene.x_min / leaf_xy),
        by=math.floor(scene.y_min / leaf_xy),
        bz=math.floor(scene.z_min / leaf_z),
        kx=kx, kz=kz,
    ), n_cells, w1


def _accumulate_pallas_v5(
    points: jnp.ndarray,   # (N, 3) f32 RAW frame points
    mask: jnp.ndarray,     # (N,) or (N, 1) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
    points_cm: jnp.ndarray | None = None,  # optional pre-staged (3, N) copy
) -> jnp.ndarray:
    """((4, n_cells) channel-major accumulator, scalar valid-point count) via
    the MXU-natural single-digit kernel — bit-identical outputs to
    _accumulate_pallas_v4 (scripts/micro_acc_v5.py isolates the orientation
    win; micro_acc_v7.py the single-read one).  Requires _v5_exact_n(N) —
    the caller (voxel_accumulate_onehot_cm) falls back to the
    i32-accumulating v4 beyond that.  The kernel reads ONLY the
    channel-major (3, N) view; ``points_cm`` lets the caller hand it over
    directly (when the row-major ``points`` parameter is staged
    channel-planes — major_to_minor (1, 0) — the in-graph swapaxes is a
    free bitcast, zero relayout copies)."""
    block = _cap_block_v5(block, points.shape[0])
    kw, n_cells, w1 = _v5_kernel_params(scene, leaf_xy, leaf_z)
    n = points.shape[0]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 0, 1)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v5, block=block, **kw),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((3, block), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((4, w1, 128), jnp.float32)],
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(1, n),
    )
    return out.reshape(4, w1 * 128)[:, :n_cells], npts[0, 0]


def _accumulate_pallas_v5_stacked(
    points: jnp.ndarray,   # (S, N, 3) f32 RAW stacked frame points
    mask: jnp.ndarray,     # (S, N) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
    points_cm: jnp.ndarray | None = None,  # optional pre-staged (S, 3, N)
) -> jnp.ndarray:
    """(S, 4, n_cells) stacked MXU-natural accumulators in ONE kernel call;
    per-frame results bit-identical to _accumulate_pallas_v4_stacked (and so
    to the per-frame v4/v5).  Drop-in for the hoisted-accumulate scan in
    bind_env_multi.  Reads ONLY the channel-major (S, 3, N) view — when the
    ``points`` ring is staged channel-planes (major_to_minor (0, 2, 1),
    bench.stage_stacked) the in-graph swapaxes is a free bitcast and the
    kernel consumes the ring with zero relayout copies (the earlier
    dual-read formulation forced a ~9.8 MB/dispatch XLA copy of the ring,
    ~160 us/cloud at bench shapes; scripts/micro_acc_v7.py)."""
    block = _cap_block_v5(block, points.shape[1])
    kw, n_cells, w1 = _v5_kernel_params(scene, leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v5_stacked, block=block, **kw),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, 3, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 4, w1, 128), jnp.float32)],
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, 1, n),
    )
    return out.reshape(s, 4, w1 * 128)[:, :, :n_cells], npts[0]


def _v6_exact_n(n: int) -> bool:
    """True iff v6's f32 MXU accumulation is integer-exact for n points per
    frame: v3's balanced digits span [-128, 128] (vs v5's single digit at
    127), so the worst-case per-cell channel sum is n * 128, which must
    stay below 2^24 where f32 loses integer exactness.  Beyond that the
    caller falls back to the i32-accumulating v3 kernel."""
    return n * 128 < (1 << 24)


def _v6_quant_cm(pc, *, gx, gy, gz, bx, by, bz, inv_xy, inv_z,
                 leaf_xy, leaf_z):
    """Channel-major (3, B) block -> (lin (1, B), d0 (3, B), d1 (3, B),
    ok (1, B)) with v3's TWO-balanced-digit scheme at the fixed
    2^_FXP_XY / 2^_FXP_Z scales.  Identical f32/i32 ops to _acc_v3_body's
    row-major quantize (floor, products, round, digit split) so both
    orientations agree bitwise on the same values."""
    f32, i32 = jnp.float32, jnp.int32
    row3 = jax.lax.broadcasted_iota(i32, pc.shape, 0)
    inv3 = jnp.where(row3 == 2, inv_z, inv_xy).astype(f32)
    b3 = jnp.where(row3 == 0, bx, jnp.where(row3 == 1, by, bz)).astype(i32)
    g3 = jnp.where(row3 == 0, gx, jnp.where(row3 == 1, gy, gz)).astype(i32)
    i3 = jnp.floor(pc * inv3).astype(i32) - b3
    ok3 = (i3 >= 0) & (i3 < g3) & (pc == pc)          # NaN coords drop here
    ok = jnp.all(ok3, axis=0, keepdims=True)          # (1, B)
    lin = jnp.where(ok, i3[0:1] + gx * (i3[1:2] + gy * i3[2:3]), -1)
    leaf3 = jnp.where(row3 == 2, leaf_z, leaf_xy).astype(f32)
    s3 = jnp.where(
        row3 == 2, float(1 << _FXP_Z), float(1 << _FXP_XY)
    ).astype(f32)
    cell0 = (i3 + b3).astype(f32) * leaf3             # same product as recon
    frac = pc - cell0 - 0.5 * leaf3                   # in [-leaf/2, leaf/2)
    fq = jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(i32)
    d0 = ((fq + 128) & 255) - 128
    d1 = jax.lax.shift_right_arithmetic(fq - d0, jnp.int32(8))
    return lin, d0, d1, ok


def _acc_v6_body(p_cm, m_row, acc_ref, lead, first, *, block, gx, gy,
                 gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz):
    """MXU-NATURAL EXACT-mode histogram step: v6 = v3's two-balanced-digit
    cell-relative scheme carried in v5's relayout-free orientation.  The
    7 digit channels (x d0/d1, y d0/d1, z d0/d1, count) stack into ONE
    (7*w1, B) bf16 lhs and the whole block is a single MXU dot against the
    natively-transposed (128, B) one-hot — contraction over dim 1 of BOTH
    operands, the same single-read lhs @ rhs^T form as _acc_v5_body (see
    there for the orientation + single-read analysis;
    scripts/micro_acc_v7.py measures the formulations).  Digits are ints
    in [-128, 128] (bf16-exact); accumulation is f32, integer-exact while
    n*128 < 2^24 (_v6_exact_n guards the dispatch), so the digit sums are
    the same exact integers v3 accumulates in i32 and the shared
    _v3_finalize_into reconstruction is bit-identical
    (tests/test_grid.py::test_v6_matches_v3)."""
    f32, i32 = jnp.float32, jnp.int32
    bf16 = jnp.bfloat16
    lin_c, d0_c, d1_c, ok_c = _v6_quant_cm(
        p_cm, gx=gx, gy=gy, gz=gz, bx=bx, by=by, bz=bz,
        inv_xy=inv_xy, inv_z=inv_z, leaf_xy=leaf_xy, leaf_z=leaf_z,
    )

    # bounds + NaN + external mask fold into the one-hot lane index, so a
    # dropped point's lhs digits contribute nothing
    okm = ok_c & (m_row != 0.0)                       # (1, B)
    v_row = jnp.where(okm, lin_c & 127, -1)           # (1, B)
    iota_sub = jax.lax.broadcasted_iota(i32, (128, block), 0)
    Vt = (iota_sub == v_row).astype(bf16)             # (128, B) rhs^T

    u_row = jax.lax.shift_right_arithmetic(lin_c, jnp.int32(7))  # (1, B)
    iota_s = jax.lax.broadcasted_iota(i32, (w1, block), 0)
    eq = iota_s == u_row                              # (w1, B)
    digs = [
        d0_c[0:1], d1_c[0:1],
        d0_c[1:2], d1_c[1:2],
        d0_c[2:3], d1_c[2:3],
        okm.astype(i32),
    ]
    lhs = jnp.concatenate(
        [jnp.where(eq, d, 0).astype(bf16) for d in digs], axis=0
    )                                                 # (7*w1, B)
    acc = jax.lax.dot_general(
        lhs, Vt, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).reshape((1,) * len(lead) + (7, w1, 128))

    @pl.when(first)
    def _():
        acc_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[...] = acc_ref[...] + acc


def _acc_kernel_v6(
    pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    b = pl.program_id(0)
    _acc_v6_body(
        pcm_ref[...], msk_ref[...], acc_ref, (), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[...] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, 0] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, 0] = npts_ref[0, 0] + blk

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        _v3_finalize_into(
            out_ref, acc_ref, (), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
        )


def _acc_kernel_v6_stacked(
    pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v6_body(
        pcm_ref[0], msk_ref[0], acc_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk

    @pl.when(b == pl.num_programs(1) - 1)
    def _():
        _v3_finalize_into(
            out_ref, acc_ref, (0,), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
        )


def _v6_kernel_params(scene, leaf_xy, leaf_z):
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    return dict(
        gx=gx, gy=gy, gz=gz, w1=w1,
        inv_xy=float(1.0 / leaf_xy), inv_z=float(1.0 / leaf_z),
        leaf_xy=float(leaf_xy), leaf_z=float(leaf_z),
        bx=math.floor(scene.x_min / leaf_xy),
        by=math.floor(scene.y_min / leaf_xy),
        bz=math.floor(scene.z_min / leaf_z),
    ), n_cells, w1


def _accumulate_pallas_v6(
    points: jnp.ndarray,   # (N, 3) f32 RAW frame points
    mask: jnp.ndarray,     # (N,) or (N, 1) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
    points_cm: jnp.ndarray | None = None,  # optional pre-staged (3, N) copy
) -> jnp.ndarray:
    """((4, n_cells) channel-major accumulator, scalar valid-point count)
    via the MXU-natural EXACT kernel — bit-identical outputs to
    _accumulate_pallas_v3 (same two-balanced-digit quantization, same
    finalize).  Requires _v3_leaf_ok AND _v6_exact_n; the caller falls back
    to the i32-accumulating v3 beyond either bound.  Single-read: only the
    channel-major (3, N) view is consumed (see _accumulate_pallas_v5)."""
    block = _cap_block_v5(block, points.shape[0])
    kw, n_cells, w1 = _v6_kernel_params(scene, leaf_xy, leaf_z)
    n = points.shape[0]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 0, 1)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v6, block=block, **kw),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((3, block), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((7, w1, 128), jnp.float32)],
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(1, n),
    )
    return out.reshape(4, w1 * 128)[:, :n_cells], npts[0, 0]


def _accumulate_pallas_v6_stacked(
    points: jnp.ndarray,   # (S, N, 3) f32 RAW stacked frame points
    mask: jnp.ndarray,     # (S, N) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
    points_cm: jnp.ndarray | None = None,  # optional pre-staged (S, 3, N)
) -> jnp.ndarray:
    """(S, 4, n_cells) stacked MXU-natural EXACT accumulators in ONE kernel
    call; per-frame results bit-identical to _accumulate_pallas_v3_stacked
    (and so to the per-frame v3/v6).  Drop-in for the hoisted-accumulate
    scan in bind_env_multi's voxel_quant="exact" branch.  Single-read: only
    the channel-major (S, 3, N) view is consumed (see
    _accumulate_pallas_v5_stacked)."""
    block = _cap_block_v5(block, points.shape[1])
    kw, n_cells, w1 = _v6_kernel_params(scene, leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v6_stacked, block=block, **kw),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, 3, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 7, w1, 128), jnp.float32)],
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, 1, n),
    )
    return out.reshape(s, 4, w1 * 128)[:, :, :n_cells], npts[0]


def _acc_kernel_v5_stacked_raw(
    pcm_ref, msk_ref, out_ref, npts_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    """v5 stacked WITHOUT in-kernel finalize: emits the raw (4, w1, 128) f32
    digit accumulator per frame.  Space-sharded deployments psum the exact
    integer digit sums and finalize ONCE (finalize_fast_digits) — psumming
    finalized grids would reassociate the f32 finalize rounding and make
    results depend on the shard factor (VERDICT r4 #2)."""
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v5_body(
        pcm_ref[0], msk_ref[0], out_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk


def _acc_kernel_v6_stacked_raw(
    pcm_ref, msk_ref, out_ref, npts_ref, *, block, gx, gy,
    gz, w1, inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    """v6 stacked without in-kernel finalize: raw (7, w1, 128) f32 digit
    accumulator per frame (see _acc_kernel_v5_stacked_raw)."""
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v6_body(
        pcm_ref[0], msk_ref[0], out_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk


def _accumulate_pallas_v5_stacked_raw(
    points, mask, scene, leaf_xy, leaf_z, block,
    interpret: bool = False, points_cm=None,
):
    """((S, 4, w1, 128) raw f32 digit sums, (S,) counts) — the stacked v5
    accumulate WITHOUT finalize.  Exact integers while n*127 < 2^24 over the
    GLOBAL point count (psum included); finalize_fast_digits reconstructs the
    (S, 4, n_cells) accumulator bit-identically to the in-kernel finalize."""
    block = _cap_block_v5(block, points.shape[1])
    kw, n_cells, w1 = _v5_kernel_params(scene, leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v5_stacked_raw, block=block, **kw),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, 3, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, 1, n),
    )
    return out, npts[0]


def _accumulate_pallas_v6_stacked_raw(
    points, mask, scene, leaf_xy, leaf_z, block,
    interpret: bool = False, points_cm=None,
):
    """((S, 7, w1, 128) raw f32 digit sums, (S,) counts) — stacked v6 without
    finalize (exact integers while n*128 < 2^24 globally); see
    finalize_exact_digits."""
    block = _cap_block_v5(block, points.shape[1])
    kw, n_cells, w1 = _v6_kernel_params(scene, leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]
    if points_cm is None:
        points_cm = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    out, npts = pl.pallas_call(
        functools.partial(_acc_kernel_v6_stacked_raw, block=block, **kw),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, 3, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block), lambda si, b: (si, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 7, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 7, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        interpret=interpret,
    )(
        points_cm.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, 1, n),
    )
    return out, npts[0]


def _acc_kernel_v4_stacked_raw(
    pts_ref, msk_ref, out_ref, npts_ref, *, block, gx, gy, gz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz, kx, kz
):
    """v4 stacked without finalize: raw (4, w1, 128) i32 digit accumulator
    per frame (exact at ANY point count — i32 psum; the beyond-bound
    fallback of the raw v5)."""
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v4_body(
        pts_ref[0], msk_ref[0], out_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk


def _acc_kernel_v3_stacked_raw(
    pts_ref, msk_ref, out_ref, npts_ref, *, block, gx, gy, gz, gyz, w1,
    inv_xy, inv_z, leaf_xy, leaf_z, bx, by, bz
):
    """v3 stacked without finalize: raw (7, w1, 128) i32 digit accumulator
    per frame (exact at any point count; beyond-bound fallback of raw v6)."""
    si = pl.program_id(0)
    b = pl.program_id(1)
    _acc_v3_body(
        pts_ref[0], msk_ref[0], out_ref, (0,), b == 0,
        block=block, gx=gx, gy=gy, gz=gz, w1=w1, inv_xy=inv_xy, inv_z=inv_z,
        leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz,
    )
    blk = jnp.sum((msk_ref[0] != 0.0).astype(jnp.int32))

    @pl.when(b == 0)
    def _():
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        npts_ref[0, si] = npts_ref[0, si] + blk


def _accumulate_pallas_v4_stacked_raw(
    points, mask, scene, leaf_xy, leaf_z, block, interpret: bool = False,
):
    """((S, 4, w1, 128) raw i32 digit sums, (S,) counts) — v4 without
    finalize.  Bit-identical digit sums to the raw v5 (finalize with
    finalize_fast_digits)."""
    block = _cap_block(block, points.shape[1])
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    s, n = points.shape[0], points.shape[1]

    out, npts = pl.pallas_call(
        functools.partial(
            _acc_kernel_v4_stacked_raw,
            block=block, gx=gx, gy=gy, gz=gz, w1=w1,
            inv_xy=float(1.0 / leaf_xy), inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy), leaf_z=float(leaf_z),
            bx=math.floor(scene.x_min / leaf_xy),
            by=math.floor(scene.y_min / leaf_xy),
            bz=math.floor(scene.z_min / leaf_z),
            kx=kx, kz=kz,
        ),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, block, 3), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block, 1), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, n, 1),
    )
    return out, npts[0]


def _accumulate_pallas_v3_stacked_raw(
    points, mask, scene, leaf_xy, leaf_z, block, interpret: bool = False,
):
    """((S, 7, w1, 128) raw i32 digit sums, (S,) counts) — v3 without
    finalize (finalize with finalize_exact_digits)."""
    block = _cap_block(block, points.shape[1])
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    s, n = points.shape[0], points.shape[1]

    out, npts = pl.pallas_call(
        functools.partial(
            _acc_kernel_v3_stacked_raw,
            block=block, gx=gx, gy=gy, gz=gz, gyz=gy * gz, w1=w1,
            inv_xy=float(1.0 / leaf_xy), inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy), leaf_z=float(leaf_z),
            bx=math.floor(scene.x_min / leaf_xy),
            by=math.floor(scene.y_min / leaf_xy),
            bz=math.floor(scene.z_min / leaf_z),
        ),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, block, 3), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block, 1), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 7, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 7, w1, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, n, 1),
    )
    return out, npts[0]


def _finalize_grid_coords(gx, gy, w1, scene, leaf_xy, leaf_z):
    """The (w1, 128) cell-center planes of the in-kernel finalize, as jnp —
    SAME integer decomposition and f32 products as _v4_finalize_into /
    _v3_finalize_into, so downstream elementwise math is bit-identical."""
    f32, i32 = jnp.float32, jnp.int32
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    u = jax.lax.broadcasted_iota(i32, (w1, 128), 0)
    v = jax.lax.broadcasted_iota(i32, (w1, 128), 1)
    lin = 128 * u + v
    ix = lin % gx
    iyz = lin // gx
    iy = iyz % gy
    iz = iyz // gy
    cx = (bx + ix).astype(f32) * f32(leaf_xy)
    cy = (by + iy).astype(f32) * f32(leaf_xy)
    cz = (bz + iz).astype(f32) * f32(leaf_z)
    return cx, cy, cz


def finalize_fast_digits(acc, scene, leaf_xy, leaf_z):
    """(..., 4, w1, 128) raw single-digit sums (v4/v5 scheme) ->
    (..., 4, n_cells) f32 accumulator, mirroring _v4_finalize_into's f32
    ops exactly."""
    f32 = jnp.float32
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = acc.shape[-2]
    kx, kz = _v4_shifts(leaf_xy, leaf_z)
    cx, cy, cz = _finalize_grid_coords(gx, gy, w1, scene, leaf_xy, leaf_z)
    cnt = acc[..., 3, :, :].astype(f32)
    sx = cnt * (cx + f32(0.5 * leaf_xy)) + acc[..., 0, :, :].astype(f32) * f32(2.0**-kx)
    sy = cnt * (cy + f32(0.5 * leaf_xy)) + acc[..., 1, :, :].astype(f32) * f32(2.0**-kx)
    sz = cnt * (cz + f32(0.5 * leaf_z)) + acc[..., 2, :, :].astype(f32) * f32(2.0**-kz)
    out = jnp.stack([sx, sy, sz, cnt], axis=-3)
    return out.reshape(out.shape[:-2] + (w1 * 128,))[..., :n_cells]


def finalize_exact_digits(acc, scene, leaf_xy, leaf_z):
    """(..., 7, w1, 128) raw two-digit sums (v3/v6 scheme) ->
    (..., 4, n_cells) f32 accumulator, mirroring _v3_finalize_into's f32
    ops exactly."""
    f32 = jnp.float32
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = acc.shape[-2]
    cx, cy, cz = _finalize_grid_coords(gx, gy, w1, scene, leaf_xy, leaf_z)
    inv_xyq = f32(1.0 / (1 << _FXP_XY))
    inv_zq = f32(1.0 / (1 << _FXP_Z))
    a = acc.astype(f32)
    cnt = a[..., 6, :, :]
    sx = cnt * (cx + f32(0.5 * leaf_xy)) + (a[..., 0, :, :] + 256.0 * a[..., 1, :, :]) * inv_xyq
    sy = cnt * (cy + f32(0.5 * leaf_xy)) + (a[..., 2, :, :] + 256.0 * a[..., 3, :, :]) * inv_xyq
    sz = cnt * (cz + f32(0.5 * leaf_z)) + (a[..., 4, :, :] + 256.0 * a[..., 5, :, :]) * inv_zq
    out = jnp.stack([sx, sy, sz, cnt], axis=-3)
    return out.reshape(out.shape[:-2] + (w1 * 128,))[..., :n_cells]


def _accumulate_pallas_v3_stacked(
    points: jnp.ndarray,   # (S, N, 3) f32 RAW stacked frame points
    mask: jnp.ndarray,     # (S, N) validity; nonzero = keep
    scene: SceneBounds,
    leaf_xy: float,
    leaf_z: float,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """((S, 4, n_cells) channel-major accumulators, (S,) valid-point
    counts) for a whole frame stack in ONE kernel call (see
    _acc_kernel_v3_stacked).  Per-frame results are bit-identical to
    _accumulate_pallas_v3.

    Consumed by bind_env_multi (voxel_quant="exact"): hoisting the whole
    dispatch's accumulation out of the scan pays the (S, N, 3) operand's
    tiled->linear relayout once instead of ~90 us of slice+copy per scan
    iteration.  Parity is pinned by
    tests/test_grid.py::test_stacked_accumulator_bit_identical.

    NB: the stacked grid double-buffers input blocks across the frame
    boundary too — block=4096 exceeds the 16 MB scoped-VMEM limit here
    (18.5 MB measured) even though the single-frame kernel fits; cap at
    2048."""
    block = _cap_block(block, points.shape[1])
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    n_cells = gx * gy * gz
    w1 = -(-n_cells // 128)
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    s, n = points.shape[0], points.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _acc_kernel_v3_stacked,
            block=block,
            gx=gx,
            gy=gy,
            gz=gz,
            gyz=gy * gz,
            w1=w1,
            inv_xy=float(1.0 / leaf_xy),
            inv_z=float(1.0 / leaf_z),
            leaf_xy=float(leaf_xy),
            leaf_z=float(leaf_z),
            bx=bx,
            by=by,
            bz=bz,
        ),
        grid=(s, n // block),
        in_specs=[
            pl.BlockSpec(
                (1, block, 3), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block, 1), lambda si, b: (si, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # whole (1, S) row resident; frame si writes its own column
            pl.BlockSpec((1, s), lambda si, b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s, 4, w1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, 7, w1, 128), jnp.int32)],
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        mask.astype(jnp.float32).reshape(s, n, 1),
    )

    out, npts = out
    return out.reshape(s, 4, w1 * 128)[:, :, :n_cells], npts[0]


def _accumulate_pallas(
    points: jnp.ndarray,
    ix: jnp.ndarray,
    iyz: jnp.ndarray,
    in_bounds: jnp.ndarray,
    gx: int,
    gyz: int,
    block: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(n_cells, 4) accumulator via the fused kernel.  Channel order:
    3 bf16 summands per coordinate + the count."""
    n = points.shape[0]
    w = in_bounds.astype(jnp.float32)
    p32 = points.astype(jnp.float32) * w[:, None]
    cols = []
    for c in range(3):
        h1, h2, h3 = _split3_bf16(p32[:, c])
        cols += [h1.astype(jnp.float32), h2.astype(jnp.float32), h3.astype(jnp.float32)]
    cols.append(w)
    vals = jnp.stack(cols, axis=1)                   # (N, 10) f32
    nch = 10

    grid = n // block
    out = pl.pallas_call(
        functools.partial(_acc_kernel, block=block, gx=gx, gyz=gyz, nch=nch),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nch), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nch, gyz, gx), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nch, gyz, gx), jnp.float32),
        interpret=interpret,
    )(ix[:, None], iyz[:, None], vals)

    sx = out[0] + out[1] + out[2]
    sy = out[3] + out[4] + out[5]
    sz = out[6] + out[7] + out[8]
    acc = jnp.stack([sx, sy, sz, out[9]], axis=0)    # (4, gyz, gx)
    return acc.reshape(4, gyz * gx)


def finalize_dense(
    acc: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(n_cells, 4) accumulator -> ((n_cells, 3) centroids, occupancy, count).
    Compatibility layout; the pipeline uses finalize_dense_cm."""
    occ = acc[:, 3] > 0
    cent = acc[:, :3] / jnp.maximum(acc[:, 3:4], 1.0)
    return cent, occ, occ.sum()


def finalize_dense_cm(
    acc_cm: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CHANNEL-MAJOR finalize: (4, n_cells) accumulator -> ((3, n_cells)
    centroids, (n_cells,) occupancy, count).  No compaction: grid-mode
    clustering consumes the dense layout directly (cell index IS the point
    index, ascending lin = PCL's output order).  Row slices of the channel-
    major layout are free, unlike (n, 3) column slices (minor-dim relayout,
    ~0.25 ms each on this TPU)."""
    occ = acc_cm[3] > 0
    cent = acc_cm[:3] / jnp.maximum(acc_cm[3][None, :], 1.0)
    return cent, occ, occ.sum()
