"""Microbench: v4 one-hot accumulator vs transpose-free v5 candidates.

Hypothesis (round 4): the v4 dots contract dim 0 of the (block, w1) lhs and
(block, 128) rhs — the MXU-unnatural orientation — so Mosaic inserts a
sublane<->lane relayout of each operand per dot (52 blocks x 4 channels =
208 relayouts/frame), and THAT, not the MACs, is the ~53 us/channel cost
(587M MACs/channel/frame = ~0.01% MXU utilization as measured).

Candidates build both operands natively in the MXU orientation
C[m,n] = sum_k A[m,k] B[k,n] (lhs contraction on lanes, rhs on sublanes) by
reading the block twice — once row-major (N, 3) for the v-onehot rhs
(B, 128), once channel-major (3, N) for the digit-carrying lhs (43+, B):

  v5-int8-4dot : natural orientation, int8 operands, 4 dots (one/channel)
  v5-bf16-4dot : natural orientation, bf16 operands (digits <= 127 are
                 bf16-exact; block sums <= 2048*127 < 2^24 are f32-exact)
  v5-bf16-1dot : all 4 channels stacked into ONE (4*w1, B) lhs -> one dot
  v4-bf16      : ORIGINAL orientation but bf16 operands (isolates dtype)

Usage: python scripts/micro_acc_v5.py [S]
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _bench_config
from multiple_object_tracking_lidar_tpu.ops import voxel_grid as vg
from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape

I32 = jnp.int32
F32 = jnp.float32


def _consts(scene, leaf_xy, leaf_z):
    gx, gy, gz = grid_shape(scene, leaf_xy, leaf_z)
    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    bz = math.floor(scene.z_min / leaf_z)
    kx, kz = vg._v4_shifts(leaf_xy, leaf_z)
    w1 = -(-(gx * gy * gz) // 128)
    return gx, gy, gz, bx, by, bz, kx, kz, w1


def _rm_quant(p, *, gx, gy, gz, bx, by, bz, kx, kz, inv_xy, inv_z,
              leaf_xy, leaf_z):
    """(B, 3) row-major block -> (lin (B,1), fq (B,3), ok (B,1))."""
    lane3 = jax.lax.broadcasted_iota(I32, p.shape, 1)
    inv3 = jnp.where(lane3 == 2, inv_z, inv_xy).astype(F32)
    b3 = jnp.where(lane3 == 0, bx, jnp.where(lane3 == 1, by, bz)).astype(I32)
    g3 = jnp.where(lane3 == 0, gx, jnp.where(lane3 == 1, gy, gz)).astype(I32)
    i3 = jnp.floor(p * inv3).astype(I32) - b3
    ok3 = (i3 >= 0) & (i3 < g3) & (p == p)
    ok = jnp.all(ok3, axis=1, keepdims=True)
    lin = i3[:, 0:1] + gx * (i3[:, 1:2] + gy * i3[:, 2:3])
    lin = jnp.where(ok, lin, -1)
    leaf3 = jnp.where(lane3 == 2, leaf_z, leaf_xy).astype(F32)
    s3 = jnp.where(lane3 == 2, float(2.0 ** kz), float(2.0 ** kx)).astype(F32)
    cell0 = (i3 + b3).astype(F32) * leaf3
    frac = p - cell0 - 0.5 * leaf3
    fq = jnp.clip(jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(I32), -127, 127)
    return lin, fq, ok


def _cm_quant(pc, *, gx, gy, gz, bx, by, bz, kx, kz, inv_xy, inv_z,
              leaf_xy, leaf_z):
    """(3, B) channel-major block -> (lin (1,B), fq (3,B), ok (1,B))."""
    row3 = jax.lax.broadcasted_iota(I32, pc.shape, 0)
    inv3 = jnp.where(row3 == 2, inv_z, inv_xy).astype(F32)
    b3 = jnp.where(row3 == 0, bx, jnp.where(row3 == 1, by, bz)).astype(I32)
    g3 = jnp.where(row3 == 0, gx, jnp.where(row3 == 1, gy, gz)).astype(I32)
    i3 = jnp.floor(pc * inv3).astype(I32) - b3
    ok3 = (i3 >= 0) & (i3 < g3) & (pc == pc)
    ok = jnp.all(ok3, axis=0, keepdims=True)
    lin = i3[0:1] + gx * (i3[1:2] + gy * i3[2:3])
    lin = jnp.where(ok, lin, -1)
    leaf3 = jnp.where(row3 == 2, leaf_z, leaf_xy).astype(F32)
    s3 = jnp.where(row3 == 2, float(2.0 ** kz), float(2.0 ** kx)).astype(F32)
    cell0 = (i3 + b3).astype(F32) * leaf3
    frac = pc - cell0 - 0.5 * leaf3
    fq = jnp.clip(jnp.round(jnp.where(ok, frac, 0.0) * s3).astype(I32), -127, 127)
    return lin, fq, ok


def _k_v5(prm_ref, pcm_ref, out_ref, *, block, w1, dt, one_dot, kw):
    b = pl.program_id(0)
    lin_c, fq_c, ok_c = _cm_quant(pcm_ref[...], **kw)          # rows (1/3, B)
    lin_r, _, _ = _rm_quant(prm_ref[...], **kw)                # cols (B, 1)

    u_row = jax.lax.shift_right_arithmetic(lin_c, jnp.int32(7))  # (1, B)
    v_col = lin_r & 127                                          # (B, 1)
    v_col = jnp.where(lin_r >= 0, v_col, -1)

    iota_l = jax.lax.broadcasted_iota(I32, (block, 128), 1)
    V = (v_col == iota_l).astype(dt)                             # (B, 128)

    iota_s = jax.lax.broadcasted_iota(I32, (w1, block), 0)
    eq = iota_s == u_row                                         # (w1, B)
    digs = [fq_c[0:1], fq_c[1:2], fq_c[2:3], ok_c.astype(I32)]
    if one_dot:
        lhs = jnp.concatenate(
            [jnp.where(eq, d, 0).astype(dt) for d in digs], axis=0
        )                                                        # (4*w1, B)
        acc = jax.lax.dot_general(
            lhs, V, (((1,), (0,)), ((), ())),
            preferred_element_type=I32 if dt == jnp.int8 else F32,
        )                                                        # (4*w1, 128)
        accs = [acc[c * w1:(c + 1) * w1] for c in range(4)]
    else:
        accs = []
        for d in digs:
            lhs = jnp.where(eq, d, 0).astype(dt)
            accs.append(
                jax.lax.dot_general(
                    lhs, V, (((1,), (0,)), ((), ())),
                    preferred_element_type=I32 if dt == jnp.int8 else F32,
                )
            )
    for c in range(4):
        a = accs[c].astype(F32)

        @pl.when(b == 0)
        def _():
            out_ref[c] = a

        @pl.when(b > 0)
        def _():
            out_ref[c] = out_ref[c] + a


def _k_v4bf16(pts_ref, out_ref, *, block, w1, kw):
    b = pl.program_id(0)
    lin, fq, ok = _rm_quant(pts_ref[...], **kw)
    u = jax.lax.shift_right_arithmetic(lin, jnp.int32(7))
    v = lin & 127
    v = jnp.where(lin >= 0, v, -1)
    iota_u = jax.lax.broadcasted_iota(I32, (block, w1), 1)
    iota_v = jax.lax.broadcasted_iota(I32, (block, 128), 1)
    U = (u == iota_u).astype(I32)
    V = (v == iota_v).astype(jnp.bfloat16)
    digs = [fq[:, 0:1], fq[:, 1:2], fq[:, 2:3], ok.astype(I32)]
    for c in range(4):
        Xc = (U * digs[c]).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            Xc, V, (((0,), (0,)), ((), ())), preferred_element_type=F32
        )

        @pl.when(b == 0)
        def _():
            out_ref[c] = acc

        @pl.when(b > 0)
        def _():
            out_ref[c] = out_ref[c] + acc


def make_v5(scene, leaf_xy, leaf_z, n, block, dt, one_dot):
    gx, gy, gz, bx, by, bz, kx, kz, w1 = _consts(scene, leaf_xy, leaf_z)
    kw = dict(gx=gx, gy=gy, gz=gz, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
              inv_xy=1.0 / leaf_xy, inv_z=1.0 / leaf_z,
              leaf_xy=leaf_xy, leaf_z=leaf_z)

    def run(pts_rm, pts_cm):
        return pl.pallas_call(
            functools.partial(
                _k_v5, block=block, w1=w1, dt=dt, one_dot=one_dot, kw=kw
            ),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((block, 3), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4, w1, 128), F32),
        )(pts_rm, pts_cm)

    return run


def make_v4bf16(scene, leaf_xy, leaf_z, n, block):
    gx, gy, gz, bx, by, bz, kx, kz, w1 = _consts(scene, leaf_xy, leaf_z)
    kw = dict(gx=gx, gy=gy, gz=gz, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
              inv_xy=1.0 / leaf_xy, inv_z=1.0 / leaf_z,
              leaf_xy=leaf_xy, leaf_z=leaf_z)

    def run(pts_rm, pts_cm):
        return pl.pallas_call(
            functools.partial(_k_v4bf16, block=block, w1=w1, kw=kw),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((block, 3), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, w1, 128), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4, w1, 128), F32),
        )(pts_rm)

    return run


def _k_v5_stacked(prm_ref, pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *,
                  block, w1, dt, kw, gx, gy, leaf_xy, leaf_z, bx, by, bz,
                  kx, kz):
    si = pl.program_id(0)
    b = pl.program_id(1)
    lin_c, fq_c, ok_c = _cm_quant(pcm_ref[0], **kw)            # rows (1/3, B)
    lin_r, _, _ = _rm_quant(prm_ref[0], **kw)                  # cols (B, 1)

    u_row = jax.lax.shift_right_arithmetic(lin_c, jnp.int32(7))  # (1, B)
    v_col = jnp.where((lin_r >= 0) & (msk_ref[0] != 0.0), lin_r & 127, -1)

    iota_l = jax.lax.broadcasted_iota(I32, (block, 128), 1)
    V = (v_col == iota_l).astype(dt)                             # (B, 128)

    iota_s = jax.lax.broadcasted_iota(I32, (w1, block), 0)
    eq = iota_s == u_row                                         # (w1, B)
    digs = [fq_c[0:1], fq_c[1:2], fq_c[2:3], ok_c.astype(I32)]
    lhs = jnp.concatenate(
        [jnp.where(eq, d, 0).astype(dt) for d in digs], axis=0
    )                                                            # (4*w1, B)
    acc = jax.lax.dot_general(
        lhs, V, (((1,), (0,)), ((), ())),
        preferred_element_type=I32 if dt == jnp.int8 else F32,
    ).reshape(1, 4, w1, 128)

    blk = jnp.sum((msk_ref[0] != 0.0).astype(I32))

    @pl.when(b == 0)
    def _():
        acc_ref[...] = acc
        npts_ref[0, si] = blk

    @pl.when(b > 0)
    def _():
        acc_ref[...] = acc_ref[...] + acc
        npts_ref[0, si] = npts_ref[0, si] + blk

    @pl.when(b == pl.num_programs(1) - 1)
    def _():
        # finalize: digit sums -> f32 [sum_x, sum_y, sum_z, count] (same math
        # as vg._v4_finalize_into, acc already f32)
        u = jax.lax.broadcasted_iota(I32, (w1, 128), 0)
        v = jax.lax.broadcasted_iota(I32, (w1, 128), 1)
        lin = 128 * u + v
        ix = lin % gx
        iyz = lin // gx
        iy = iyz % gy
        iz = iyz // gy
        cx = (bx + ix).astype(F32) * F32(leaf_xy)
        cy = (by + iy).astype(F32) * F32(leaf_xy)
        cz = (bz + iz).astype(F32) * F32(leaf_z)
        inv_xyq = F32(2.0 ** -kx)
        inv_zq = F32(2.0 ** -kz)
        cnt = acc_ref[0, 3].astype(F32)
        out_ref[0, 0] = cnt * (cx + 0.5 * F32(leaf_xy)) + acc_ref[0, 0].astype(F32) * inv_xyq
        out_ref[0, 1] = cnt * (cy + 0.5 * F32(leaf_xy)) + acc_ref[0, 1].astype(F32) * inv_xyq
        out_ref[0, 2] = cnt * (cz + 0.5 * F32(leaf_z)) + acc_ref[0, 2].astype(F32) * inv_zq
        out_ref[0, 3] = cnt


def make_v5_stacked(scene, leaf_xy, leaf_z, s, n, block, dt):
    gx, gy, gz, bx, by, bz, kx, kz, w1 = _consts(scene, leaf_xy, leaf_z)
    kw = dict(gx=gx, gy=gy, gz=gz, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
              inv_xy=1.0 / leaf_xy, inv_z=1.0 / leaf_z,
              leaf_xy=leaf_xy, leaf_z=leaf_z)
    adt = I32 if dt == jnp.int8 else F32

    def run(pts_rm, pts_cm, mask):
        out, npts = pl.pallas_call(
            functools.partial(
                _k_v5_stacked, block=block, w1=w1, dt=dt, kw=kw,
                gx=gx, gy=gy, leaf_xy=leaf_xy, leaf_z=leaf_z,
                bx=bx, by=by, bz=bz, kx=kx, kz=kz,
            ),
            grid=(s, n // block),
            in_specs=[
                pl.BlockSpec((1, block, 3), lambda si, b: (si, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, block), lambda si, b: (si, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, 1), lambda si, b: (si, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 4, w1, 128), lambda si, b: (si, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s), lambda si, b: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((s, 4, w1, 128), F32),
                jax.ShapeDtypeStruct((1, s), I32),
            ),
            scratch_shapes=[pltpu.VMEM((1, 4, w1, 128), adt)],
        )(pts_rm, pts_cm, mask.astype(F32).reshape(s, n, 1))
        return out

    return run


def main() -> None:
    np.asarray(jnp.zeros((), jnp.int32) + 1)  # force streaming mode

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    cfg = _bench_config()
    leaf, leaf_z, scene = cfg.voxel_leaf_size, cfg.leaf_z, cfg.scene
    n = cfg.caps.n_max_points
    rng = np.random.default_rng(0)
    pts = np.stack(
        [
            rng.uniform(-2.2, 2.2, (S, n)),
            rng.uniform(-1.3, 9.2, (S, n)),
            rng.uniform(0.0, 1.0, (S, n)),
        ],
        axis=2,
    ).astype(np.float32)
    frames_rm = jax.device_put(jnp.asarray(pts))
    frames_cm = jax.device_put(jnp.asarray(np.swapaxes(pts, 1, 2).copy()))
    mask = jax.device_put(jnp.ones((n,), bool))
    gx, gy, gz = grid_shape(scene, leaf, leaf_z)
    print(f"S={S} n={n} grid=({gx},{gy},{gz}) cells={gx*gy*gz}")

    def chain(accfn):
        def run(frames_rm, frames_cm):
            def body(c, fr):
                acc = accfn(fr[0], fr[1])
                return c + acc[3, ::7].sum(), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), (frames_rm, frames_cm))
            return c

        return jax.jit(run)

    variants = {
        "v4-int8 (baseline)": lambda rm, cm: vg._accumulate_pallas_v4(
            rm, mask, scene, leaf, leaf_z, 2048
        )[0].reshape(4, -1, 128),
        "v4-bf16           ": make_v4bf16(scene, leaf, leaf_z, n, 2048),
        "v5-int8-4dot      ": make_v5(scene, leaf, leaf_z, n, 2048, jnp.int8, False),
        "v5-bf16-4dot      ": make_v5(scene, leaf, leaf_z, n, 2048, jnp.bfloat16, False),
        "v5-bf16-1dot      ": make_v5(scene, leaf, leaf_z, n, 2048, jnp.bfloat16, True),
        "v5-bf16-1dot b4096": make_v5(scene, leaf, leaf_z, n, 4096, jnp.bfloat16, True),
        "v5-bf16-1dot b1024": make_v5(scene, leaf, leaf_z, n, 1024, jnp.bfloat16, True),
    }

    # --- stacked (one-dispatch) comparison: shipped v4 vs v5 prototype,
    # with the bench's PINNED standard layouts (major_to_minor=(0,1,2)) ---
    from jax.experimental import layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    fmt3 = layout.Format(layout.Layout(major_to_minor=(0, 1, 2)),
                         SingleDeviceSharding(dev))
    fmt2 = layout.Format(layout.Layout(major_to_minor=(0, 1)),
                         SingleDeviceSharding(dev))
    frames_rm_p = jax.device_put(jnp.asarray(pts), fmt3)
    frames_cm_p = jax.device_put(
        jnp.asarray(np.ascontiguousarray(np.swapaxes(pts, 1, 2))), fmt3
    )
    mask_sf = jax.device_put(np.ones((S, n), np.float32), fmt2)

    def time_stacked(name, fn, *args):
        try:
            f = jax.jit(fn)
            out = f(*args)
            np.asarray(out[-1, 3, ::7])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(*args)
                np.asarray(out[-1, 3, ::7])
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: {best / S * 1e6:8.1f} us/frame (stacked)")
            return out
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:300]}")
            return None

    o4 = time_stacked(
        "v4-stacked shipped",
        lambda rm, m: vg._accumulate_pallas_v4_stacked(
            rm, m, scene, leaf, leaf_z, 2048
        )[0],
        frames_rm_p, mask_sf,
    )
    for blk in (2048, 4096):
        if n % blk:
            continue
        o5 = time_stacked(
            f"v5-stacked bf16 b{blk}",
            make_v5_stacked(scene, leaf, leaf_z, S, n, blk, jnp.bfloat16),
            frames_rm_p, frames_cm_p, mask_sf,
        )
        if o4 is not None and o5 is not None:
            a4 = np.asarray(o4).astype(np.float64)
            a5 = np.asarray(o5).reshape(S, 4, -1)[:, :, : a4.shape[2]].astype(np.float64)
            print(f"   maxdiff vs shipped v4: {np.abs(a4 - a5).max():.3e}")

    ref = None
    for name, fn in variants.items():
        try:
            f = chain(fn)
            c = f(frames_rm, frames_cm)
            np.asarray(c)  # warm + fetch
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = f(frames_rm, frames_cm)
                np.asarray(c)
                best = min(best, time.perf_counter() - t0)
            out = np.asarray(
                jax.jit(lambda rm, cm, fn=fn: fn(rm, cm))(frames_rm[0], frames_cm[0])
            ).astype(np.float64)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = np.abs(out - ref).max()
            print(f"{name}: {best / S * 1e6:8.1f} us/frame  maxdiff_vs_v4={err:.3e}")
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:300]}")


if __name__ == "__main__":
    main()
