"""Microbench: v5's dual-orientation read vs single-read candidates (v7).

Round-4 trace finding (docs/PERFORMANCE.md): the shipped v5/v6 kernels take
BOTH a row-major (S, N, 3) and a channel-major (S, 3, N) view of the point
ring.  The ring exists once (channel-planes layout), so XLA materializes the
row-major operand with a ~9.8 MB {1,0,2}->{2,1,0} copy per dispatch
(~15 GB/s pathological 12-byte rows = ~0.64 ms) plus an (S, N, 1) mask
relayout — together bigger than the accumulate kernel itself.  The row-major
read exists ONLY to get the one-hot lane index v = lin & 127 in the (B, 1)
sublane orientation (and the mask).  Candidates that drop it:

  v7-transpose : quantize once from the channel-major read; transpose the
                 single (1, B) i32 masked-lane-index vector to (B, 1)
                 in-register (Mosaic lowers jnp.transpose on this shape —
                 scripts/micro_transpose.py) and build the (B, 128) one-hot
                 from it.  8 KB of relayout per block vs 24 KB of duplicate
                 HBM read + the XLA-level MB-scale copies.
  v7-dotT      : build the TRANSPOSED one-hot (128, B) natively (sublane
                 iota == lane-oriented v) and ask dot_general to contract
                 dim 1 of both operands — measures what Mosaic charges for
                 the rhs-side relayout it must insert.

All candidates take ONE (S, 3, N) ring + an (S, N) mask and must be
bit-identical to the shipped v5 chain that derives the row-major view
in-graph (exactly what tracker/pipeline.py does today).

Usage: python scripts/micro_acc_v7.py [S]
"""

from __future__ import annotations

import functools
import glob
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _bench_config
from multiple_object_tracking_lidar_tpu.ops import voxel_grid as vg

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16


def _k_v7_stacked(pcm_ref, msk_ref, out_ref, npts_ref, acc_ref, *, block, w1,
                  mode, gx, gy, leaf_xy, leaf_z, bx, by, bz, kx, kz, kw):
    si = pl.program_id(0)
    b = pl.program_id(1)
    lin_c, fq_c, ok_c = vg._v5_quant_cm(pcm_ref[0], **kw)        # (1/3, B)
    okm = ok_c & (msk_ref[0] != 0.0)                             # (1, B)
    linm = jnp.where(okm, lin_c, -1)
    u_row = jax.lax.shift_right_arithmetic(linm, jnp.int32(7))   # (1, B)
    v_row = jnp.where(okm, lin_c & 127, -1)                      # (1, B)

    iota_s = jax.lax.broadcasted_iota(I32, (w1, block), 0)
    eq = iota_s == u_row                                         # (w1, B)
    digs = [fq_c[0:1], fq_c[1:2], fq_c[2:3], okm.astype(I32)]
    lhs = jnp.concatenate(
        [jnp.where(eq, d, 0).astype(BF16) for d in digs], axis=0
    )                                                            # (4*w1, B)

    if mode == "transpose":
        v_col = jnp.transpose(v_row, (1, 0))                     # (B, 1)
        iota_l = jax.lax.broadcasted_iota(I32, (block, 128), 1)
        V = (v_col == iota_l).astype(BF16)                       # (B, 128)
        acc = jax.lax.dot_general(
            lhs, V, (((1,), (0,)), ((), ())), preferred_element_type=F32
        ).reshape(1, 4, w1, 128)
    else:  # dotT
        iota_sub = jax.lax.broadcasted_iota(I32, (128, block), 0)
        Vt = (iota_sub == v_row).astype(BF16)                    # (128, B)
        acc = jax.lax.dot_general(
            lhs, Vt, (((1,), (1,)), ((), ())), preferred_element_type=F32
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
        vg._v4_finalize_into(
            out_ref, acc_ref, (0,), gx=gx, gy=gy, w1=w1,
            leaf_xy=leaf_xy, leaf_z=leaf_z, bx=bx, by=by, bz=bz, kx=kx, kz=kz,
        )


def make_v7_stacked(scene, leaf_xy, leaf_z, s, n, block, mode):
    kw, n_cells, w1 = vg._v5_kernel_params(scene, leaf_xy, leaf_z)
    kw = {k: v for k, v in kw.items() if k != "w1"}
    fin = dict(gx=kw["gx"], gy=kw["gy"], leaf_xy=kw["leaf_xy"],
               leaf_z=kw["leaf_z"], bx=kw["bx"], by=kw["by"], bz=kw["bz"],
               kx=kw["kx"], kz=kw["kz"])

    def run(pts_cm, mask):
        out, npts = pl.pallas_call(
            functools.partial(
                _k_v7_stacked, block=block, w1=w1, mode=mode, kw=kw, **fin
            ),
            grid=(s, n // block),
            in_specs=[
                pl.BlockSpec((1, 3, block), lambda si, b: (si, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block), lambda si, b: (si, 0, b),
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
            scratch_shapes=[pltpu.VMEM((1, 4, w1, 128), F32)],
        )(pts_cm, mask.reshape(s, 1, n))
        return out.reshape(s, 4, w1 * 128)[:, :, :n_cells], npts[0]

    return run


def _traced_device_us_per_frame(f, args, s, n_reps=3):
    vals = []
    for _ in range(n_reps):
        logdir = tempfile.mkdtemp(prefix="motl_micro_trace")
        try:
            jax.profiler.start_trace(logdir)
            out = f(*args)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            from tensorflow.tsl.profiler.protobuf import xplane_pb2

            total_ms = 0.0
            for p in glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
                xs = xplane_pb2.XSpace()
                with open(p, "rb") as fh:
                    xs.ParseFromString(fh.read())
                for plane in xs.planes:
                    if "tpu" not in plane.name.lower():
                        continue
                    for line in plane.lines:
                        if line.name.lower() != "xla modules":
                            continue
                        for ev in line.events:
                            total_ms += ev.duration_ps / 1e9
            vals.append(total_ms * 1e3 / s)
        finally:
            shutil.rmtree(logdir, ignore_errors=True)
    vals = sorted(vals)
    return vals[len(vals) // 2]


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
    print(f"S={S} n={n}")

    from jax.experimental import layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    fmt3 = layout.Format(layout.Layout(major_to_minor=(0, 1, 2)),
                         SingleDeviceSharding(dev))
    fmt2 = layout.Format(layout.Layout(major_to_minor=(0, 1)),
                         SingleDeviceSharding(dev))
    ring_cm = jax.device_put(
        jnp.asarray(np.ascontiguousarray(np.swapaxes(pts, 1, 2))), fmt3
    )
    mask_sf = jax.device_put(np.ones((S, n), np.float32), fmt2)

    variants = {
        # the shipped wrapper — originally the dual-read formulation whose
        # in-graph row-major view cost the big XLA copy (337 us/frame
        # device, measured 2026-08-18); now the single-read dotT form, so
        # this row doubles as a regression check of the shipped path
        "v5-shipped            ": lambda cm, m: vg._accumulate_pallas_v5_stacked(
            jnp.swapaxes(cm, 1, 2), m, scene, leaf, leaf_z, 2048, points_cm=cm
        )[0],
        "v7-transpose          ": lambda cm, m, f=make_v7_stacked(
            scene, leaf, leaf_z, S, n, 2048, "transpose"
        ): f(cm, m)[0],
        "v7-dotT               ": lambda cm, m, f=make_v7_stacked(
            scene, leaf, leaf_z, S, n, 2048, "dotT"
        ): f(cm, m)[0],
        "v7-transpose b4096    ": lambda cm, m, f=make_v7_stacked(
            scene, leaf, leaf_z, S, n, 4096, "transpose"
        ): f(cm, m)[0],
    }

    ref = None
    for name, fn in variants.items():
        try:
            f = jax.jit(fn)
            out = f(ring_cm, mask_sf)
            np.asarray(out[-1, 3, ::7])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(ring_cm, mask_sf)
                np.asarray(out[-1, 3, ::7])
                best = min(best, time.perf_counter() - t0)
            dev_us = _traced_device_us_per_frame(f, (ring_cm, mask_sf), S)
            a = np.asarray(out).astype(np.float64)
            if ref is None:
                ref = a
                err = 0.0
            else:
                err = np.abs(a - ref).max()
            print(
                f"{name}: wall {best / S * 1e6:7.1f} us/frame   device "
                f"{dev_us:7.1f} us/frame   maxdiff_vs_shipped={err:.3e}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {str(e)[:300]}")


if __name__ == "__main__":
    main()
