"""Micro: does Mosaic lower a small in-kernel vector transpose, and what
does it cost?  Candidates for turning the v5 accumulator's (1, B) lane-
oriented lin vector into the (B, 1) sublane orientation the one-hot rhs
needs (so the kernel can drop its row-major duplicate read — the XLA-level
9.8 MB/dispatch relayout copy, docs/PERFORMANCE.md round 4).

Usage: python scripts/micro_transpose.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 2048
REPS = 200


def _kernel_direct(x_ref, o_ref):
    # (1, B) -> (B, 1) in one jnp.transpose
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0))


def _kernel_tiled(x_ref, o_ref):
    # (1, B) -> (16, 128) -> (128, 16) -> (B, 1)
    t = x_ref[...].reshape(B // 128, 128)
    t = jnp.transpose(t, (1, 0))
    o_ref[...] = t.reshape(B, 1)


def _kernel_onehot_from_t(x_ref, o_ref):
    # end-to-end: lane-oriented lin -> (B, 128) one-hot via the transpose
    col = jnp.transpose(x_ref[...], (1, 0))              # (B, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    o_ref[...] = (col == iota).astype(jnp.bfloat16)


def run(name, kernel, out_shape):
    x = jnp.asarray(np.random.randint(0, 128, (1, B)), jnp.int32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
        )
        r = jax.jit(f)(x)
        r.block_until_ready()
        # parity
        want = np.asarray(x).reshape(-1)
        if out_shape[0] == (B, 1):
            ok = bool((np.asarray(r).reshape(-1) == want).all())
        else:
            oh = np.asarray(r).astype(np.float32)
            ok = bool((oh.argmax(1) == want).all())
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = jax.jit(f)(x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / REPS * 1e6
        print(f"{name:24s} OK parity={ok}  {dt:8.1f} us/call (wall, incl dispatch)")
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:140]
        print(f"{name:24s} FAIL: {msg}")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    run("transpose (1,B)->(B,1)", _kernel_direct, ((B, 1), jnp.int32))
    run("tiled 16x128 transpose", _kernel_tiled, ((B, 1), jnp.int32))
    run("onehot via transpose", _kernel_onehot_from_t, ((B, 128), jnp.bfloat16))
