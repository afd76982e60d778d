"""Microbench: one-hot voxel accumulator variants at bench shapes on TPU.

Measures the fused Pallas kernel at several block sizes (VMEM-scoped memory
scales with the block), the jnp one-hot lowering, and the sorted-runs
voxelizer, all at the __graft_entry__ bench shape.  Run on the real chip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _bench_config
from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape, _quantize
from multiple_object_tracking_lidar_tpu.ops import voxel_grid as vg


def timed(fn, *args, n=200):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    cfg = _bench_config()
    leaf = cfg.voxel_leaf_size
    scene = cfg.scene
    n = cfg.caps.n_max_points
    rng = np.random.default_rng(0)
    pts = np.stack(
        [
            rng.uniform(-2.2, 2.2, n),
            rng.uniform(-1.3, 9.2, n),
            rng.uniform(0.0, 1.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    mask = jnp.ones(n, bool)
    gx, gy, gz = grid_shape(scene, leaf, 20 * leaf)
    print(f"n={n} grid=({gx},{gy},{gz}) cells={gx*gy*gz}")

    ref = None
    for block in (512, 1024, 2048, 4096):
        try:
            f = jax.jit(
                lambda p, m, b=block: vg.voxel_accumulate_onehot(
                    p, m, scene, leaf, 20 * leaf, use_pallas=True, block=b
                )
            )
            ms, out = timed(f, points, mask)
            if ref is None:
                ref = np.asarray(out)
            err = float(np.abs(np.asarray(out) - ref).max())
            print(f"pallas block={block}: {ms:.3f} ms  max_abs_diff={err:.2e}")
        except Exception as e:
            print(f"pallas block={block}: FAIL {str(e)[:160]}")

    try:
        f = jax.jit(
            lambda p, m: vg.voxel_accumulate_onehot(
                p, m, scene, leaf, 20 * leaf, use_pallas=False
            )
        )
        ms, out = timed(f, points, mask)
        err = float(np.abs(np.asarray(out) - ref).max()) if ref is not None else -1
        print(f"jnp onehot: {ms:.3f} ms  max_abs_diff={err:.2e}")
    except Exception as e:
        print(f"jnp onehot: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
