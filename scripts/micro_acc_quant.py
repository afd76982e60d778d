"""Microbench: exact (v3, 7ch) vs fast (v4, 4ch) one-hot accumulator.

Device-bound methodology (docs/PERFORMANCE.md round 3): flip the runtime
into streaming mode first, then time ONE dispatch that scans the kernel over
S distinct frames with a scalar carry (so executions chain and nothing is
CSE'd away), fetch-terminated on the carry.  Per-frame time = total / S.

Usage: python scripts/micro_acc_quant.py [S]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _bench_config
from multiple_object_tracking_lidar_tpu.ops import voxel_grid as vg
from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape


def main() -> None:
    np.asarray(jnp.zeros((), jnp.int32) + 1)  # force streaming mode

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    cfg = _bench_config()
    leaf = cfg.voxel_leaf_size
    leaf_z = cfg.leaf_z
    scene = cfg.scene
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
    frames = jax.device_put(jnp.asarray(pts))
    mask = jax.device_put(jnp.ones((n,), bool))
    gx, gy, gz = grid_shape(scene, leaf, leaf_z)
    print(f"S={S} n={n} grid=({gx},{gy},{gz}) cells={gx*gy*gz}")

    def chain(accfn):
        def run(frames):
            def body(c, fr):
                acc = accfn(fr)
                return c + acc[3, ::37].sum(), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
            return c

        return jax.jit(run)

    variants = {}
    # NB: the wrappers clamp block to <= 2048 (scoped-VMEM limit with the
    # in-kernel finalize + scratch accumulator), so larger values would
    # silently time the same program
    for block in (512, 1024, 2048):
        if n % block:
            continue
        variants[f"v3-exact b{block}"] = lambda fr, b=block: vg._accumulate_pallas_v3(
            fr, mask, scene, leaf, leaf_z, b
        )[0]
        variants[f"v4-fast  b{block}"] = lambda fr, b=block: vg._accumulate_pallas_v4(
            fr, mask, scene, leaf, leaf_z, b
        )[0]

    # accuracy check once (against v3 on one frame)
    ref = np.asarray(
        jax.jit(lambda fr: vg._accumulate_pallas_v3(fr, mask, scene, leaf, leaf_z, 4096)[0])(
            frames[0]
        )
    )
    for name, fn in variants.items():
        try:
            f = chain(fn)
            c = f(frames)
            np.asarray(c)  # warm + fetch
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = f(frames)
                np.asarray(c)
                best = min(best, time.perf_counter() - t0)
            out = np.asarray(jax.jit(lambda fr: fn(fr))(frames[0]))
            cnt_ok = bool((out[3] == ref[3]).all())
            with np.errstate(invalid="ignore"):
                cerr = np.nanmax(
                    np.abs(
                        out[:3] / np.maximum(out[3], 1)
                        - ref[:3] / np.maximum(ref[3], 1)
                    )
                )
            print(
                f"{name}: {best / S * 1e6:8.1f} us/frame  counts_equal={cnt_ok} "
                f"centroid_maxdiff={cerr:.2e}"
            )
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
