"""Pallas TPU kernel: fused fixed-radius connected components.

The flagship device kernel (SURVEY §7 P3).  The jnp implementation in
ops/cluster.py materializes the (M, M) adjacency in HBM and re-reads it every
label-propagation sweep under a `lax.while_loop`; this kernel instead keeps
EVERYTHING resident in VMEM for the whole clustering:

  1. points are centered/masked once into VMEM scratch;
  2. each min-label-propagation sweep recomputes the (B, M) distance block
     on the MXU from the resident points (matmul flops are cheap; a stored
     (M, M) adjacency would blow the 16 MB VMEM budget) and takes the
     masked row-min of the neighbors' labels on the VPU — zero HBM traffic
     between sweeps, early exit on convergence;
  3. the converged labels are written out once.

Deterministic lowering (no XLA scatter/while heuristics), one kernel launch,
<1 MB VMEM resident + a (B, M) transient.  Falls back to interpret mode
off-TPU so tests run everywhere; selected with
``TrackerConfig(cluster_backend="pallas")``.

Mosaic constraints honored: no i1 reshapes (broadcasts go through f32), no
dynamic slicing or concatenation of values (the block loop is Python-
unrolled; block reads/writes go through refs with pl.ds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BLOCK = 256  # row-block: keeps per-step temporaries at (B, M) ~ 2 MB


def _cc_kernel(
    pts_ref, mask_ref, labels_ref, p_scr, sq_scr, lab_scr, lab1_scr,
    tol2: float, n_sweeps: int, block: int,
):
    m = pts_ref.shape[0]
    nb = m // block
    sentinel = jnp.int32(m)

    # ---- centered masked points into scratch (f32; no i1 reshapes) ----
    mask = mask_ref[:] > 0
    maskf = mask_ref[:].astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(maskf), 1.0)
    c = jnp.sum(pts_ref[:] * maskf[:, None], axis=0) / cnt
    p_scr[:] = (pts_ref[:] - c) * maskf[:, None]
    sq = jnp.sum(p_scr[:] * p_scr[:], axis=1)
    # invalid rows get sq pushed out so d2 > tol2 against everything
    sq_scr[:] = jnp.where(mask, sq, jnp.float32(3e38))

    # ---- min-label propagation: Jacobi sweeps, early exit ----
    # The adjacency is NOT stored: each sweep recomputes the (B, M) gram
    # block on the MXU (matmul flops are cheap; a resident (M, M) adjacency
    # would blow the 16 MB VMEM budget).  Labels live in a scratch ref; the
    # while carries only scalars.
    lab_scr[:] = jnp.where(
        mask, jax.lax.broadcasted_iota(jnp.int32, (m,), 0), sentinel
    )

    def body(state):
        _, it = state
        old = lab_scr[:]
        sq_all = sq_scr[:]
        for b in range(nb):
            pb = p_scr[pl.ds(b * block, block), :]
            sqb = sq_scr[pl.ds(b * block, block)]
            gram = jax.lax.dot_general(
                pb, p_scr[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (B, M)
            d2 = sqb[:, None] + sq_all[None, :] - 2.0 * gram
            nmin = jnp.min(
                jnp.where(d2 <= tol2, old[None, :], sentinel), axis=1
            )
            lab1_scr[pl.ds(b * block, block)] = nmin
        new = jnp.minimum(old, lab1_scr[:])
        lab_scr[:] = new
        return jnp.any(new != old), it + 1

    def cond(state):
        changed, it = state
        return changed & (it < n_sweeps)

    jax.lax.while_loop(cond, body, (jnp.any(mask), jnp.int32(0)))
    labels_ref[:] = lab_scr[:]


@functools.partial(jax.jit, static_argnames=("tol", "n_sweeps", "interpret"))
def connected_components_pallas(
    pts: jax.Array,          # (M, 3) f32
    mask: jax.Array,         # (M,)
    tol: float,
    n_sweeps: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Labels (M,) int32: min point index per component, M for invalid.

    The sweep loop exits as soon as labels stop changing (typical: the
    largest component's hop diameter, ~5-15 on real scans); ``n_sweeps``
    caps the worst case.  For exactness on adversarial chain geometries set
    it >= the largest plausible component diameter.
    """
    m = pts.shape[0]
    block = min(_BLOCK, m)
    if m % block != 0:
        raise ValueError(f"M must be a multiple of {block}, got {m}")
    kernel = functools.partial(
        _cc_kernel, tol2=float(tol) * float(tol), n_sweeps=int(n_sweeps), block=block
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, 3), jnp.float32),
            pltpu.VMEM((m,), jnp.float32),
            pltpu.VMEM((m,), jnp.int32),
            pltpu.VMEM((m,), jnp.int32),
        ],
        interpret=interpret,
    )(pts.astype(jnp.float32), mask.astype(jnp.int32))
