"""Order-preserving stream compaction under static shapes.

TPU building block used by several pipeline stages: given a padded array and
a keep-mask, pack the kept rows to the front of a fixed-size output, keeping
relative order — cumsum + scatter, no sorts, no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_points(
    data: jnp.ndarray, keep: jnp.ndarray, out_size: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack rows of ``data`` where ``keep`` into ``(out_size, ...)``.

    Returns (packed, packed_mask, n_kept).  Overflow beyond out_size is
    dropped (callers expose n_kept so the runtime can report truncation).
    """
    n = data.shape[0]
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1          # target slot per kept row
    n_kept = jnp.maximum(pos[-1] + 1, 0) if n > 0 else jnp.int32(0)
    # rows not kept (or overflowing) scatter to a dump slot
    slot = jnp.where(keep & (pos < out_size), pos, out_size)
    out = jnp.zeros((out_size + 1,) + data.shape[1:], dtype=data.dtype)
    out = out.at[slot].set(data, mode="drop")
    out_mask = jnp.zeros(out_size + 1, dtype=bool).at[slot].set(keep, mode="drop")
    return out[:out_size], out_mask[:out_size], n_kept
