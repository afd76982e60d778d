"""Static-point removal against an occupancy-grid map.

Reference behavior (ref: removeStatic, src/multiple_object_tracking_lidar.cpp:664-706):
for every point, transform into map-grid coordinates (rotate by −yaw of the
map origin, cpp:674-678; C integer truncation toward zero), scan the
(2·tol+1)² cell neighborhood, and drop the point if ANY cell is occupied
(>50) or unknown (−1).

TPU design: the neighborhood scan is hoisted out of the per-point loop — the
occupancy test is a pure function of the map, so we precompute a max-pooled
(dilated by ``tol``) boolean mask ONCE per map (`build_static_mask`), and the
per-frame work collapses to one vectorized gather (`remove_static`).

Bounds: the reference indexes the map unchecked (cpp:686 — reads out of range
for points outside the map, which is UB).  We define the behavior: points
whose (row, col) fall outside the grid are dropped (outside the map is
unknown, and unknown cells drop points).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.utils.pgm import OccupancyGrid


class MapEnv(NamedTuple):
    """Device-resident map constants consumed by the jitted step."""

    dilated: jax.Array      # (H, W) bool — True = drop points here
    origin_x: jax.Array     # scalars
    origin_y: jax.Array
    cos_nyaw: jax.Array     # cos(-yaw), sin(-yaw) of map origin
    sin_nyaw: jax.Array
    inv_resolution: jax.Array


def build_static_mask(
    grid: OccupancyGrid,
    tolarance: int,
    occupied_threshold: int = 50,
) -> MapEnv:
    """Precompute the dilated static mask for a map (host, once per map)."""
    data = np.asarray(grid.data)
    occ = (data > occupied_threshold) | (data == -1)

    t = int(tolarance)
    if t > 0:
        # (2t+1)^2 max-pool dilation; out-of-map neighbors treated as edge
        padded = np.pad(occ, t, mode="edge")
        h, w = occ.shape
        dil = np.zeros_like(occ)
        for di in range(2 * t + 1):
            for dj in range(2 * t + 1):
                dil |= padded[di : di + h, dj : dj + w]
        occ = dil

    yaw = grid.info.origin_yaw
    return MapEnv(
        dilated=jnp.asarray(occ),
        origin_x=jnp.float32(grid.info.origin_x),
        origin_y=jnp.float32(grid.info.origin_y),
        cos_nyaw=jnp.float32(math.cos(-yaw)),
        sin_nyaw=jnp.float32(math.sin(-yaw)),
        inv_resolution=jnp.float32(1.0 / grid.info.resolution),
    )


def remove_static(
    points: jnp.ndarray, mask: jnp.ndarray, env: MapEnv
) -> jnp.ndarray:
    """Per-frame static filter: one gather into the dilated mask.

    Returns the keep-mask (True = dynamic point to keep).
    """
    h, w = env.dilated.shape
    # grid math always in f32, matching the reference's C float arithmetic
    x_map = points[:, 0].astype(jnp.float32) - env.origin_x
    y_map = points[:, 1].astype(jnp.float32) - env.origin_y
    # rotate by -yaw and quantize with C truncation toward zero (cpp:677-678)
    col_f = (env.cos_nyaw * x_map - env.sin_nyaw * y_map) * env.inv_resolution
    row_f = (env.sin_nyaw * x_map + env.cos_nyaw * y_map) * env.inv_resolution
    col = col_f.astype(jnp.int32)
    row = row_f.astype(jnp.int32)

    in_bounds = (row >= 0) & (row < h) & (col >= 0) & (col < w)
    row_c = jnp.clip(row, 0, h - 1)
    col_c = jnp.clip(col, 0, w - 1)

    # Gather-free lookup: random scalar gathers cost ~100 ns each on TPU
    # (serialized through the scalar core — measured 0.6-0.9 ms for 8k
    # lookups), so the table read becomes a one-hot bilinear form on the
    # MXU/VPU:  dil[r, c] = onehot(r) @ dil @ onehot(c).  All values are
    # exactly 0/1, bf16 operands with f32 accumulation are exact.
    rsel = (row_c[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    csel = col_c[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]
    dil = env.dilated.astype(jnp.bfloat16)
    t = jax.lax.dot_general(
        rsel, dil, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (M, W) rows of dil
    val = jnp.sum(jnp.where(csel, t, 0.0), axis=1)
    is_static = val > 0.5
    return mask & in_bounds & ~is_static
