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
    env = MapEnv(
        dilated=jnp.asarray(occ),
        origin_x=jnp.float32(grid.info.origin_x),
        origin_y=jnp.float32(grid.info.origin_y),
        cos_nyaw=jnp.float32(math.cos(-yaw)),
        sin_nyaw=jnp.float32(math.sin(-yaw)),
        inv_resolution=jnp.float32(1.0 / grid.info.resolution),
    )
    # host mirror: downstream precomputes (cell static table) need the map
    # values back on the host.  Reading them back from the device would work,
    # but on this stack the FIRST device->host readback permanently switches
    # the runtime client into a slow dispatch mode (~13 us -> ~220 us per
    # jitted call, measured; docs/PERFORMANCE.md) — so the host copy is
    # registered here, where it already exists, and host_env_view() serves it
    # without ever touching the device.
    _HOST_ENV[id(env.dilated)] = (
        np.asarray(occ),
        float(grid.info.origin_x),
        float(grid.info.origin_y),
        float(math.cos(-yaw)),
        float(math.sin(-yaw)),
        float(1.0 / grid.info.resolution),
    )
    _HOST_ENV_KEEP.append(env.dilated)  # pin id() validity for the dict key
    return env


# id(dilated-array) -> (dilated np, origin_x, origin_y, cos_nyaw, sin_nyaw,
# inv_resolution).  Strong refs in _HOST_ENV_KEEP keep the ids stable; maps
# are rare (one per process in practice), so growth is bounded.
_HOST_ENV: dict = {}
_HOST_ENV_KEEP: list = []


def host_env_view(env: MapEnv):
    """(dilated_np, ox, oy, cos, sin, inv_res) without a device readback when
    the env was built by build_static_mask in this process; falls back to a
    device fetch otherwise (e.g. an env deserialized from a checkpoint).
    Returns None when env holds tracers (inside jit/shard_map)."""
    mirror = _HOST_ENV.get(id(env.dilated))
    if mirror is not None:
        return mirror
    try:
        return (
            np.asarray(env.dilated),
            float(np.asarray(env.origin_x)),
            float(np.asarray(env.origin_y)),
            float(np.asarray(env.cos_nyaw)),
            float(np.asarray(env.sin_nyaw)),
            float(np.asarray(env.inv_resolution)),
        )
    except Exception:
        return None


class CellStaticTable(NamedTuple):
    """Per-scene-grid-cell drop-bit window (dense-grid path only).

    A scene cell's centroid can only land in a tiny window of map pixels
    (the cell's map-space bounding box, +-1 pixel of f32 fuzz margin), so the
    per-frame lookup collapses from a (cells x map) one-hot bilinear form to
    a fully ELEMENTWISE bit extraction: ~10 VPU ops total, no gather, no
    matmul.  Built once per (map, scene) pair on the host.

    Registered as a pytree with ``k`` as STATIC aux data (the fused Pallas
    kernel needs the window edge at trace time even when the table itself is
    a jit argument)."""

    base_row: jax.Array   # (n_cells,) i32 — window origin per cell
    base_col: jax.Array   # (n_cells,) i32
    bits: jax.Array       # (n_cells,) i32 — bit (qr*k+qc) set = DROP
    k: int                # window edge length (k*k <= 32) — static


jax.tree_util.register_pytree_node(
    CellStaticTable,
    lambda t: ((t.base_row, t.base_col, t.bits), t.k),
    lambda k, leaves: CellStaticTable(*leaves, k),
)


def build_cell_static_table(
    env: MapEnv,
    scene,
    leaf_xy: float,
    gx: int,
    gy: int,
    gz: int,
) -> CellStaticTable | None:
    """Host precompute of the per-cell drop-bit windows.  Returns None when
    the fast path does not apply (window exceeds 32 bits, or env is a tracer
    rather than concrete map data) — callers fall back to remove_static."""
    view = host_env_view(env)
    if view is None:
        return None
    dil, ox, oy, cos, sin, inv_res = view
    h, w = dil.shape
    # window edge: map-space span of one cell (+1 pixel straddle, +2 f32 fuzz)
    span = leaf_xy * (abs(cos) + abs(sin)) * inv_res
    k = int(np.ceil(span)) + 3
    if k * k > 32:
        return None

    bx = math.floor(scene.x_min / leaf_xy)
    by = math.floor(scene.y_min / leaf_xy)
    x0 = (bx + np.arange(gx, dtype=np.float64)) * leaf_xy      # cell min-x
    y0 = (by + np.arange(gy, dtype=np.float64)) * leaf_xy
    cx = np.broadcast_to(x0[None, :], (gy, gx))
    cy = np.broadcast_to(y0[:, None], (gy, gx))
    # map-space bbox over the 4 cell corners (centroid ranges over the cell)
    cols, rows = [], []
    for dx2 in (0.0, leaf_xy):
        for dy2 in (0.0, leaf_xy):
            xm = cx + dx2 - ox
            ym = cy + dy2 - oy
            cols.append((cos * xm - sin * ym) * inv_res)
            rows.append((sin * xm + cos * ym) * inv_res)
    col_min = np.trunc(np.minimum.reduce(cols)).astype(np.int64)
    row_min = np.trunc(np.minimum.reduce(rows)).astype(np.int64)
    base_col = (col_min - 1).astype(np.int32)                  # f32 fuzz margin
    base_row = (row_min - 1).astype(np.int32)

    bits = np.zeros((gy, gx), np.int32)
    for qr in range(k):
        for qc in range(k):
            rr = base_row.astype(np.int64) + qr
            cc = base_col.astype(np.int64) + qc
            oob = (rr < 0) | (rr >= h) | (cc < 0) | (cc >= w)
            val = dil[np.clip(rr, 0, h - 1), np.clip(cc, 0, w - 1)] | oob
            bits |= val.astype(np.int32) << (qr * k + qc)

    tile = (gz, 1, 1)
    return CellStaticTable(
        base_row=jnp.asarray(np.tile(base_row[None], tile).reshape(-1)),
        base_col=jnp.asarray(np.tile(base_col[None], tile).reshape(-1)),
        bits=jnp.asarray(np.tile(bits[None], tile).reshape(-1)),
        k=k,
    )


_CELL_TABLE_CACHE: dict = {}


def get_cell_static_table(
    env: MapEnv, scene, leaf_xy: float, gx: int, gy: int, gz: int
) -> CellStaticTable | None:
    """Cached build_cell_static_table keyed by map CONTENT + scene geometry
    (id-based keys could alias a freed map's storage)."""
    view = host_env_view(env)
    if view is None:
        return None
    import hashlib

    dil, ox, oy, cos, _sin, inv_res = view
    key = (
        hashlib.sha1(dil.tobytes()).hexdigest(),
        ox,
        oy,
        cos,
        inv_res,
        (scene.x_min, scene.y_min, leaf_xy, gx, gy, gz),
    )
    if key not in _CELL_TABLE_CACHE:
        _CELL_TABLE_CACHE[key] = build_cell_static_table(
            env, scene, leaf_xy, gx, gy, gz
        )
    return _CELL_TABLE_CACHE[key]


def remove_static_cells(
    cent: jnp.ndarray, occ: jnp.ndarray, env: MapEnv, table: CellStaticTable
) -> jnp.ndarray:
    """Dense-grid static filter: identical per-frame f32 row/col math as
    remove_static (reference cpp:674-678 C-float arithmetic + truncation),
    but the map lookup is the precomputed per-cell drop bit — elementwise.
    ``cent`` is CHANNEL-MAJOR (3, n_cells): row slices are free, while
    (n, 3) column slices cost a ~0.25 ms relayout each on this TPU."""
    x_map = cent[0].astype(jnp.float32) - env.origin_x
    y_map = cent[1].astype(jnp.float32) - env.origin_y
    col = ((env.cos_nyaw * x_map - env.sin_nyaw * y_map) * env.inv_resolution).astype(jnp.int32)
    row = ((env.sin_nyaw * x_map + env.cos_nyaw * y_map) * env.inv_resolution).astype(jnp.int32)
    k = table.k
    qr = row - table.base_row
    qc = col - table.base_col
    in_win = (qr >= 0) & (qr < k) & (qc >= 0) & (qc < k)
    bit = (table.bits >> jnp.clip(qr * k + qc, 0, k * k - 1)) & 1
    drop = jnp.where(in_win, bit, 1)  # out-of-window cannot happen; drop safe
    return occ & (drop == 0)


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
