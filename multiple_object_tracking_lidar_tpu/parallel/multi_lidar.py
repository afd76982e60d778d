"""Multi-LiDAR merge — the reference's open TODO, implemented TPU-side.

The reference README lists "change multiple lidar merging method" as
unfinished work (ref: README.md:70 / source TODO list cpp:19): its node
subscribes to ONE already-merged topic and the merging happened upstream.
Here merging is a first-class device op: each sensor's padded point tensor is
transformed by its rigid extrinsics and the streams are concatenated into the
single padded frame the tracker consumes — one fused op, no host round-trip,
vmappable over sensors and shardable over the mesh (each sensor's stream can
arrive on a different host/chip and meet in one all_gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rigid_transform(translation, yaw: float, pitch: float = 0.0, roll: float = 0.0) -> np.ndarray:
    """Build a (4, 4) sensor-to-vehicle transform from translation + ZYX Euler."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    ry = np.array([[cy, 0, sy], [0, 1.0, 0], [-sy, 0, cy]])
    rx = np.array([[1.0, 0, 0], [0, cx, -sx], [0, sx, cx]])
    T = np.eye(4)
    T[:3, :3] = rz @ ry @ rx
    T[:3, 3] = np.asarray(translation, dtype=np.float64)
    return T


def merge_lidar_frames(
    points: jax.Array,      # (S, N, 3) per-sensor padded points
    masks: jax.Array,       # (S, N)
    transforms: jax.Array,  # (S, 4, 4) sensor -> common frame
) -> tuple[jax.Array, jax.Array]:
    """Transform each sensor's cloud into the common frame and concatenate.

    Returns ((S*N, 3) points, (S*N,) mask) — a regular padded frame; the
    voxel stage downstream dedups overlapping returns naturally.
    """
    rot = transforms[:, :3, :3]                       # (S, 3, 3)
    trn = transforms[:, :3, 3]                        # (S, 3)
    moved = jnp.einsum("sij,snj->sni", rot, points) + trn[:, None, :]
    s, n, _ = moved.shape
    return moved.reshape(s * n, 3), masks.reshape(s * n)


def merge_lidar_frames_sharded(
    points: jax.Array,      # (N_local, 3) this device's sensor shard
    mask: jax.Array,
    transform: jax.Array,   # (4, 4)
    axis_name: str,
) -> tuple[jax.Array, jax.Array]:
    """Mesh-sharded variant for use inside shard_map: each device transforms
    its own sensor's points, then one all_gather over ``axis_name`` forms the
    merged frame on every participant."""
    rot = transform[:3, :3]
    trn = transform[:3, 3]
    moved = points @ rot.T + trn
    merged = jax.lax.all_gather(moved, axis_name, tiled=True)
    merged_mask = jax.lax.all_gather(mask, axis_name, tiled=True)
    return merged, merged_mask
