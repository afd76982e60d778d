"""Multi-LiDAR merge (the reference's open TODO, README.md:70)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_object_tracking_lidar_tpu.parallel.multi_lidar import (
    merge_lidar_frames,
    merge_lidar_frames_sharded,
    rigid_transform,
)


def test_rigid_transform_yaw():
    T = rigid_transform([1.0, 2.0, 0.0], yaw=np.pi / 2)
    p = T[:3, :3] @ np.array([1.0, 0.0, 0.0]) + T[:3, 3]
    np.testing.assert_allclose(p, [1.0, 3.0, 0.0], atol=1e-12)


def test_merge_two_sensors(rng):
    n = 64
    a = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    Ta = rigid_transform([0.0, 0.0, 0.0], yaw=0.0)
    Tb = rigid_transform([5.0, 0.0, 0.2], yaw=np.pi)
    pts = jnp.asarray(np.stack([a, b]))
    masks = jnp.ones((2, n), bool)
    tfs = jnp.asarray(np.stack([Ta, Tb]).astype(np.float32))
    merged, mask = merge_lidar_frames(pts, masks, tfs)
    assert merged.shape == (2 * n, 3)
    np.testing.assert_allclose(np.asarray(merged[:n]), a, atol=1e-6)
    want_b = (Tb[:3, :3] @ b.T).T + Tb[:3, 3]
    np.testing.assert_allclose(np.asarray(merged[n:]), want_b, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_merge_sharded_matches_local(rng):
    from jax.sharding import Mesh, PartitionSpec as P

    n = 32
    clouds = rng.uniform(-1, 1, (2, n, 3)).astype(np.float32)
    tfs = np.stack(
        [rigid_transform([0, 0, 0], 0.0), rigid_transform([1, 0, 0], np.pi / 4)]
    ).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("s",))

    fn = jax.jit(
        jax.shard_map(
            lambda p, m, t: merge_lidar_frames_sharded(p[0], m[0], t[0], "s"),
            mesh=mesh,
            in_specs=(P("s"), P("s"), P("s")),
            out_specs=P(),
            check_vma=False,  # all_gather output is replicated by construction
        )
    )
    merged, mask = fn(jnp.asarray(clouds), jnp.ones((2, n), bool), jnp.asarray(tfs))
    want, _ = merge_lidar_frames(
        jnp.asarray(clouds), jnp.ones((2, n), bool), jnp.asarray(tfs)
    )
    np.testing.assert_allclose(np.asarray(merged), np.asarray(want), atol=1e-5)
