"""Pallas sorted-runs voxelizer vs dense reference."""

import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.config import SceneBounds
from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_downsample_dense
from multiple_object_tracking_lidar_tpu.ops.voxel_pallas import (
    segment_totals_pallas,
    voxel_downsample_runs,
)

SCENE = SceneBounds(x_min=-4, x_max=4, y_min=-4, y_max=4, z_min=-1, z_max=3)


def test_segment_totals_basic():
    ks = jnp.asarray(np.repeat([0, 1, 1, 3, 3, 3, 7, 9], 16)[:128], jnp.int32)
    ks = jnp.sort(ks)
    vals = jnp.asarray(np.arange(128 * 4, dtype=np.float32).reshape(128, 4))
    tot = np.asarray(segment_totals_pallas(ks, vals, interpret=True))
    kn = np.asarray(ks)
    vn = np.asarray(vals)
    # last row of each segment must equal the numpy groupby sum
    for key in np.unique(kn):
        sel = kn == key
        last = np.nonzero(sel)[0][-1]
        np.testing.assert_allclose(tot[last], vn[sel].sum(0), rtol=1e-6)


def test_segment_totals_cross_block_carry():
    # one giant segment spanning multiple blocks (block=8192 < n)
    n = 16384
    ks = jnp.zeros(n, jnp.int32)
    vals = jnp.ones((n, 4), jnp.float32)
    tot = np.asarray(segment_totals_pallas(ks, vals, interpret=True))
    np.testing.assert_allclose(tot[-1], [n] * 4, rtol=1e-6)


def test_voxel_runs_matches_dense(rng):
    pts = rng.uniform(-3.5, 3.5, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.5, 2.5, 400)
    buf = np.zeros((512, 3), np.float32)
    buf[:400] = pts
    mask = np.zeros(512, bool)
    mask[:400] = True
    p, m = jnp.asarray(buf), jnp.asarray(mask)
    a_vox, a_mask, a_n = voxel_downsample_dense(p, m, SCENE, 0.25, 5.0, 512)
    b_vox, b_mask, b_n = voxel_downsample_runs(
        p, m, SCENE, 0.25, 5.0, 512, interpret=True
    )
    assert int(a_n) == int(b_n)
    np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
    np.testing.assert_allclose(
        np.asarray(a_vox)[np.asarray(a_mask)],
        np.asarray(b_vox)[np.asarray(b_mask)],
        rtol=2e-6, atol=1e-6,
    )
