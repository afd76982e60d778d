"""Op-level parity vs the NumPy oracle (PCL/reference semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from multiple_object_tracking_lidar_tpu.config import SceneBounds
from multiple_object_tracking_lidar_tpu.ops.cluster import euclidean_cluster
from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features
from multiple_object_tracking_lidar_tpu.ops.compact import compact_points
from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask, remove_static
from multiple_object_tracking_lidar_tpu.ops.voxel import (
    voxel_downsample_dense,
    voxel_downsample_sort,
)

SCENE = SceneBounds(x_min=-4, x_max=4, y_min=-4, y_max=4, z_min=-1, z_max=3)


def _pad(pts, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(n, bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


# ---------------------------------------------------------------- voxel ----

@pytest.mark.parametrize("mode", ["dense", "sort"])
def test_voxel_matches_oracle(rng, mode):
    pts = rng.uniform(-3.5, 3.5, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.5, 2.5, 400)
    p, m = _pad(pts, 512)
    if mode == "dense":
        vox, mask, n = voxel_downsample_dense(p, m, SCENE, 0.25, 5.0, 512)
    else:
        vox, mask, n = voxel_downsample_sort(p, m, 0.25, 5.0, 512)
    want = oracle.voxel_downsample(pts.astype(np.float64), 0.25, 5.0)
    got = np.asarray(vox)[np.asarray(mask)]
    assert int(n) == len(want)
    assert got.shape == want.shape
    # identical ordering (ascending z,y,x voxel index) and centroid values
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_out_of_bounds_dropped():
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]], np.float32)
    p, m = _pad(pts, 8)
    vox, mask, n = voxel_downsample_dense(p, m, SCENE, 0.25, 5.0, 16)
    assert int(n) == 1


# --------------------------------------------------------- static mask ----

def test_remove_static_matches_oracle(fixture_map, rng):
    grid = fixture_map
    pts = rng.uniform(-2.5, 2.5, (300, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(-1.8, 9.5, 300)
    pts[:, 2] = 0.2
    env = build_static_mask(grid, tolarance=2)
    p, m = _pad(pts, 512)
    keep = np.asarray(remove_static(p, m, env))[:300]
    info = grid.info
    want = oracle.remove_static(
        pts.astype(np.float64), grid.data, info.origin_x, info.origin_y,
        info.origin_yaw, info.resolution, 2,
    )
    np.testing.assert_array_equal(keep, want)


def test_remove_static_keeps_free_space(fixture_map):
    env = build_static_mask(fixture_map, tolarance=2)
    # center of the corridor is free; far outside the map is dropped
    p, m = _pad(np.array([[0.0, 4.0, 0.2], [50.0, 50.0, 0.2]], np.float32), 8)
    keep = np.asarray(remove_static(p, m, env))
    assert keep[0] and not keep[1]


# ------------------------------------------------------------- compact ----

def test_compact_points(rng):
    data = rng.normal(size=(32, 3)).astype(np.float32)
    keep = rng.uniform(size=32) < 0.4
    packed, mask, n = compact_points(jnp.asarray(data), jnp.asarray(keep), 16)
    kept = data[keep][:16]
    assert int(n) == keep.sum()
    np.testing.assert_array_equal(np.asarray(packed)[np.asarray(mask)], kept)


# ------------------------------------------------------------- cluster ----

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cluster_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    # several blobs + sparse noise
    blobs = []
    for c in rng.uniform(-3, 3, (5, 2)):
        k = rng.integers(6, 40)
        blobs.append(
            np.concatenate(
                [c + rng.normal(0, 0.08, (k, 2)), rng.uniform(0, 0.4, (k, 1))], axis=1
            )
        )
    noise = np.concatenate(
        [rng.uniform(-3.5, 3.5, (15, 2)), rng.uniform(0, 0.4, (15, 1))], axis=1
    )
    pts = np.concatenate(blobs + [noise]).astype(np.float32)
    rng.shuffle(pts)

    tol, mn, mx = 0.3, 5, 60
    # Remove points with a pair distance within eps of the tolerance boundary:
    # there the f32 device math and the f64 oracle may legitimately disagree
    # (PCL's own f32 KdTree has the same fuzzy band).
    for _ in range(4):
        d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        bad = (np.abs(d - tol) < 2e-4) & ~np.eye(len(pts), dtype=bool)
        if not bad.any():
            break
        pts = pts[~bad.any(axis=1)]
    p, m = _pad(pts, 256)
    cl = euclidean_cluster(p, m, tol, mn, mx, c_max=16, p_max=64)

    want = oracle.euclidean_cluster(pts.astype(np.float64), tol, mn, mx)
    got_n = int(cl.n_clusters)
    assert got_n == len(want)
    sizes = np.asarray(cl.sizes)
    valid = np.asarray(cl.cluster_valid)
    members = np.asarray(cl.members)
    mmask = np.asarray(cl.member_mask)
    for c, comp in enumerate(want):
        assert valid[c]
        assert sizes[c] == len(comp)
        np.testing.assert_array_equal(np.sort(members[c][mmask[c]]), np.array(comp))


def test_cluster_ordering_largest_first():
    # two clusters: sizes 8 and 6 -> cluster 0 is the size-8 one
    a = np.array([[0.0, 0.0, 0.0]]) + np.linspace(0, 0.7, 8)[:, None] * [0.1, 0, 0]
    b = np.array([[5.0, 5.0, 0.0]]) + np.linspace(0, 0.5, 6)[:, None] * [0.1, 0, 0]
    pts = np.concatenate([b, a]).astype(np.float32)  # smaller first in index order
    p, m = _pad(pts, 64)
    cl = euclidean_cluster(p, m, 0.15, 2, 50, c_max=8, p_max=16)
    assert int(cl.sizes[0]) == 8 and int(cl.sizes[1]) == 6


def test_cluster_chain_connectivity():
    # a long chain: every link within tol of the next — one component even
    # though the ends are far apart (transitivity, needs full propagation)
    n = 40
    pts = np.stack([np.arange(n) * 0.1, np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    p, m = _pad(pts, 64)
    cl = euclidean_cluster(p, m, 0.12, 2, 64, c_max=8, p_max=64)
    assert int(cl.n_clusters) == 1
    assert int(cl.sizes[0]) == n


# ------------------------------------------------------------ centroid ----

def test_circumcenter_matches_oracle(rng):
    for _ in range(10):
        n = int(rng.integers(5, 30))
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(0, 0.3, n)
        want = oracle.circumcenter(pts.astype(np.float64))
        p = jnp.asarray(np.pad(pts, ((0, 64 - n), (0, 0))))
        members = jnp.arange(64, dtype=jnp.int32)[None, :]
        mmask = (jnp.arange(64) < n)[None, :]
        out = circumcenter_features(
            p, members, mmask, jnp.array([True]), jnp.float32(1.25), chunk=1
        )
        got = np.asarray(out[0])
        np.testing.assert_allclose(got[:2], want, atol=2e-4)
        assert got[2] == 0.0 and got[3] == np.float32(1.25)


def test_circumcenter_on_arc_recovers_center():
    # points on a circle of radius 2 centered at (3, -1): the circumcenter
    # construction should recover the center (this is its purpose: LiDAR sees
    # an arc of the object surface; ref README "obstacle edge extraction")
    ang = np.linspace(0.3, 1.8, 12)
    pts = np.stack([3 + 2 * np.cos(ang), -1 + 2 * np.sin(ang), np.zeros(12)], 1).astype(
        np.float32
    )
    p = jnp.asarray(np.pad(pts, ((0, 20), (0, 0))))
    members = jnp.arange(32, dtype=jnp.int32)[None, :]
    mmask = (jnp.arange(32) < 12)[None, :]
    out = np.asarray(
        circumcenter_features(p, members, mmask, jnp.array([True]), jnp.float32(0.0), chunk=1)
    )
    np.testing.assert_allclose(out[0, :2], [3.0, -1.0], atol=1e-3)


def test_circumcenter_collinear_falls_back_to_pi():
    x = np.arange(6) * 0.25  # exact in binary floating point
    pts = np.stack([x, 2 * x, np.zeros(6)], 1).astype(np.float32)
    want = oracle.circumcenter(pts.astype(np.float64))
    p = jnp.asarray(np.pad(pts, ((0, 10), (0, 0))))
    members = jnp.arange(16, dtype=jnp.int32)[None, :]
    mmask = (jnp.arange(16) < 6)[None, :]
    out = np.asarray(
        circumcenter_features(p, members, mmask, jnp.array([True]), jnp.float32(0.0), chunk=1)
    )
    np.testing.assert_allclose(out[0, :2], want, atol=1e-6)


@pytest.mark.parametrize("mode", ["scan"])
def test_voxel_scan_matches_dense(rng, mode):
    from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_downsample_scan

    pts = rng.uniform(-3.5, 3.5, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.5, 2.5, 400)
    p, m = _pad(pts, 512)
    a_vox, a_mask, a_n = voxel_downsample_dense(p, m, SCENE, 0.25, 5.0, 512)
    b_vox, b_mask, b_n = voxel_downsample_scan(p, m, SCENE, 0.25, 5.0, 512)
    assert int(a_n) == int(b_n)
    np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
    np.testing.assert_allclose(
        np.asarray(a_vox)[np.asarray(a_mask)],
        np.asarray(b_vox)[np.asarray(b_mask)],
        rtol=2e-6, atol=1e-6,
    )
