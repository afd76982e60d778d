import numpy as np

from multiple_object_tracking_lidar_tpu.io.pointcloud2 import (
    decode_pointcloud2,
    make_pointcloud2,
)
from multiple_object_tracking_lidar_tpu.utils.colors import GlibcRand, make_colorset


def test_pointcloud2_roundtrip(rng):
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    msg = make_pointcloud2(xyz, stamp=1.5, extra_padding=4)
    assert msg.point_step == 16
    pts, mask = decode_pointcloud2(msg, n_max=128)
    assert mask.sum() == 100
    np.testing.assert_array_equal(pts[:100], xyz)
    np.testing.assert_array_equal(pts[100:], 0.0)


def test_pointcloud2_truncation_and_nan(rng):
    xyz = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
    xyz[7] = np.nan
    xyz[13, 2] = np.inf
    msg = make_pointcloud2(xyz, stamp=0.0)
    pts, mask = decode_pointcloud2(msg, n_max=32)
    assert mask.sum() == 32  # truncated to capacity
    # non-finite rows dropped before padding
    finite = xyz[np.isfinite(xyz).all(axis=1)]
    np.testing.assert_array_equal(pts[:32], finite[:32])


def test_glibc_rand_exact():
    """Values verified against gcc/glibc rand() with srand(5323)."""
    g = GlibcRand(5323)
    expected = [
        1365506864, 1679522910, 1014739851, 1959510247, 669284960, 1982204668,
        1474262182, 830130052, 269213791, 1478740695, 800303156, 1720065185,
    ]
    assert [g.rand() for _ in range(12)] == expected


def test_colorset_matches_rand_stream():
    colors = make_colorset(2, seed=5323)
    assert colors[0][0] == np.float32(np.float32(1365506864) / np.float32(2147483647))
    assert colors[0][3] == 0.8
    assert len(colors) == 2


def test_pgm_map_loader(fixture_map):
    grid = fixture_map
    assert grid.info.resolution == 0.05
    assert grid.info.origin_x == -2.3
    # trinary values only
    assert set(np.unique(grid.data)).issubset({-1, 0, 100})
    # fixture has walls (occupied), free interior, unknown border
    assert (grid.data == 100).sum() > 0
    assert (grid.data == 0).sum() > 0
    assert (grid.data == -1).sum() > 0
    # OccupancyGrid row 0 is the bottom image row: the border is unknown
    assert grid.data[0, 0] == -1
