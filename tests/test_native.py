"""Native C++ host module: build + parity with the NumPy reference paths."""

import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    try:
        subprocess.run(
            ["make", "-C", os.path.join(ROOT, "native")],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    from multiple_object_tracking_lidar_tpu.io import native

    native._TRIED = False  # force reload after build
    native._LIB = None
    if not native.native_available():
        pytest.skip("libmotl_host.so did not load")
    return native


def test_native_decode_matches_numpy(native_lib, rng):
    from multiple_object_tracking_lidar_tpu.io.pointcloud2 import (
        decode_pointcloud2,
        make_pointcloud2,
    )

    xyz = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    xyz[11] = np.nan
    xyz[200, 1] = np.inf
    msg = make_pointcloud2(xyz, stamp=2.0, extra_padding=4)

    got = decode_pointcloud2(msg, n_max=600, use_native=True)
    want = decode_pointcloud2(msg, n_max=600, use_native=False)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_native_decode_truncation(native_lib, rng):
    from multiple_object_tracking_lidar_tpu.io.pointcloud2 import (
        decode_pointcloud2,
        make_pointcloud2,
    )

    xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    msg = make_pointcloud2(xyz, stamp=0.0)
    pts, mask = decode_pointcloud2(msg, n_max=64, use_native=True)
    assert mask.sum() == 64
    np.testing.assert_array_equal(pts, xyz[:64])


def test_native_colors_match_glibc(native_lib):
    from multiple_object_tracking_lidar_tpu.utils.colors import make_colorset

    got = native_lib.glibc_colors_native(5323, 5)
    want = np.asarray(make_colorset(5, seed=5323), dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-7)
