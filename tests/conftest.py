"""Test harness: CPU backend with an 8-device virtual mesh (multi-chip
sharding is validated without TPU hardware, SURVEY.md §4) and x64 enabled so
float64 oracle comparisons are exact where requested."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is not reliable in this environment (a TPU
# platform plugin can override it); the config route always works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from multiple_object_tracking_lidar_tpu.config import Capacities, SceneBounds, TrackerConfig


@pytest.fixture(scope="session")
def tiny_caps() -> Capacities:
    """Small capacities: this box has 1 CPU core — keep compiles cheap."""
    return Capacities(
        n_max_points=2048,
        m_max_voxels=512,
        m_max_dynamic=256,
        c_max_clusters=16,
        p_max_cluster=64,
        k_max_tracks=16,
    )


@pytest.fixture(scope="session")
def tiny_config(tiny_caps) -> TrackerConfig:
    return TrackerConfig(voxel_leaf_size=0.1, max_cluster_size=300, data_length=10, caps=tiny_caps)


@pytest.fixture(scope="session")
def fixture_map():
    import os as _os

    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    path = _os.path.join(_os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    if not _os.path.exists(path):
        import subprocess, sys

        subprocess.run(
            [sys.executable, _os.path.join(_os.path.dirname(path), "make_fixture_map.py")],
            check=True,
        )
    return load_map_yaml(path)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
