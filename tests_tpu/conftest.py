"""HARDWARE-mode tests: run on the real TPU chip (no platform override).

The main tests/ suite forces CPU + interpret-mode kernels; this suite
compiles the Pallas kernels for the actual Mosaic target and asserts
parity on-device.  Run via the verify skill:

    python -m pytest tests_tpu/ -q

Skips everything when no TPU-like backend is available.
"""

import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "none"
    if platform in ("cpu", "none"):
        skip = pytest.mark.skip(reason=f"needs TPU hardware (have {platform})")
        for item in items:
            item.add_marker(skip)


@pytest.fixture()
def rng():
    return np.random.default_rng(7)
