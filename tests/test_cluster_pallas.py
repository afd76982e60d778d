"""Pallas fused connected-components kernel vs the jnp reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from multiple_object_tracking_lidar_tpu.ops.cluster import (
    connected_components,
    euclidean_cluster,
)
from multiple_object_tracking_lidar_tpu.ops.cluster_pallas import (
    connected_components_pallas,
)


def _pad(pts, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(n, bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_labels_match_jnp(seed):
    rng = np.random.default_rng(seed)
    blobs = [
        np.concatenate(
            [c + rng.normal(0, 0.08, (12, 2)), rng.uniform(0, 0.3, (12, 1))], axis=1
        )
        for c in rng.uniform(-3, 3, (4, 2))
    ]
    pts = np.concatenate(blobs).astype(np.float32)
    p, m = _pad(pts, 128)
    want, _ = connected_components(p, m, 0.3)
    got = connected_components_pallas(p, m, 0.3, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_chain_transitivity():
    n = 40
    pts = np.stack([np.arange(n) * 0.1, np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    p, m = _pad(pts, 64)
    got = np.asarray(connected_components_pallas(p, m, 0.12, n_sweeps=64, interpret=True))
    assert (got[:n] == 0).all()
    assert (got[n:] == 64).all()


def test_euclidean_cluster_pallas_backend(rng):
    pts = np.concatenate(
        [
            np.array([0.0, 0.0, 0.0]) + rng.normal(0, 0.05, (10, 3)),
            np.array([3.0, 3.0, 0.0]) + rng.normal(0, 0.05, (8, 3)),
        ]
    ).astype(np.float32)
    p, m = _pad(pts, 64)
    a = euclidean_cluster(p, m, 0.3, 2, 50, 8, 16, backend="jnp")
    b = euclidean_cluster(p, m, 0.3, 2, 50, 8, 16, backend="pallas")
    assert int(a.n_clusters) == int(b.n_clusters) == 2
    np.testing.assert_array_equal(np.asarray(a.sizes), np.asarray(b.sizes))
    np.testing.assert_array_equal(np.asarray(a.members), np.asarray(b.members))
