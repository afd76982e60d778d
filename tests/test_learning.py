"""Hyperparameter-learning mode (resurrected IHGP_nonfixed, SURVEY C17)."""

import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.models.ihgp import stationary_gains
from multiple_object_tracking_lidar_tpu.models.learning import (
    learning_step,
    matern32_jax,
    stationary_gains_jax,
)
from multiple_object_tracking_lidar_tpu.models.matern32 import matern32_from_log


def test_jax_gains_match_host_gains():
    lp = jnp.asarray([-5.5, -3.5, 0.75], jnp.float64)
    gj = stationary_gains_jax(lp, 0.1)
    gh = stationary_gains(matern32_from_log(-5.5, -3.5, 0.75), 0.1)
    # NB: the device DARE runs a fixed 100 iterations (no early exit) while
    # the host solver breaks at eps=1e-10 — agreement is bounded by that tail
    np.testing.assert_allclose(np.asarray(gj["A"]), gh.A, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gj["K"]), gh.K, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gj["AKHA"]), gh.AKHA, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gj["G"]), gh.G, rtol=1e-6)
    np.testing.assert_allclose(float(gj["S"]), gh.S, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gj["dS"]), gh.dS, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gj["dK"]), gh.dK, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gj["dAKHA"]), gh.dAKHA, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gj["HdA"]), gh.HdA, rtol=1e-6, atol=1e-12)


def test_matern32_jax_matches_host():
    lp = jnp.asarray([-5.5, -3.5, 0.75], jnp.float64)
    ssm_j = matern32_jax(lp)
    ssm_h = matern32_from_log(-5.5, -3.5, 0.75)
    np.testing.assert_allclose(np.asarray(ssm_j["F"]), ssm_h.F, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ssm_j["Pinf"]), ssm_h.Pinf, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ssm_j["dF"]), ssm_h.dF, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ssm_j["dPinf"]), ssm_h.dPinf, rtol=1e-12)


def test_learning_step_decreases_nll():
    """SGD on (logMagnSigma2, logLengthScale) should reduce NLL on data whose
    scale mismatches the initial hyperparameters."""
    rng = np.random.default_rng(1)
    # smooth, large-amplitude trajectories: initial magnSigma2 exp(-3.5) is
    # far too small for amplitude ~2
    t = np.linspace(0, 3, 24)
    y = np.stack([2.0 * np.sin(t * (1 + 0.1 * i)) for i in range(8)]) + rng.normal(
        0, 0.05, (8, 24)
    )
    y = jnp.asarray(y - y.mean(axis=1, keepdims=True))
    mask = jnp.ones(8, bool)

    lp = jnp.asarray([-5.5, -3.5, 0.75], jnp.float64)
    nlls = []
    for _ in range(15):
        lp, nll = learning_step(lp, y, mask, 0.125)
        nlls.append(float(nll))
    assert nlls[-1] < nlls[0], nlls
    # sigma2 is frozen (cpp:951 commented out in the reference)
    assert float(lp[0]) == -5.5
    # clamps respected
    assert np.all(np.abs(np.asarray(lp)) <= 10.0)
