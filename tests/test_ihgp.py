"""Estimation-stack parity: Matérn-3/2 SSM, DARE, IHGP filter/smoother."""

import jax.numpy as jnp
import numpy as np
from scipy.linalg import solve_discrete_are

import oracle
from multiple_object_tracking_lidar_tpu.models.ihgp import (
    smoother_weights,
    dare_fixed_point,
    ihgp_batch,
    ihgp_filter_smoother,
    ihgp_nll_grad,
    stationary_gains,
)
from multiple_object_tracking_lidar_tpu.models.lpf import lpf_pos
from multiple_object_tracking_lidar_tpu.models.matern32 import matern32_from_log, matern32_ssm


def test_matern32_matrices():
    """Matches Matern32model::updateModel (ref Matern32model.cpp:15-46)."""
    ssm = matern32_ssm(0.5, 2.0, 1.5)
    lam = np.sqrt(3.0) / 1.5
    np.testing.assert_allclose(ssm.F, [[0, 1], [-lam * lam, -2 * lam]])
    np.testing.assert_allclose(ssm.Pinf, np.diag([2.0, 2.0 * lam * lam]))
    np.testing.assert_allclose(ssm.H, [[1.0, 0.0]])
    assert ssm.R == 0.5
    # derivative blocks
    ls = 1.5
    np.testing.assert_allclose(ssm.dF[2], [[0, 0], [6 / ls**3, 2 * lam / ls]])
    np.testing.assert_allclose(ssm.dPinf[1], [[1, 0], [0, 3 / ls**2]])
    np.testing.assert_allclose(ssm.dPinf[2], [[0, 0], [0, -6 * 2.0 / ls**3]])
    np.testing.assert_allclose(ssm.dR, [1, 0, 0])


def test_dare_against_scipy():
    """The reference's fixed-point DARE should agree with scipy's exact
    solver on the Kalman-filter Riccati equation."""
    ssm = matern32_from_log(-5.5, -3.5, 0.75)
    from scipy.linalg import expm

    A = expm(ssm.F * 0.1)
    Q = ssm.Pinf - A @ ssm.Pinf @ A.T
    X = dare_fixed_point(A, ssm.H, Q, ssm.R)
    X_scipy = solve_discrete_are(A.T, ssm.H.T, Q, np.atleast_2d(ssm.R))
    np.testing.assert_allclose(X, X_scipy, rtol=1e-6, atol=1e-12)


def test_gains_match_oracle_ctor():
    ssm = matern32_from_log(-5.5, -3.5, 0.75)
    g = stationary_gains(ssm, 0.1)
    o = oracle.IHGPOracle(0.1, ssm.F, ssm.H, ssm.Pinf, ssm.R)
    np.testing.assert_allclose(g.A, o.A)
    np.testing.assert_allclose(g.Q, o.Q)
    np.testing.assert_allclose(g.S, o.S)
    np.testing.assert_allclose(g.K, o.K[:, 0])
    np.testing.assert_allclose(g.AKHA, o.AKHA)
    np.testing.assert_allclose(g.HA, o.HA[:, 0])


def test_filter_smoother_matches_oracle(rng):
    ssm = matern32_from_log(-5.5, -3.5, 0.75)
    g = stationary_gains(ssm, 0.1)
    gj = g.as_jax(jnp.float64)
    o = oracle.IHGPOracle(0.1, ssm.F, ssm.H, ssm.Pinf, ssm.R)

    y = rng.normal(0, 0.3, 20)
    m0 = jnp.zeros(2, dtype=jnp.float64)
    # two consecutive windows to exercise the m0 carry semantics
    for lo, hi in [(0, 10), (10, 20)]:
        o.init_step()
        for v in y[lo:hi]:
            o.update(v)
        want = o.get_eft()
        eft, m0 = ihgp_filter_smoother(jnp.asarray(y[lo:hi]), m0, gj)
        np.testing.assert_allclose(np.asarray(eft), want, rtol=1e-10, atol=1e-12)
        # carry equals the oracle's mutated m (smoothed head state)
        np.testing.assert_allclose(np.asarray(m0), o.m[:, 0], rtol=1e-10, atol=1e-12)


def test_ihgp_batch_shapes(rng):
    ssm_x = matern32_from_log(-5.5, -3.5, 0.75)
    ssm_y = matern32_from_log(-5.0, -3.0, 0.5)
    gx = stationary_gains(ssm_x, 0.1).as_jax(jnp.float64)
    gy = stationary_gains(ssm_y, 0.1).as_jax(jnp.float64)
    import jax

    gxy = jax.tree.map(lambda a, b: jnp.stack([a, b]), gx, gy)
    y = jnp.asarray(rng.normal(size=(5, 2, 9)))
    m0 = jnp.zeros((5, 2, 2))
    eft, mc = ihgp_batch(y, m0, gxy)
    assert eft.shape == (5, 2, 9) and mc.shape == (5, 2, 2)
    # batch row equals the single-series run with the matching axis gains
    eft0, _ = ihgp_filter_smoother(y[3, 1], m0[3, 1], gy)
    np.testing.assert_allclose(np.asarray(eft[3, 1]), np.asarray(eft0), rtol=1e-12)


def test_smoother_weights_match_scan(rng):
    """The closed-form LTI weights must reproduce the scan path exactly:
    same eft[-1] and same m0 carry, for arbitrary y and m0."""
    import jax

    from multiple_object_tracking_lidar_tpu.models.ihgp import (
        ihgp_apply_weights,
        smoother_weights_xy,
    )

    gx = stationary_gains(matern32_from_log(-5.5, -3.5, 0.75), 0.1)
    gy = stationary_gains(matern32_from_log(-5.0, -3.0, 0.5), 0.1)
    gxy = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        gx.as_jax(jnp.float64),
        gy.as_jax(jnp.float64),
    )
    w = smoother_weights_xy(gx, gy, 9, jnp.float64)

    y = jnp.asarray(rng.normal(size=(5, 2, 9)))
    m0 = jnp.asarray(rng.normal(size=(5, 2, 2)) * 0.1)
    eft_scan, mc_scan = ihgp_batch(y, m0, gxy)
    eft_w, mc_w = ihgp_apply_weights(y, m0, w)
    np.testing.assert_allclose(np.asarray(eft_w), np.asarray(eft_scan[:, :, -1]), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mc_w), np.asarray(mc_scan), rtol=1e-12, atol=1e-12)


def test_nll_grad_finite_difference():
    """The analytic likelihood gradient (cpp:141-154 recursions) must match
    finite differences of the NLL through the full gain computation."""
    rng = np.random.default_rng(0)
    y = rng.normal(0, 0.5, 12)
    dt = 0.1
    theta = np.array([np.exp(-5.5), np.exp(-3.5), np.exp(0.75)])

    def nll(th):
        ssm = matern32_ssm(*th)
        g = stationary_gains(ssm, dt)
        gj = g.as_jax_learning(jnp.float64)
        e, _ = ihgp_nll_grad(jnp.asarray(y), jnp.zeros(2, jnp.float64), gj)
        return float(e)

    ssm = matern32_ssm(*theta)
    gj = stationary_gains(ssm, dt).as_jax_learning(jnp.float64)
    _, grad = ihgp_nll_grad(jnp.asarray(y), jnp.zeros(2, jnp.float64), gj)
    grad = np.asarray(grad)

    for j in range(3):
        h = theta[j] * 1e-5  # smaller steps hit f64 cancellation noise in the NLL
        tp, tm = theta.copy(), theta.copy()
        tp[j] += h
        tm[j] -= h
        fd = (nll(tp) - nll(tm)) / (2 * h)
        np.testing.assert_allclose(grad[j], fd, rtol=1e-3, atol=1e-8)


def test_gains_stable_across_hyperparameter_range(rng):
    """Property test: the DARE/expm pipeline must yield finite, contractive
    gains over the plausible hyperparameter box (f32-stability guard,
    SURVEY §7 P4 'hard part #2')."""
    for _ in range(20):
        ls2 = rng.uniform(-8, 2)      # logSigma2
        lm2 = rng.uniform(-6, 2)      # logMagnSigma2
        lls = rng.uniform(-1.5, 2.0)  # logLengthScale
        dt = float(rng.uniform(0.02, 0.5))
        g = stationary_gains(matern32_from_log(ls2, lm2, lls), dt)
        for name in ("A", "Q", "K", "AKHA", "G", "HA"):
            assert np.isfinite(getattr(g, name)).all(), (name, ls2, lm2, lls, dt)
        assert np.isfinite(g.S) and g.S > 0
        # filter recursion must be a contraction (stationarity)
        rho = max(abs(np.linalg.eigvals(g.AKHA)))
        assert rho < 1.0 + 1e-9, (rho, ls2, lm2, lls, dt)
        # f32 cast keeps everything finite
        w = smoother_weights(g, 40)
        assert np.isfinite(np.float32(w["Wy"])).all()


def test_lpf_matches_reference_formula():
    w = jnp.asarray(np.arange(2 * 10 * 4, dtype=np.float64).reshape(2, 10, 4))
    out = np.asarray(lpf_pos(w, lpf_tau=0.03, dt_gp=0.1))
    a, b = 0.03 / 0.13, 0.1 / 0.13
    want = a * np.asarray(w)[:, -2, :2] + b * np.asarray(w)[:, -1, :2]
    np.testing.assert_allclose(out, want)
