"""Parity vs the ACTUALLY-COMPILED reference numeric core.

Everything else in tests/ compares against tests/oracle.py — a NumPy
rereading of the C++ by the same author, so a misreading would propagate to
both sides.  This file closes that trust link: native/libref_oracle.so
compiles the reference's own Eigen translation units
(src/ihgp/InfiniteHorizonGP.cpp, src/ihgp/Matern32model.cpp — built in place
from /root/reference, never copied) plus verbatim extractions of
getCentroid/LPF_pos/fill_with_linear_interpolation, and these tests assert
the JAX/host implementations equal the real compiled C++ in float64.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.models.ihgp import (
    ihgp_batch,
    ihgp_nll_grad,
    smoother_weights,
    stationary_gains,
)
from multiple_object_tracking_lidar_tpu.models.matern32 import matern32_ssm

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
LIB_PATH = os.path.join(NATIVE_DIR, "libref_oracle.so")
REF_DIR = "/root/reference"


def _load():
    if not os.path.exists(LIB_PATH):
        if not os.path.isdir(REF_DIR):
            pytest.skip("reference tree not available to build libref_oracle.so")
        try:
            subprocess.run(
                ["make", "-C", NATIVE_DIR, "ref"], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build libref_oracle.so: {e}")
    lib = ctypes.CDLL(LIB_PATH)
    D = ctypes.POINTER(ctypes.c_double)
    F = ctypes.POINTER(ctypes.c_float)
    lib.ref_matern32.restype = None
    lib.ref_matern32.argtypes = [ctypes.c_double] * 3 + [D] * 7
    lib.ref_ihgp_run.restype = ctypes.c_int
    lib.ref_ihgp_run.argtypes = (
        [ctypes.c_double] * 4 + [D, ctypes.c_int, ctypes.c_int] + [D] * 3
    )
    lib.ref_get_centroid.restype = None
    lib.ref_get_centroid.argtypes = [F, ctypes.c_int, ctypes.c_float, F]
    lib.ref_lpf_pos.restype = None
    lib.ref_lpf_pos.argtypes = [F, ctypes.c_int, ctypes.c_double, ctypes.c_double, F]
    lib.ref_interp.restype = ctypes.c_int
    lib.ref_interp.argtypes = [F, ctypes.c_int, F, ctypes.c_double]
    return lib


@pytest.fixture(scope="module")
def lib():
    return _load()


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# hyperparameters: the launch-file values plus off-default variations
PARAMS = [
    (np.exp(-5.5), np.exp(-3.5), np.exp(0.75)),   # launch/simTracker.launch
    (1e-3, 0.05, 1.2),
    (0.01, 1.0, 0.3),
]


@pytest.mark.parametrize("sigma2,magn,ell", PARAMS)
def test_matern32_matches_compiled_reference(lib, sigma2, magn, ell):
    F = np.zeros(4)
    Pinf = np.zeros(4)
    H = np.zeros(2)
    R = np.zeros(1)
    dF = np.zeros(12)
    dPinf = np.zeros(12)
    dR = np.zeros(3)
    lib.ref_matern32(
        sigma2, magn, ell, _dp(F), _dp(Pinf), _dp(H), _dp(R),
        _dp(dF), _dp(dPinf), _dp(dR),
    )
    ssm = matern32_ssm(sigma2, magn, ell)
    np.testing.assert_allclose(ssm.F, F.reshape(2, 2), rtol=1e-15, atol=0)
    np.testing.assert_allclose(ssm.Pinf, Pinf.reshape(2, 2), rtol=1e-15, atol=0)
    np.testing.assert_allclose(ssm.H, H.reshape(1, 2), rtol=0, atol=0)
    assert ssm.R == R[0]
    np.testing.assert_allclose(ssm.dF, dF.reshape(3, 2, 2), rtol=1e-15, atol=1e-300)
    np.testing.assert_allclose(ssm.dPinf, dPinf.reshape(3, 2, 2), rtol=1e-15, atol=1e-300)
    np.testing.assert_allclose(ssm.dR, dR, rtol=1e-15, atol=0)


def _ref_run(lib, dt, params, y, n_passes):
    T = len(y)
    eft = np.zeros(n_passes * T)
    lik = np.zeros(n_passes)
    deriv = np.zeros(n_passes * 3)
    rc = lib.ref_ihgp_run(
        dt, params[0], params[1], params[2],
        _dp(np.ascontiguousarray(y, np.float64)), T, n_passes,
        _dp(eft), _dp(lik), _dp(deriv),
    )
    assert rc == 0
    return eft.reshape(n_passes, T), lik, deriv.reshape(n_passes, 3)


@pytest.mark.parametrize("sigma2,magn,ell", PARAMS)
@pytest.mark.parametrize("T", [9, 39])
def test_ihgp_filter_smoother_matches_compiled_reference(lib, sigma2, magn, ell, T):
    """getEft over a window: scan path AND closed-form LTI weights, f64."""
    dt = 0.1
    rng = np.random.default_rng(int(T + 1000 * sigma2))
    y = rng.normal(0, 0.2, T)
    ref_eft, _, _ = _ref_run(lib, dt, (sigma2, magn, ell), y, 1)

    gains = stationary_gains(matern32_ssm(sigma2, magn, ell), dt)
    gj = {k: jnp.asarray(v, jnp.float64) for k, v in gains.as_jax(jnp.float64).items()}
    yk = jnp.asarray(y, jnp.float64)[None, None, :]      # (K=1, axes=1, T)
    gxy = {k: v[None] for k, v in gj.items()}            # leading axis size 1
    eft, m_carry = ihgp_batch(yk, jnp.zeros((1, 1, 2), jnp.float64), gxy)
    np.testing.assert_allclose(np.asarray(eft[0, 0]), ref_eft[0], rtol=0, atol=1e-12)

    # closed-form weights: full smoothed series and carried state
    w = smoother_weights(gains, T)
    eft_w = w["Wy"] @ y                                  # m0 = 0
    np.testing.assert_allclose(eft_w, ref_eft[0], rtol=0, atol=1e-12)
    m_w = w["My"] @ y
    np.testing.assert_allclose(np.asarray(m_carry[0, 0]), m_w, rtol=0, atol=1e-12)


def test_ihgp_chained_passes_match_compiled_reference(lib):
    """The duplicate-match quirk: init_step does NOT reset m, and getEft
    leaves m at the smoothed head state.  Chained passes must track the
    real C++ exactly."""
    dt = 0.1
    params = PARAMS[0]
    T = 19
    rng = np.random.default_rng(7)
    y = rng.normal(0, 0.3, T)
    n_passes = 4
    ref_eft, _, _ = _ref_run(lib, dt, params, y, n_passes)

    gains = stationary_gains(matern32_ssm(*params), dt)
    w = smoother_weights(gains, T)
    m0 = np.zeros(2)
    for p in range(n_passes):
        eft = w["Wy"] @ y + w["Wm"] @ m0
        m0 = w["My"] @ y + w["Mm"] @ m0
        np.testing.assert_allclose(eft, ref_eft[p], rtol=0, atol=1e-11)


@pytest.mark.parametrize("sigma2,magn,ell", PARAMS)
def test_ihgp_nll_grad_matches_compiled_reference(lib, sigma2, magn, ell):
    """getLik/getLikDeriv (the learning mode's objective) vs the real C++."""
    dt = 0.1
    T = 25
    rng = np.random.default_rng(11)
    y = rng.normal(0, 0.15, T)
    _, ref_lik, ref_deriv = _ref_run(lib, dt, (sigma2, magn, ell), y, 1)

    gains = stationary_gains(matern32_ssm(sigma2, magn, ell), dt)
    gj = {
        k: jnp.asarray(v, jnp.float64)
        for k, v in gains.as_jax_learning(jnp.float64).items()
    }
    nll, grad = ihgp_nll_grad(
        jnp.asarray(y, jnp.float64), jnp.zeros(2, jnp.float64), gj
    )
    np.testing.assert_allclose(float(nll), ref_lik[0], rtol=1e-11)
    np.testing.assert_allclose(np.asarray(grad), ref_deriv[0], rtol=1e-8, atol=1e-12)


def test_centroid_matches_compiled_reference(lib, rng):
    """Circumcenter feature vs the verbatim getCentroid extraction, over
    random clusters (f32 points, like PCL's)."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features

    for trial in range(30):
        n = int(rng.integers(3, 24))
        pts = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(0.0, 0.3, n).astype(np.float32)  # z participates in Pi/Pj
        out = np.zeros(4, np.float32)
        lib.ref_get_centroid(_fp(np.ascontiguousarray(pts)), n, np.float32(1.5), _fp(out))

        P = 32
        mm = np.zeros((1, P), bool)
        mm[0, :n] = True
        members = np.zeros((1, P), np.int32)
        members[0, :n] = np.arange(n)
        det = np.asarray(
            circumcenter_features(
                jnp.asarray(pts),
                jnp.asarray(members),
                jnp.asarray(mm),
                jnp.ones(1, bool),
                jnp.float32(1.5),
            )
        )[0]
        np.testing.assert_allclose(det[:2], out[:2], rtol=0, atol=2e-5,
                                   err_msg=f"trial {trial} n={n}")
        assert det[3] == out[3]


def test_lpf_matches_compiled_reference(lib, rng):
    from multiple_object_tracking_lidar_tpu.models.lpf import lpf_pos

    L = 10
    w = rng.normal(0, 1.0, (1, L, 4)).astype(np.float32)
    out = np.zeros(4, np.float32)
    lib.ref_lpf_pos(_fp(np.ascontiguousarray(w[0])), L, 0.03, 0.1, _fp(out))
    got = np.asarray(lpf_pos(jnp.asarray(w), 0.03, 0.1))[0]
    np.testing.assert_allclose(got, out[:2], rtol=0, atol=1e-6)


def test_interp_matches_compiled_reference(lib):
    from multiple_object_tracking_lidar_tpu.ops.assign import _interp_backfill

    L = 10
    dt = 0.1
    w = np.zeros((L, 4), np.float32)
    w[:, 0] = np.linspace(0.0, 0.9, L)
    w[:, 1] = np.linspace(1.0, 0.55, L)
    w[:, 3] = np.arange(L) * dt
    det = np.array([2.0, -0.5, 0.0, w[-1, 3] + 7 * dt], np.float32)

    w_ref = np.ascontiguousarray(w.copy())
    lost = lib.ref_interp(_fp(w_ref), L, _fp(np.ascontiguousarray(det)), dt)
    assert lost == 6

    got = np.asarray(_interp_backfill(jnp.asarray(w, jnp.float64), jnp.asarray(det, jnp.float64), dt))
    np.testing.assert_allclose(got, w_ref, rtol=0, atol=1e-6)
