"""IHGP hyperparameter learning — the reference's dead code, resurrected.

The reference ships a fully-commented-out gradient-descent loop on the GP
hyperparameters (`IHGP_nonfixed`, ref: src/multiple_object_tracking_lidar.cpp:922-1011)
with its `param_fix` flag read but never consulted (cpp:114).  The gradient
machinery it would have used (dS/dK/dAKHA recursions, InfiniteHorizonGP.cpp:63-92,
141-154) is implemented here in pure JAX — expm, the fixed-point DARE, and the
Van Loan block-expm all on device — so one *training step* is a single jitted
function: vmapped NLL-gradient over a batch of track windows, summed, and an
SGD update with the reference's intended learning rates and clamps
(cpp:950-966: lr 0.1 on logMagnSigma2, 0.01 on logLengthScale, sigma2 frozen,
clamps to [-10, 10], NaN/Inf re-init to 1.0, cpp:978-989).

Being pure JAX, the step vmaps over tracks and shards over a device mesh
(data-parallel windows + gradient psum) — see parallel/sharding.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as jexpm

from multiple_object_tracking_lidar_tpu.models.ihgp import ihgp_nll_grad

DARE_ITERS = 100  # fixed trip count on device (ref caps at 100, cpp:10)


def matern32_jax(log_params: jax.Array) -> dict:
    """log_params = (logSigma2, logMagnSigma2, logLengthScale) -> SSM tensors.
    Mirrors Matern32model::updateModel (ref Matern32model.cpp:15-46)."""
    sigma2, magn_sigma2, ls = jnp.exp(log_params)
    lam = jnp.sqrt(3.0) / ls
    F = jnp.array([[0.0, 1.0], [0.0, 0.0]]).astype(log_params.dtype)
    F = F.at[1, 0].set(-lam * lam).at[1, 1].set(-2 * lam)
    Pinf = jnp.diag(jnp.stack([magn_sigma2, magn_sigma2 * lam * lam]))
    dF = jnp.zeros((3, 2, 2), log_params.dtype)
    dF = dF.at[2, 1, 0].set(6.0 / ls**3).at[2, 1, 1].set(2.0 * lam / ls)
    dPinf = jnp.zeros((3, 2, 2), log_params.dtype)
    dPinf = dPinf.at[1, 0, 0].set(1.0).at[1, 1, 1].set(3.0 / ls**2)
    dPinf = dPinf.at[2, 1, 1].set(-6.0 * magn_sigma2 / ls**3)
    dR = jnp.array([1.0, 0.0, 0.0], log_params.dtype)
    return {"F": F, "Pinf": Pinf, "R": sigma2, "dF": dF, "dPinf": dPinf, "dR": dR}


def _dare_meas(A, H, Q, R):
    """Kalman DARE with scalar R > 0, fixed 100-iteration device loop
    (ref InfiniteHorizonGP.cpp:213-252)."""

    def body(_, X):
        K = A @ (X @ H.T / ((H @ X @ H.T)[0, 0] + R))
        AKB = A - K @ H
        return AKB @ X @ AKB.T + K * R @ K.T + Q

    return jax.lax.fori_loop(0, DARE_ITERS, body, jnp.eye(2, dtype=A.dtype))


def _dare_lyap(A, C):
    """The derivative DARE specializes to a discrete Lyapunov recursion
    (B = 0, R = 0 -> K = 0; cpp:236-238)."""

    def body(_, X):
        return A @ X @ A.T + C

    return jax.lax.fori_loop(0, DARE_ITERS, body, jnp.eye(2, dtype=A.dtype))


def stationary_gains_jax(log_params: jax.Array, dt: float) -> dict:
    """Device-side equivalent of models.ihgp.stationary_gains (learning path).
    Differentiable in the sense that all derivative tensors are computed
    analytically on device; one dispatch per hyperparameter update."""
    ssm = matern32_jax(log_params)
    F, Pinf, R = ssm["F"], ssm["Pinf"], ssm["R"]
    H = jnp.array([[1.0, 0.0]], log_params.dtype)

    A = jexpm(F * dt)
    Q = Pinf - A @ Pinf @ A.T
    PP = _dare_meas(A, H, Q, R)
    S = (H @ PP @ H.T)[0, 0] + R
    K = (PP @ H.T / S)[:, 0]
    PF = PP - jnp.outer(K, H @ PP)
    HA = (H @ A)[0, :]
    AKHA = A - jnp.outer(K, H @ A)
    PPs = A @ PF @ A.T + Q
    G = jnp.linalg.solve(PPs, A @ PF).T

    AK = (A @ K)[:, None]

    def per_param(dFj, dPinfj, dRj):
        FF = jnp.zeros((4, 4), log_params.dtype)
        FF = FF.at[:2, :2].set(F).at[2:, 2:].set(F).at[2:, :2].set(dFj)
        AA = jexpm(FF * dt)
        dA = AA[2:, :2]
        dQ = dPinfj - dA @ Pinf @ A.T - A @ dPinfj @ A.T - A @ Pinf @ dA.T
        dQ = 0.5 * (dQ + dQ.T)
        C = (
            dA @ PP @ A.T
            + A @ PP @ dA.T
            - dA @ PP @ H.T @ AK.T
            - AK @ H @ PP @ dA.T
            + AK * dRj @ AK.T
            + dQ
        )
        C = 0.5 * (C + C.T)
        dPP = _dare_lyap(A - AK @ H, C)
        dSj = (H @ dPP @ H.T)[0, 0] + dRj
        dKj = (dPP @ H.T / S - PP @ H.T * (dSj / S / S))[:, 0]
        dAKHAj = dA - jnp.outer(dKj, H @ A) - jnp.outer(K, H @ dA)
        HdAj = (H @ dA)[0, :]
        return dSj, dKj, dAKHAj, HdAj

    dS, dK, dAKHA, HdA = jax.vmap(per_param)(ssm["dF"], ssm["dPinf"], ssm["dR"])
    return {
        "A": A, "K": K, "HA": HA, "AKHA": AKHA, "G": G, "S": S,
        "dS": dS, "dK": dK, "dAKHA": dAKHA, "HdA": HdA,
    }


@partial(jax.jit, static_argnames=("dt", "lr_magn", "lr_ls"))
def learning_step(
    log_params: jax.Array,     # (3,) [logSigma2, logMagnSigma2, logLengthScale]
    y: jax.Array,              # (B, L) mean-centered windows (one axis)
    mask: jax.Array,           # (B,) which windows count
    dt: float,
    lr_magn: float = 0.1,      # cpp:952
    lr_ls: float = 0.01,       # cpp:953
) -> tuple[jax.Array, jax.Array]:
    """One SGD step on (logMagnSigma2, logLengthScale); returns
    (new_log_params, mean NLL).  Reference semantics: sigma2 frozen
    (cpp:951 commented out), clamps to [-10, 10], bad values re-init."""
    gains = stationary_gains_jax(log_params, dt)
    m0 = jnp.zeros((2,), y.dtype)
    nlls, grads = jax.vmap(lambda yy: ihgp_nll_grad(yy, m0, gains))(y)
    w = mask.astype(y.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    nll = (nlls * w).sum() / denom
    grad = (grads * w[:, None]).sum(0) / denom
    # log-transform chain rule: dLik/dlog(p) = p * dLik/dp (cpp:939-941)
    theta = jnp.exp(log_params)
    glog = theta * grad
    new = log_params.at[1].add(-lr_magn * glog[1]).at[2].add(-lr_ls * glog[2])
    new = jnp.clip(new, -10.0, 10.0)                      # cpp:961-966
    bad = ~jnp.isfinite(new)                              # cpp:978-989
    new = jnp.where(bad, jnp.zeros_like(new), new)        # exp(0) = 1.0 re-init
    return new, nll
