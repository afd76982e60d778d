"""Infinite-Horizon Gaussian Process filter/smoother (Solin et al., NeurIPS 2018).

TPU-first reorganization of the reference implementation
(ref: src/ihgp/InfiniteHorizonGP.cpp):

* The reference constructs one InfiniteHorizonGP object per track per axis and
  recomputes expm/DARE/gains in every constructor (cpp:12-97) even though the
  results depend only on (dt, hyperparameters) — which are fixed config values
  (cpp:522-534).  Here the stationary gains are computed ONCE on host in
  float64 (`stationary_gains`) and baked into the jitted step as constants.

* Per-track runtime state is exactly one 2-vector per axis: the reference's
  `m`.  Note `init_step()` (cpp:108-130) does NOT reset `m`, and the backward
  pass `getEft()` (cpp:164-196) leaves `m` at the smoothed state of window
  position 0 — so each frame's filter starts from the previous frame's
  smoothed head-of-window state.  We reproduce that by carrying `m0` in the
  track bank and returning the new carry from `ihgp_filter_smoother`.

* The forward filter (cpp:132-162) and backward RTS smoother (cpp:164-196)
  become `lax.scan`s, vmapped over the whole track bank x {x,y} axes so all
  tracks are filtered in one fused dispatch.

The likelihood/gradient recursions (cpp:141-154) power the optional
hyperparameter-learning mode (the reference's dead IHGP_nonfixed, cpp:922-1011).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import expm as _expm

from multiple_object_tracking_lidar_tpu.models.matern32 import Matern32SSM

# The reference's truncated pi constant (cpp:135) — kept for bit-parity of NLL.
REF_PI = 3.141592654

DARE_EPS = 1e-10   # cpp:9
DARE_MAXIT = 100   # cpp:10


def dare_fixed_point(A: np.ndarray, B: np.ndarray, Q: np.ndarray, R: float) -> np.ndarray:
    """Fixed-point DARE solver, same iteration as the reference (cpp:213-252).

    NB like the reference: only valid for scalar R (and possibly zero B).
    Host-side float64.
    """
    dim = A.shape[0]
    X = np.eye(dim)
    for _ in range(DARE_MAXIT):
        X_prev = X
        if abs(R) < 1e-15:
            K = np.zeros((dim, B.shape[0]))
        else:
            K = A @ (X @ B.T / ((B @ X @ B.T)[0, 0] + R))
        X = (A - K @ B) @ X @ (A - K @ B).T + K * R @ K.T + Q
        if np.linalg.norm(X - X_prev, "fro") < DARE_EPS:
            break
    return X


@dataclasses.dataclass(frozen=True)
class IHGPGains:
    """Stationary quantities; all host-side float64 NumPy.

    Derivative arrays (for the learning mode) are stacked over the parameter
    axis (sigma2, magnSigma2, lengthScale), matching the reference's dF order.
    """

    A: np.ndarray        # (2,2) discrete transition, expm(F dt)    (cpp:15)
    Q: np.ndarray        # (2,2) process noise                      (cpp:16)
    S: float             # innovation variance                      (cpp:27)
    K: np.ndarray        # (2,) stationary Kalman gain              (cpp:30)
    PF: np.ndarray       # (2,2) stationary filtered covariance     (cpp:33)
    HA: np.ndarray       # (2,) (H A)^T                             (cpp:36)
    AKHA: np.ndarray     # (2,2) A - K H A                          (cpp:37)
    G: np.ndarray        # (2,2) stationary RTS smoother gain       (cpp:168-170)
    # learning-mode derivatives (cpp:63-92)
    dS: np.ndarray       # (3,)
    dK: np.ndarray       # (3,2)
    dAKHA: np.ndarray    # (3,2,2)
    HdA: np.ndarray      # (3,2)

    def as_jax(self, dtype=jnp.float32) -> dict:
        """Trace-time constants for the fast path (no derivative tensors).

        HOST numpy, not device arrays: these leaves get closed over by the
        jitted step, and jax.jit.lower() fetches device-resident closure
        constants back to host to embed them as HLO literals — and on this
        stack the first device->host readback permanently flips the runtime
        client into a ~17x slower dispatch mode (docs/PERFORMANCE.md).
        numpy leaves embed identically with no readback."""
        return {
            "A": np.asarray(self.A, dtype),
            "K": np.asarray(self.K, dtype),
            "HA": np.asarray(self.HA, dtype),
            "AKHA": np.asarray(self.AKHA, dtype),
            "G": np.asarray(self.G, dtype),
            "S": np.asarray(self.S, dtype),
        }

    def as_jax_learning(self, dtype=jnp.float32) -> dict:
        d = self.as_jax(dtype)
        d.update(
            dS=np.asarray(self.dS, dtype),
            dK=np.asarray(self.dK, dtype),
            dAKHA=np.asarray(self.dAKHA, dtype),
            HdA=np.asarray(self.HdA, dtype),
        )
        return d


def stationary_gains(ssm: Matern32SSM, dt: float) -> IHGPGains:
    """All stationary filter/smoother quantities for one axis.

    Mirrors the reference constructor (cpp:12-97) + the smoother-gain solve
    from getEft (cpp:166-170), in float64 on host.
    """
    F, Pinf, H, R = ssm.F, ssm.Pinf, ssm.H, ssm.R
    dim = F.shape[0]

    A = _expm(F * dt)                       # cpp:15
    Q = Pinf - A @ Pinf @ A.T               # cpp:16

    PP = dare_fixed_point(A, H, Q, R)       # cpp:23
    S = float((H @ PP @ H.T)[0, 0] + R)     # cpp:27
    K = (PP @ H.T / S)[:, 0]                # cpp:30
    PF = PP - np.outer(K, H @ PP)           # cpp:33
    HA = (H @ A)[0, :]                      # cpp:36
    AKHA = A - np.outer(K, H @ A)           # cpp:37

    # Smoother gain G = solve(A PF A^T + Q, A PF)^T  (cpp:166-170)
    PPs = A @ PF @ A.T + Q
    G = np.linalg.solve(PPs, A @ PF).T

    # Derivatives via Van Loan block expm + DARE (cpp:49-92)
    nparam = ssm.dF.shape[0]
    AK = A @ K[:, None]                     # (2,1)
    dS = np.zeros(nparam)
    dK = np.zeros((nparam, dim))
    dAKHA = np.zeros((nparam, dim, dim))
    HdA = np.zeros((nparam, dim))
    for j in range(nparam):
        FF = np.zeros((2 * dim, 2 * dim))
        FF[:dim, :dim] = F
        FF[dim:, dim:] = F
        FF[dim:, :dim] = ssm.dF[j]
        AA = _expm(FF * dt)
        dA = AA[dim:, :dim]
        dQ = ssm.dPinf[j] - dA @ Pinf @ A.T - A @ ssm.dPinf[j] @ A.T - A @ Pinf @ dA.T
        dQ = 0.5 * (dQ + dQ.T)
        C = (
            dA @ PP @ A.T
            + A @ PP @ dA.T
            - dA @ PP @ H.T @ AK.T
            - AK @ H @ PP @ dA.T
            + AK * ssm.dR[j] @ AK.T
            + dQ
        )
        C = 0.5 * (C + C.T)
        dPP = dare_fixed_point(A - AK @ H, np.zeros((dim, dim)), C, 0.0)
        dS[j] = (H @ dPP @ H.T)[0, 0] + ssm.dR[j]
        dK[j] = (dPP @ H.T / S - PP @ H.T * (((H @ dPP @ H.T)[0, 0] + ssm.dR[j]) / S / S))[:, 0]
        dAKHA[j] = dA - np.outer(dK[j], H @ A) - np.outer(K, H @ dA)
        HdA[j] = (H @ dA)[0, :]

    return IHGPGains(
        A=A, Q=Q, S=S, K=K, PF=PF, HA=HA, AKHA=AKHA, G=G,
        dS=dS, dK=dK, dAKHA=dAKHA, HdA=HdA,
    )


# ---------------------------------------------------------------------------
# Device-side scans (fast path)
# ---------------------------------------------------------------------------

def ihgp_filter_smoother(y: jax.Array, m0: jax.Array, gains: dict) -> tuple[jax.Array, jax.Array]:
    """Forward filter + backward smoother over one window of one scalar series.

    Args:
      y: (L,) observations (already mean-centered by the caller).
      m0: (2,) filter state carried in from the previous frame (see module doc).
      gains: device constants from IHGPGains.as_jax.

    Returns:
      eft: (L,) smoothed posterior mean at every window position
           (== reference getEft(), cpp:164-196).
      m_carry: (2,) smoothed state at window position 0 — the value the
           reference leaves in `m` after getEft, i.e. next frame's m0.
    """
    AKHA, K, A, G = gains["AKHA"], gains["K"], gains["A"], gains["G"]

    def fwd(m, yk):
        m = AKHA @ m + K * yk            # cpp:157
        return m, m

    _, MF = jax.lax.scan(fwd, m0, y)     # MF: (L,2) — cpp:160's stored means

    def bwd(m, mf):
        m_s = mf + G @ (m - A @ mf)      # cpp:187
        return m_s, m_s

    m_last = MF[-1]
    m_carry, ms_rev = jax.lax.scan(bwd, m_last, MF[:-1][::-1])
    # eft[k] = H m_s[k] = m_s[k][0]; last position stays at the filtered value
    # (the reference smooths positions L-2..0 only, cpp:181-189).
    eft = jnp.concatenate([ms_rev[::-1, 0], m_last[0:1]], axis=0)
    return eft, m_carry


def ihgp_batch(y: jax.Array, m0: jax.Array, gains_xy: dict) -> tuple[jax.Array, jax.Array]:
    """Filter+smooth the whole track bank in one dispatch.

    Args:
      y: (K, 2, L) mean-centered series per track per axis {x, y}.
      m0: (K, 2, 2) carried filter states.
      gains_xy: gains dict whose leaves have a leading axis of size 2 (x, y).

    Returns:
      eft: (K, 2, L), m_carry: (K, 2, 2).
    """
    over_axes = jax.vmap(ihgp_filter_smoother, in_axes=(0, 0, 0))   # over {x,y}
    over_bank = jax.vmap(over_axes, in_axes=(0, 0, None))           # over tracks
    return over_bank(y, m0, gains_xy)


# ---------------------------------------------------------------------------
# Closed-form weights: the stationary smoother is LTI, so it IS a matrix
# ---------------------------------------------------------------------------

def smoother_weights(gains: IHGPGains, length: int) -> dict:
    """Collapse the stationary forward filter + backward RTS smoother over a
    fixed-length window into precomputed linear maps (host, float64).

    The per-frame computation the reference performs with per-sample loops
    (update() x L then getEft(), cpp:132-196) is linear in (y, m0) with
    CONSTANT matrices — a stationary Kalman smoother is an LTI system.  So:

        eft      = Wy  @ y + Wm  @ m0        (smoothed mean per position)
        m_carry  = My  @ y + Mm  @ m0        (smoothed head state -> next m0)

    On device the velocity estimate needs only eft[-1]: one dot product per
    track per axis, a single MXU dispatch for the whole bank — replacing
    2 x L sequential 2x2 scan steps.  Exact same math, zero recurrences.

    Returns {"Wy": (L, L), "Wm": (L, 2), "My": (2, L), "Mm": (2, 2)}.
    """
    A, AKHA, K, G = gains.A, gains.AKHA, gains.K, gains.G

    # forward filter: m_t = AKHA m_{t-1} + K y_t; propagate Jacobians
    J = np.zeros((length, 2, length))   # dMF[t]/dy
    B = np.zeros((length, 2, 2))        # dMF[t]/dm0
    Jp = np.zeros((2, length))
    Bp = np.eye(2)
    for t in range(length):
        Jp = AKHA @ Jp
        Jp[:, t] += K
        Bp = AKHA @ Bp
        J[t] = Jp
        B[t] = Bp

    # backward smoother: m_s[k] = MF[k] + G (m_s[k+1] - A MF[k])
    Js = J[-1].copy()
    Bs = B[-1].copy()
    Wy = np.zeros((length, length))
    Wm = np.zeros((length, 2))
    Wy[-1] = Js[0]
    Wm[-1] = Bs[0]
    for k in range(length - 2, -1, -1):
        Js = J[k] + G @ (Js - A @ J[k])
        Bs = B[k] + G @ (Bs - A @ B[k])
        Wy[k] = Js[0]
        Wm[k] = Bs[0]

    return {"Wy": Wy, "Wm": Wm, "My": Js, "Mm": Bs}


def smoother_weights_xy(
    gains_x: IHGPGains, gains_y: IHGPGains, length: int, dtype=jnp.float32
) -> dict:
    """Per-axis weights stacked on a leading {x, y} axis, as HOST constants
    (numpy — embedded as literals at lowering; see IHGPGains.as_jax for why
    device-resident closure constants are poison on this stack)."""
    wx = smoother_weights(gains_x, length)
    wy = smoother_weights(gains_y, length)
    return {
        k: np.stack([np.asarray(wx[k], dtype), np.asarray(wy[k], dtype)])
        for k in wx
    }


def ihgp_apply_weights(y: jax.Array, m0: jax.Array, w: dict) -> tuple[jax.Array, jax.Array]:
    """Batched closed-form smoother: y (K, 2, L), m0 (K, 2, 2) ->
    (eft_last (K, 2), m_carry (K, 2, 2)).  One fused einsum bundle."""
    eft_last = jnp.einsum("kal,al->ka", y, w["Wy"][:, -1, :]) + jnp.einsum(
        "kas,as->ka", m0, w["Wm"][:, -1, :]
    )
    m_carry = jnp.einsum("kal,asl->kas", y, w["My"]) + jnp.einsum(
        "kas,ats->kat", m0, w["Mm"]
    )
    return eft_last, m_carry


# ---------------------------------------------------------------------------
# Learning mode: marginal likelihood + gradient recursions (cpp:132-162)
# ---------------------------------------------------------------------------

def ihgp_nll_grad(y: jax.Array, m0: jax.Array, gains: dict) -> tuple[jax.Array, jax.Array]:
    """Negative log marginal likelihood and its gradient w.r.t.
    (sigma2, magnSigma2, lengthScale) over one window.

    Matches the reference's edata/gdata recursions (cpp:141-154) with
    dm initialized to zero per window (cpp:90, init of dm; the reference
    never resets dm in init_step — a latent bug we do not reproduce since
    the learning path was dead code there).
    """
    AKHA, K, HA, S = gains["AKHA"], gains["K"], gains["HA"], gains["S"]
    dS, dK, dAKHA, HdA = gains["dS"], gains["dK"], gains["dAKHA"], gains["HdA"]
    nparam = dS.shape[0]

    def step(carry, yk):
        m, dm, edata, gdata = carry
        v = yk - HA @ m
        edata = edata + 0.5 * v * v / S + 0.5 * jnp.log(2 * REF_PI) + 0.5 * jnp.log(S)
        dv = -(HdA @ m) - dm @ HA                      # (3,)
        gdata = gdata + v * dv / S - 0.5 * v * v * dS / S / S + 0.5 * dS / S
        dm = (dAKHA @ m) + dm @ AKHA.T + dK * yk       # (3,2)
        m = AKHA @ m + K * yk
        return (m, dm, edata, gdata), None

    init = (
        m0,
        jnp.zeros((nparam, 2), dtype=y.dtype),
        jnp.zeros((), dtype=y.dtype),
        jnp.zeros((nparam,), dtype=y.dtype),
    )
    (m, dm, edata, gdata), _ = jax.lax.scan(step, init, y)
    return edata, gdata
