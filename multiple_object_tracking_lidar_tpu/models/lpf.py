"""First-order low-pass position filter.

The reference smooths the published position with a one-pole LPF over the
last two window entries instead of the IHGP (ref: LPF_pos,
src/multiple_object_tracking_lidar.cpp:824-833; call site :638):

    pos = tau/(tau+dt) * w[L-2] + dt/(tau+dt) * w[L-1]

One fused vectorized expression over the whole track bank.
"""

from __future__ import annotations

import jax.numpy as jnp


def lpf_pos(windows: jnp.ndarray, lpf_tau: float, dt_gp: float) -> jnp.ndarray:
    """Args:
      windows: (K, L, C) track history windows; C >= 2 with x,y leading.
    Returns:
      (K, 2) low-pass filtered x,y positions.
    """
    a = lpf_tau / (lpf_tau + dt_gp)
    b = dt_gp / (lpf_tau + dt_gp)
    return a * windows[:, -2, :2] + b * windows[:, -1, :2]
