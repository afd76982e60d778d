"""Regression guard: the jitted step must close over NO device-resident
constants.

jax.jit.lower() fetches device-resident closure constants back to host to
embed them as HLO literals.  On the deployment stack (axon TPU tunnel) the
FIRST device->host readback permanently flips the runtime client from
~13 us to ~220 us per dispatch (docs/PERFORMANCE.md "dispatch modes"), so a
single jnp-typed constant captured by `_step_impl` silently costs ~20% of
single-frame throughput.  All trace-time constants (IHGP gains, smoother
weights, sentinels) must therefore be host numpy — this test pins that.
"""

from functools import partial

import jax
import numpy as np

from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker, _step_impl
from multiple_object_tracking_lidar_tpu.tracker.state import Frame
import jax.numpy as jnp


def _device_consts(closed):
    return [
        (type(c).__name__, getattr(c, "dtype", None), getattr(c, "shape", None))
        for c in closed.consts
        if isinstance(c, jax.Array)
    ]


def _trace(cfg, fixture_map):
    tracker = Tracker(cfg)
    env = build_static_mask(fixture_map, cfg.static_tolarance, cfg.occupied_threshold)
    env_dev, table_dev = tracker._env_args(env)
    state = tracker.init_state()
    n = cfg.caps.n_max_points
    frame = Frame(
        points=jnp.zeros((n, 3), jnp.float32),
        mask=jnp.zeros((n,), bool),
        t=jnp.float32(0.0),
    )
    fn = partial(_step_impl, config=cfg, gains_xy=tracker.gains_xy)
    return jax.make_jaxpr(fn)(state, frame, env_dev, table_dev)


def test_step_has_no_device_consts(fixture_map, tiny_config):
    closed = _trace(tiny_config, fixture_map)
    bad = _device_consts(closed)
    assert not bad, (
        "device-resident closure constants in the jitted step (lowering them "
        f"costs a dispatch-mode-flipping D2H readback): {bad}"
    )


def test_step_grid_backend_has_no_device_consts(fixture_map, tiny_config):
    cfg = tiny_config.replace(cluster_backend="grid")
    closed = _trace(cfg, fixture_map)
    bad = _device_consts(closed)
    assert not bad, (
        "device-resident closure constants in the grid-backend step: "
        f"{bad}"
    )


def test_gains_are_host_numpy(tiny_config):
    tracker = Tracker(tiny_config)
    for path, leaf in jax.tree_util.tree_leaves_with_path(tracker.gains_xy):
        assert isinstance(leaf, np.ndarray), (
            f"gains leaf {jax.tree_util.keystr(path)} is {type(leaf)}; must be "
            "host numpy (device arrays become lowering-time D2H readbacks)"
        )
