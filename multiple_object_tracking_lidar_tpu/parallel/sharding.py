"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is strictly single-process/single-threaded (SURVEY §2
parallelism note) — there is nothing to mirror, so the parallelism here is
designed TPU-first:

* **stream axis (dp)** — independent LiDAR streams (robots / sensors / bag
  shards) are a leading batch dimension of everything: `vmap` makes one
  tracker a fleet, and sharding that axis over the mesh scales linearly with
  zero communication.  This is the production deployment shape: one chip
  tracks many streams, a pod tracks many more.

* **space axis (sp)** — one huge cloud's points are sharded across devices.
  Voxel accumulation is additive over points, so each device accumulates its
  point shard into the (small, dense) voxel grid and ONE `psum` over the
  space axis reconstitutes the global grid (ops/voxel.voxel_accumulate);
  the post-downsample remainder (clustering on <= m_max_dynamic points,
  association, IHGP) is tiny and runs replicated.  Communication per frame =
  one grid-sized all-reduce riding ICI.

Both axes compose: mesh ("stream", "space"), points (B, N, 3) sharded on
(stream, space).  Used by __graft_entry__.dryrun_multichip and validated on a
CPU-emulated 8-device mesh in tests (SURVEY §4).

SINGLE-chip multi-stream serving should NOT use this class: the Pallas
kernels cannot lower under shard_map+vmap, so the fleet program runs the
kernel-less jnp paths (~300-420 aggregate clouds/s at bench shapes).  Host
multiplexing — one `Tracker.bind_env*` step, per-stream state pytrees,
round-robin dispatch — preserves the full kernel-path throughput (~1795
aggregate at B=4 measured; docs/PERFORMANCE.md "Serving shape", incl. the
two-warm-calls-per-chain rule).  ShardedTracker is for MULTI-chip
scale-out, where each device owns its streams and the only communication
is the voxel-grid psum.
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiple_object_tracking_lidar_tpu.ops.static_mask import MapEnv
from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_accumulate
from multiple_object_tracking_lidar_tpu.tracker.pipeline import (
    Tracker,
    step_from_voxel_acc,
)
from multiple_object_tracking_lidar_tpu.tracker.state import TrackerState, init_state


def make_mesh(
    n_stream: int, n_space: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_stream * n_space
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_stream, n_space)
    return Mesh(dev, ("stream", "space"))


@dataclasses.dataclass
class ShardedTracker:
    """Fleet tracking: a batch of independent streams over a device mesh,
    optionally with per-stream point sharding over the space axis."""

    tracker: Tracker
    mesh: Mesh

    def __post_init__(self):
        # lax.cond's branch-VMA reconciliation fails under shard_map in
        # current JAX; select-both mode is semantically identical.  The
        # association Pallas kernel likewise does not lower under
        # shard_map+vmap (its ShapeDtypeStruct outputs carry no VMA and the
        # batcher rejects its 1-D scalar outputs), so the fleet path pins
        # the jnp associator — decisions are bit-identical by construction
        # (tests/test_assign_pallas.py).  An EXPLICIT 'pallas' request
        # cannot be honored here and must not silently degrade (same rule
        # as grid_cc='pallas' in the pipeline, ADVICE r2).
        if self.tracker.config.assoc_backend == "pallas":
            raise ValueError(
                "assoc_backend='pallas' cannot run under shard_map "
                "(ShardedTracker); use 'auto' or 'jnp'"
            )
        cfg = dataclasses.replace(
            self.tracker.config, assoc_cond_branch=False, assoc_backend="jnp"
        )
        gains_xy = self.tracker.gains_xy

        def local_fn(bank_state, points, mask, t, env):
            # points: (B_local, N_local, 3) — N sharded over "space"
            def one(state_b, pts_b, mask_b, t_b):
                acc = voxel_accumulate(
                    pts_b.astype(jnp.dtype(cfg.dtype)),
                    mask_b,
                    cfg.scene,
                    cfg.voxel_leaf_size,
                    cfg.leaf_z,
                )
                acc = jax.lax.psum(acc, "space")
                n_pts = jax.lax.psum(mask_b.sum(), "space")
                return step_from_voxel_acc(
                    state_b, acc, t_b, n_pts, env, config=cfg, gains_xy=gains_xy
                )

            return jax.vmap(one, in_axes=(0, 0, 0, 0))(bank_state, points, mask, t)

        state_spec = P("stream")
        self._step = jax.jit(
            jax.shard_map(
                local_fn,
                mesh=self.mesh,
                in_specs=(state_spec, P("stream", "space"), P("stream", "space"), P("stream"), P()),
                out_specs=(state_spec, state_spec),
            )
        )

    def init_state(self, batch: int) -> TrackerState:
        cfg = self.tracker.config
        one = init_state(cfg.caps.k_max_tracks, cfg.data_length, jnp.dtype(cfg.dtype))
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one
        )
        shard = NamedSharding(self.mesh, P("stream"))
        return jax.tree.map(lambda x: jax.device_put(x, shard), batched)

    def step(self, state, points, mask, t, env: MapEnv):
        """points: (B, N, 3), mask: (B, N), t: (B,) — B % mesh.stream == 0,
        N % mesh.space == 0."""
        return self._step(state, points, mask, t, env)
