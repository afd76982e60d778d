"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is strictly single-process/single-threaded (SURVEY §2
parallelism note) — there is nothing to mirror, so the parallelism here is
designed TPU-first:

* **stream axis (dp)** — independent LiDAR streams (robots / sensors / bag
  shards) are a leading batch dimension of everything: sharding that axis
  over the mesh scales linearly with zero communication.  This is the
  production deployment shape: one chip tracks many streams, a pod tracks
  many more.

* **space axis (sp)** — one huge cloud's points are sharded across devices.
  Voxel accumulation is additive over points, so each device accumulates its
  point shard into the (small, dense) voxel grid and ONE `psum` over the
  space axis reconstitutes the global grid; the post-downsample remainder
  (clustering on the dense cell grid, association, IHGP) is tiny and runs
  replicated.  Communication per frame = one grid-sized all-reduce riding
  ICI.

Both axes compose: mesh ("stream", "space"), points (B, N, 3) sharded on
(stream, space).  Used by __graft_entry__.dryrun_multichip and validated on a
CPU-emulated 8-device mesh in tests (SURVEY §4).

Two per-device program shapes (round 4 — VERDICT r3 #1):

* **kernel fleet** (default when the config runs the onehot+grid kernel
  pipeline): each device executes the UNVMAPPED kernel program — ONE stacked
  Pallas accumulate over its local streams' points, then a `lax.scan` over
  the local streams running the same fused-CC / predicated-circumcenter /
  association kernels as the single-chip step.  `vmap` is never applied to a
  `pallas_call` (the Mosaic batcher rejects their 1-D scalar outputs), so
  the fleet program IS the single-chip kernel program per device; measured
  within ~6% of the single-chip headline on one real chip
  (docs/PERFORMANCE.md round 4 "Serving shape").  shard_map runs with
  ``check_vma=False`` — pallas_call outputs carry no varying-manual-axes
  type, so the r3 failure was the VMA checker, not the kernels.

* **vmap fleet** (non-kernel configs): the r3 shape — `vmap` over local
  streams of the jnp program.  Kernel-less by construction, kept for the
  point-list backends.
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
    optionally with per-stream point sharding over the space axis.

    ``kernel_path``: "auto" (kernel fleet when the config runs the
    onehot+grid pipeline in f32, vmap fleet otherwise) | "on" (require the
    kernel fleet — raises if the config cannot run it) | "off" (always the
    vmap fleet)."""

    tracker: Tracker
    mesh: Mesh
    kernel_path: str = "auto"

    def __post_init__(self):
        if self.kernel_path not in ("auto", "on", "off"):
            raise ValueError(f"unknown kernel_path {self.kernel_path!r}")
        cfg = self.tracker.config
        kernel_ok = (
            cfg.voxel_mode == "onehot"
            and cfg.cluster_backend == "grid"
            and jnp.dtype(cfg.dtype) == jnp.float32
        )
        if self.kernel_path == "on" and not kernel_ok:
            raise ValueError(
                "kernel_path='on' needs voxel_mode='onehot', "
                "cluster_backend='grid', dtype=float32 (got "
                f"{cfg.voxel_mode!r}/{cfg.cluster_backend!r}/{cfg.dtype!r})"
            )
        self._use_kernel_fleet = kernel_ok and self.kernel_path != "off"
        if self._use_kernel_fleet:
            self._build_kernel_fleet()
        else:
            self._build_vmap_fleet()

    # ---- kernel fleet: per-device unvmapped kernel program -----------------
    def _build_kernel_fleet(self):
        from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
            _accumulate_pallas_v3_stacked_raw,
            _accumulate_pallas_v4_stacked_raw,
            _accumulate_pallas_v5_stacked_raw,
            _accumulate_pallas_v6_stacked_raw,
            _pick_block,
            _v3_leaf_ok,
            _v5_exact_n,
            _v6_exact_n,
            finalize_exact_digits,
            finalize_fast_digits,
            voxel_accumulate_onehot_cm,
        )
        from multiple_object_tracking_lidar_tpu.ops.grid_pallas import fused_cc_fits
        from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape
        from multiple_object_tracking_lidar_tpu.tracker.pipeline import (
            _batch_table_rows,
            _perceive_batch_tables_from_dense_acc,
            _perceive_from_dense_acc,
            _perception_from_table_row,
            track_step,
        )

        # the decision scan stays conflict-exact without lax.cond (the
        # branch-VMA reconciliation is what fails under shard_map, not the
        # select-both form; results are identical by construction)
        cfg = dataclasses.replace(self.tracker.config, assoc_cond_branch=False)
        gains_xy = self.tracker.gains_xy
        leaf, leaf_z = cfg.voxel_leaf_size, cfg.leaf_z
        fast = cfg.voxel_quant == "fast"
        # exact mode at a leaf beyond the v3 digit bound has no stacked
        # digit kernel (v2 bf16x3 scheme only)
        have_stacked = fast or _v3_leaf_ok(leaf, leaf_z)
        # batched cluster-table tail (round 5): perception is stateless, so
        # the fused-CC + cluster-table chain runs ONCE batched over the
        # device's local streams instead of per stream inside the scan —
        # the same ~latency win the single-chip bind_env_multi batched body
        # measured (docs/PERFORMANCE.md round 5), bit-identical per stream
        # by construction (tests/test_dispatch.py pins the table layer).
        # Same static eligibility as the pipeline's batch_tail; the fleet
        # always has a concrete table (enforced in _env_args).  Both
        # accumulate branches produce the stacked (B, 4, n_cells) grids the
        # batched tables consume, so have_stacked is not a condition here.
        dims = grid_shape(cfg.scene, leaf, leaf_z)
        batch_tail = fused_cc_fits(dims[0] * dims[1] * dims[2]) and (
            cfg.grid_cc in ("auto", "pallas")
        )

        def local_fn(bank_state, points, mask, t, env, table):
            # points: (B_local, N_local, 3) — N sharded over "space".
            # Shapes are concrete at trace time, so the stacked-kernel block
            # choice happens here, per lowered shape.
            interpret = jax.default_backend() != "tpu"
            ptsf = points.astype(jnp.float32)
            if have_stacked:
                # pad the local point shard to a block multiple so the
                # STACKED KERNEL scheme runs at every space factor — masked
                # pad rows contribute nothing, so numerics are invariant in
                # n_space within a precision mode (VERDICT r4 #2; the old
                # per-stream jnp fallback silently changed quantization)
                pad = (-ptsf.shape[1]) % 512
                if pad:
                    ptsf = jnp.pad(ptsf, ((0, 0), (0, pad), (0, 0)))
                    mask = jnp.pad(mask, ((0, 0), (0, pad)))
            n_local = ptsf.shape[1]
            n_space = self.mesh.shape["space"]
            n_global = n_local * n_space
            block = _pick_block(n_local) if have_stacked else None
            if block is not None:
                # Accumulate RAW digit sums per shard, psum the exact
                # integers, finalize ONCE in jnp — psumming finalized f32
                # grids would reassociate the finalize rounding and make
                # results depend on the shard factor (VERDICT r4 #2).  The
                # raw path runs at EVERY space factor (including 1) so the
                # finalize is the same XLA subgraph in every mesh shape —
                # fleet results are bit-identical across n_space.  The
                # v5/v6 f32-exactness guards use the GLOBAL point count
                # (the psum total is what must stay under 2^24).
                if fast:
                    raw_fn = (
                        _accumulate_pallas_v5_stacked_raw
                        if _v5_exact_n(n_global)
                        else _accumulate_pallas_v4_stacked_raw
                    )
                    finalize = finalize_fast_digits
                else:
                    raw_fn = (
                        _accumulate_pallas_v6_stacked_raw
                        if _v6_exact_n(n_global)
                        else _accumulate_pallas_v3_stacked_raw
                    )
                    finalize = finalize_exact_digits
                raw, n_pts = raw_fn(
                    ptsf, mask, cfg.scene, leaf, leaf_z, block,
                    interpret=interpret,
                )
                raw = jax.lax.psum(raw, "space")
                n_pts = jax.lax.psum(n_pts, "space")
                accs = finalize(raw, cfg.scene, leaf, leaf_z)
            else:
                # no stacked kernel for this config (exact mode at a leaf
                # beyond the v3 digit bound -> v2 scheme): accumulate per
                # stream, unvmapped
                accs_l, n_l = [], []
                for s in range(points.shape[0]):
                    a, n1 = voxel_accumulate_onehot_cm(
                        ptsf[s], mask[s], cfg.scene, leaf, leaf_z,
                        quant=cfg.voxel_quant, with_npts=True,
                    )
                    accs_l.append(a)
                    n_l.append(n1)
                # reconstitute the global grid: accumulation is additive
                # over the space-sharded points (f32 here — the v2 scheme
                # is summation-order-dependent by design)
                accs = jax.lax.psum(jnp.stack(accs_l), "space")
                n_pts = jax.lax.psum(jnp.stack(n_l), "space")

            if batch_tail:
                # batched cluster-table tail: stacked fused CC + vmapped
                # cluster table over local streams, then the per-stream scan
                # runs only the predicated circumcenter + association +
                # filter chain (round 5; mirrors bind_env_multi's batched
                # body, bit-identical per stream by construction)
                ctab, cc_sat, n_vox, n_dyn = (
                    _perceive_batch_tables_from_dense_acc(
                        accs, env, config=cfg, table=table
                    )
                )

                def body(_, xs):
                    s = xs[0]
                    p = _perception_from_table_row(*xs[1:], config=cfg)
                    s2, out = track_step(s, p, config=cfg, gains_xy=gains_xy)
                    return (), (s2, out)

                _, (new_state, outs) = jax.lax.scan(
                    body,
                    (),
                    (bank_state,)
                    + _batch_table_rows(ctab, cc_sat, n_vox, n_dyn, t, n_pts),
                )
                return new_state, outs

            def body(_, xs):
                s, acc, t_b, npts = xs
                # the UNVMAPPED kernel tail: fused finalize+static+CC,
                # cluster table, predicated circumcenter, association —
                # the exact single-chip program, once per local stream
                p = _perceive_from_dense_acc(
                    acc, t_b, npts, env, config=cfg, table=table
                )
                s2, out = track_step(s, p, config=cfg, gains_xy=gains_xy)
                return (), (s2, out)

            _, (new_state, outs) = jax.lax.scan(
                body, (), (bank_state, accs, t, n_pts)
            )
            return new_state, outs

        state_spec = P("stream")
        self._step = jax.jit(
            jax.shard_map(
                local_fn,
                mesh=self.mesh,
                in_specs=(
                    state_spec,
                    P("stream", "space"),
                    P("stream", "space"),
                    P("stream"),
                    P(),
                    P(),
                ),
                out_specs=(state_spec, state_spec),
                # pallas_call outputs carry no varying-manual-axes type; the
                # program is manually collective-correct (one psum pair).
                # Editing local_fn? The lowered collective set is FENCED by
                # tests/test_parallel.py::
                # test_kernel_fleet_collective_set_is_exactly_two_psums —
                # keep it in sync.
                check_vma=False,
            )
        )

    # ---- vmap fleet: the r3 kernel-less shape (point-list backends) --------
    def _build_vmap_fleet(self):
        # lax.cond's branch-VMA reconciliation fails under shard_map in
        # current JAX; select-both mode is semantically identical.  The
        # association Pallas kernel does not lower under shard_map+VMAP (the
        # batcher rejects its 1-D scalar outputs), so this fleet shape pins
        # the jnp associator — decisions are bit-identical by construction
        # (tests/test_assign_pallas.py).  An EXPLICIT 'pallas' request
        # cannot be honored here and must not silently degrade (same rule
        # as grid_cc='pallas' in the pipeline, ADVICE r2); use the kernel
        # fleet (onehot+grid config) for per-device kernel execution.
        if self.tracker.config.assoc_backend == "pallas":
            raise ValueError(
                "assoc_backend='pallas' cannot run under the vmap fleet "
                "(ShardedTracker kernel_path='off'/non-grid config); use "
                "'auto'/'jnp', or the onehot+grid config for the kernel fleet"
            )
        cfg = dataclasses.replace(
            self.tracker.config, assoc_cond_branch=False, assoc_backend="jnp"
        )
        gains_xy = self.tracker.gains_xy

        def local_fn(bank_state, points, mask, t, env, table):
            del table  # the vmap fleet rebuilds static masks from env
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
                in_specs=(
                    state_spec,
                    P("stream", "space"),
                    P("stream", "space"),
                    P("stream"),
                    P(),
                    P(),
                ),
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

    def _env_args(self, env: MapEnv):
        table = self.tracker._env_table(env) if self._use_kernel_fleet else None
        if self._use_kernel_fleet and table is None:
            raise ValueError(
                "kernel fleet needs a concrete map env (the per-cell static "
                "table is host-precomputed); got a tracer/oversized window"
            )
        return env, table

    def bind_env(self, env: MapEnv):
        """Stage (env, per-cell table) on the mesh REPLICATED once and return
        ``step(state, points, mask, t)`` — per-dispatch H2D of the map data
        would otherwise dominate the fleet step (same rationale as
        Tracker.bind_env)."""
        env_h, table_h = self._env_args(env)
        rep = NamedSharding(self.mesh, P())
        env_dev = jax.device_put(env_h, rep)
        table_dev = jax.device_put(table_h, rep) if table_h is not None else None
        return lambda state, points, mask, t: self._step(
            state, points, mask, t, env_dev, table_dev
        )

    def step(self, state, points, mask, t, env: MapEnv):
        """points: (B, N, 3), mask: (B, N), t: (B,) — B % mesh.stream == 0,
        N % mesh.space == 0."""
        env_h, table_h = self._env_args(env)
        return self._step(state, points, mask, t, env_h, table_h)
