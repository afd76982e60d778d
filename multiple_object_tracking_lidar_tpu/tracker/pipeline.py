"""The fused per-frame tracking step.

Architecture: the reference's whole callback chain — voxel downsample →
static-point removal → Euclidean clustering → circumcenter features →
greedy association → LPF/IHGP filtering → expiry (ref: cloudCallback,
src/multiple_object_tracking_lidar.cpp:123-233 and callees) — becomes ONE
pure jitted function ``step(state, frame) -> (state, output)`` over fixed
shapes.  A frame never round-trips to host between stages; the host only
decodes PointCloud2 bytes in and serializes small outputs.

First-frame and empty-frame semantics are folded into the same compiled
program with masks (no recompilation, no host branching):
  * map not ready        -> host gates the call (cpp:128-131)
  * no detections        -> no state change, no publish (cpp:146-150, 170-174)
  * first non-empty frame-> register-only, no publish/filter/expiry
                            (cpp:126-161)
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.config import TrackerConfig
from multiple_object_tracking_lidar_tpu.models.ihgp import (
    ihgp_apply_weights,
    smoother_weights_xy,
    stationary_gains,
)
from multiple_object_tracking_lidar_tpu.models.lpf import lpf_pos
from multiple_object_tracking_lidar_tpu.models.matern32 import matern32_from_log
from multiple_object_tracking_lidar_tpu.ops.assign import associate_and_update
from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features_sorted
from multiple_object_tracking_lidar_tpu.ops.cluster import euclidean_cluster
from multiple_object_tracking_lidar_tpu.ops.compact import compact_points
from multiple_object_tracking_lidar_tpu.ops.static_mask import MapEnv, remove_static
from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_accumulate, voxel_finalize
from multiple_object_tracking_lidar_tpu.tracker.state import (
    Frame,
    FrameOutput,
    TrackerState,
    init_state,
)


class Tracker:
    """Binds a TrackerConfig to a compiled step function.

    Stationary IHGP gains are computed once here, on host in float64
    (the reference re-solves expm+DARE in every track constructor,
    cpp:533-534 — wasteful; they depend only on config).
    """

    def __init__(self, config: TrackerConfig):
        self.config = config
        self.gains_x, self.gains_y, self.gains_xy = self.compute_gains(
            config,
            (config.logSigma2_x, config.logMagnSigma2_x, config.logLengthScale_x),
            (config.logSigma2_y, config.logMagnSigma2_y, config.logLengthScale_y),
        )
        self._step = jax.jit(partial(_step_impl, config=config, gains_xy=self.gains_xy))

    @staticmethod
    def compute_gains(
        config: TrackerConfig,
        log_x: tuple[float, float, float],
        log_y: tuple[float, float, float],
    ):
        """Host-f64 stationary gains + LTI smoother weights for explicit
        (logSigma2, logMagnSigma2, logLengthScale) per axis.  Cheap (2x2
        closed forms) — online hyperparameter learning calls this per update
        and swaps the result into a gains-as-argument step (bind_env_gains)
        with no recompile."""
        dtype = jnp.dtype(config.dtype)
        gx = stationary_gains(matern32_from_log(*log_x), config.dt_gp)
        gy = stationary_gains(matern32_from_log(*log_y), config.dt_gp)
        # stack x/y gains on a leading axis for the vmapped batch filter.
        # HOST numpy throughout: these leaves are closed over by the jitted
        # step, and lowering device-resident closure constants costs a D2H
        # readback that permanently flips this stack's runtime client into a
        # ~17x slower dispatch mode (docs/PERFORMANCE.md).
        gains_xy = jax.tree.map(
            lambda a, b: np.stack([np.asarray(a, dtype), np.asarray(b, dtype)]),
            gx.as_jax(dtype),
            gy.as_jax(dtype),
        )
        # closed-form smoother weights (see models.ihgp.smoother_weights):
        # the per-frame GP collapses to one matvec per axis on device
        gains_xy["W_vel"] = smoother_weights_xy(gx, gy, config.data_length - 1, dtype)
        gains_xy["W_pos"] = smoother_weights_xy(gx, gy, config.data_length, dtype)
        return gx, gy, gains_xy

    def init_state(self) -> TrackerState:
        return init_state(
            self.config.caps.k_max_tracks,
            self.config.data_length,
            jnp.dtype(self.config.dtype),
        )

    def step(self, state: TrackerState, frame: Frame, env: MapEnv):
        return self._step(state, frame, env, self._env_table(env))

    def _env_table(self, env: MapEnv):
        """Per-cell static table for the dense-grid path (None otherwise);
        requires a concrete env.  Cached by map content in static_mask."""
        if self.config.cluster_backend != "grid":
            return None
        from multiple_object_tracking_lidar_tpu.ops.static_mask import (
            get_cell_static_table,
        )
        from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape

        dims = grid_shape(self.config.scene, self.config.voxel_leaf_size, self.config.leaf_z)
        return get_cell_static_table(
            env, self.config.scene, self.config.voxel_leaf_size, *dims
        )

    def _env_args(self, env: MapEnv):
        """Device-resident (env, table) to pass as jit ARGUMENTS.  Baking
        them into the program as closure constants costs ~0.3 ms/dispatch on
        this stack (the runtime re-stages large literals per execution —
        docs/PERFORMANCE.md), so bound steps take them as donated-free args."""
        env_dev = jax.device_put(env)
        table = self._env_table(env)
        table_dev = jax.device_put(table) if table is not None else None
        return env_dev, table_dev

    def bind_env(self, env: MapEnv, donate_state: bool = True):
        """Specialize the step on a fixed map: the map env and the per-cell
        static table are staged on device ONCE and passed as arguments each
        dispatch, and the track state is donated.  Re-bind on map updates
        (rare).  Returns ``step(state, frame) -> (state, output)``.

        Frame staging note: XLA's parameter-layout heuristic assigns
        (N, 3) float params a transposed {0,1} layout while the accumulator
        custom call wants standard {1,0}, costing ~77 us/frame of relayout
        copies.  Callers that stage a reusable frame ring should pin the
        layout (see bench._stage_frames) — the round-2 "pinning is a wash"
        finding applied only to operands re-staged every dispatch, where
        the relayout merely moves into the transfer."""
        cfg, gains = self.config, self.gains_xy
        env_dev, table_dev = self._env_args(env)
        step = jax.jit(
            partial(_step_impl, config=cfg, gains_xy=gains),
            donate_argnums=(0,) if donate_state else (),
        )
        return lambda state, frame: step(state, frame, env_dev, table_dev)

    def bind_env_gains(self, env: MapEnv, donate_state: bool = True):
        """Like bind_env, but the IHGP gains ride as a jit ARGUMENT:
        ``step(state, frame, gains_xy) -> (state, output)``.  Online
        hyperparameter learning (param_fix=False) swaps updated gains in
        per call with zero recompilation — the array shapes never change."""
        cfg = self.config
        env_dev, table_dev = self._env_args(env)
        step = jax.jit(
            lambda state, frame, gains, env_a, table_a: _step_impl(
                state, frame, env_a, table_a, config=cfg, gains_xy=gains
            ),
            donate_argnums=(0,) if donate_state else (),
        )
        return lambda state, frame, gains: step(
            state, frame, gains, env_dev, table_dev
        )

    def bind_env_multi(
        self, env: MapEnv, donate_state: bool = True, hoist: str = "auto"
    ):
        """Like bind_env, but processes a BATCH OF CONSECUTIVE FRAMES of one
        stream per dispatch via `lax.scan` — bit-identical to calling step()
        frame by frame (same sequential state chain), with per-dispatch host/
        RPC overhead amortized across the batch.  Frames arrive stacked on a
        leading axis: ``multi_step(state, frames) -> (state, outputs)``.

        On the onehot+grid TPU path the voxel accumulation of ALL frames is
        hoisted out of the scan into one stacked kernel call (per-frame
        results bit-identical — tests/test_grid.py): scanning the per-frame
        kernel instead pays ~90 us/frame of tiled->linear relayout copies on
        the sliced (N, 3) operand (docs/PERFORMANCE.md round 3).

        On top of the hoisted accumulate, the full CLUSTER-TABLE perception
        (stacked fused CC + vmapped cluster_table_grid) also runs batched
        ahead of the scan when the kernel tail is eligible — bit-identical
        by construction (every table output is integer-exact; see
        _perceive_batch_tables_from_dense_acc) and ~25 us/cloud cheaper on
        the round-5 timeline; only the circumcenter + association + filter
        chain stays per-frame in the scan.

        ``hoist``: "auto" (most-batched eligible body on TPU for the
        onehot+grid f32 config) | "on" (force the hoisted accumulate +
        per-frame perception scan — off-TPU the stacked kernel runs in
        interpret mode, letting the CPU suite execute this exact body;
        ADVICE r3) | "batch" (force the batched-perception body, interpret
        kernels off-TPU — the CPU bit-parity suite runs this exact body) |
        "off" (always the per-frame scan)."""
        cfg, gains = self.config, self.gains_xy
        env_dev, table_dev = self._env_args(env)

        if hoist not in ("auto", "on", "batch", "off"):
            raise ValueError(f"unknown hoist {hoist!r}")
        kernel_cfg = (
            cfg.voxel_mode == "onehot"
            and cfg.cluster_backend == "grid"
            and jnp.dtype(cfg.dtype) == jnp.float32
        )
        if hoist in ("on", "batch") and not kernel_cfg:
            raise ValueError(
                f"hoist={hoist!r} needs voxel_mode='onehot', "
                f"cluster_backend='grid', dtype=float32 (got "
                f"{cfg.voxel_mode!r}/{cfg.cluster_backend!r}/{cfg.dtype!r})"
            )
        hoist_acc = kernel_cfg and (
            hoist in ("on", "batch")
            or (hoist == "auto" and jax.default_backend() == "tpu")
        )
        # batched-perception eligibility: the same conditions under which
        # _perceive_from_dense_acc would take the fused-CC kernel path (a
        # concrete map table, f32, VMEM-resident grid) — the batched tail is
        # that exact kernel program stacked over frames
        from multiple_object_tracking_lidar_tpu.ops.grid_pallas import fused_cc_fits
        from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape

        _dims = grid_shape(cfg.scene, cfg.voxel_leaf_size, cfg.leaf_z)
        batch_tail = (
            hoist_acc
            and table_dev is not None
            and fused_cc_fits(_dims[0] * _dims[1] * _dims[2])
            and cfg.grid_cc in ("auto", "pallas")
            and (
                hoist == "batch"
                or (hoist == "auto" and jax.default_backend() == "tpu")
            )
        )
        if hoist == "batch" and not batch_tail:
            raise ValueError(
                "hoist='batch' needs a concrete map (per-cell static table) "
                "and a grid small enough for the fused-CC kernel"
            )

        if hoist_acc:
            from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
                _accumulate_pallas_v3_stacked,
                _accumulate_pallas_v4_stacked,
                _accumulate_pallas_v5_stacked,
                _accumulate_pallas_v6_stacked,
                _pick_block,
                _v3_leaf_ok,
                _v5_exact_n,
                _v6_exact_n,
            )

            leaf, leaf_z = cfg.voxel_leaf_size, cfg.leaf_z
            if cfg.voxel_quant == "fast":
                # MXU-natural v5 while its f32 accumulation stays integer-
                # exact (bit-identical to v4; ~24% faster at bench shapes)
                stacked_acc = (
                    _accumulate_pallas_v5_stacked
                    if _v5_exact_n(cfg.caps.n_max_points)
                    else _accumulate_pallas_v4_stacked
                )
            elif _v3_leaf_ok(leaf, leaf_z):
                # exact mode gets the same orientation win: MXU-natural v6
                # while its f32 digit sums stay integer-exact (bit-identical
                # to v3); the i32-accumulating v3 beyond
                stacked_acc = (
                    _accumulate_pallas_v6_stacked
                    if _v6_exact_n(cfg.caps.n_max_points)
                    else _accumulate_pallas_v3_stacked
                )
            else:
                stacked_acc = None
            hoist_acc = stacked_acc is not None

        def multi_scan(state, frames, env_a, table_a):
            def body(s, fr):
                return _step_impl(
                    s, Frame(*fr), env_a, table_a, config=cfg, gains_xy=gains
                )

            return jax.lax.scan(body, state, tuple(frames))

        if hoist_acc:

            def multi(state, frames, env_a, table_a):
                # block from the ACTUAL stacked N (a trace-time constant),
                # not caps.n_max_points: a caller may stack fewer points
                # than the configured capacity, and a capacity-derived
                # block would then under-iterate the kernel grid and
                # silently drop points.  No block divides N -> per-frame
                # scan (its own accumulate call handles any N).
                block = _pick_block(frames.points.shape[1])
                if block is None:
                    return multi_scan(state, frames, env_a, table_a)
                # re-gate v5/v6 on the ACTUAL stacked N (bind time used the
                # configured capacity; a caller may stack more points)
                acc_fn = stacked_acc
                if acc_fn is _accumulate_pallas_v5_stacked and not _v5_exact_n(
                    frames.points.shape[1]
                ):
                    acc_fn = _accumulate_pallas_v4_stacked
                if acc_fn is _accumulate_pallas_v6_stacked and not _v6_exact_n(
                    frames.points.shape[1]
                ):
                    acc_fn = _accumulate_pallas_v3_stacked
                # mask may arrive (S, N) bool or pre-staged (S, N, 1) f32
                # (bench.stage_stacked pins the latter's layout so the
                # kernel consumes the parameter with zero relayout copies).
                # Both stacked kernels count valid points in SMEM for free;
                # an XLA reduce over the pinned-layout mask uses 1 of 128
                # lanes (~72 us/frame, trace-measured)
                accs, n_pts = acc_fn(
                    frames.points,
                    frames.mask,
                    cfg.scene,
                    leaf,
                    leaf_z,
                    block,
                    # hoist='on' runs this exact body on CPU (interpret-mode
                    # kernel) so the CPU suite covers it (ADVICE r3)
                    interpret=jax.default_backend() != "tpu",
                )

                if batch_tail:
                    ctab, cc_sat, n_vox, n_dyn = (
                        _perceive_batch_tables_from_dense_acc(
                            accs, env_a, config=cfg, table=table_a
                        )
                    )

                    def body(s, xs):
                        p = _perception_from_table_row(*xs, config=cfg)
                        return track_step(s, p, config=cfg, gains_xy=gains)

                    return jax.lax.scan(
                        body,
                        state,
                        _batch_table_rows(
                            ctab, cc_sat, n_vox, n_dyn, frames.t, n_pts
                        ),
                    )

                def body(s, xs):
                    acc, t, npts = xs
                    p = _perceive_from_dense_acc(
                        acc, t, npts, env_a, config=cfg, table=table_a
                    )
                    return track_step(s, p, config=cfg, gains_xy=gains)

                return jax.lax.scan(body, state, (accs, frames.t, n_pts))

        else:
            multi = multi_scan

        multi_jit = jax.jit(multi, donate_argnums=(0,) if donate_state else ())
        return lambda state, frames: multi_jit(state, frames, env_dev, table_dev)

    def bind_env_pipelined(self, env: MapEnv, donate_state: bool = True):
        """Highest-throughput shape: the stateless perception front-end (all
        the heavy compute) runs BATCHED over the frame axis, and only the
        tiny stateful tracking back-end scans the sequential chain.
        Numerically equivalent to frame-by-frame step() at ulp level (XLA
        may reorder f32 ops across the batch; see tests/test_dispatch.py);
        for bit-identical semantics use bind_env_multi.  Perception never
        reads tracker state.
        Returns ``run(state, frames_stacked) -> (state, outputs_stacked)``.

        On the onehot+grid TPU kernel config this DELEGATES to the
        bind_env_multi program, whose hoist='auto' body since round 5 IS a
        frame-batched perception: stacked accumulate + stacked fused-CC
        kernel + vmapped cluster_table_grid, with only the circumcenter +
        tracking chain per-frame in the scan (the r3-era batched attempt
        was slower because the then-current rank machinery's ~6.6 MB/frame
        cumsum intermediates spilled when batched; the round-4 top_k
        formulation removed those, and the round-5 A/B measured the batched
        tail 169.6 -> 155.4 us/cloud — scripts/micro_batch_tail.py).
        Other configs keep the two-program vmap(perceive) + scan
        structure."""
        cfg, gains = self.config, self.gains_xy

        fast = (
            cfg.voxel_mode == "onehot"
            and cfg.cluster_backend == "grid"
            and jnp.dtype(cfg.dtype) == jnp.float32
            and jax.default_backend() == "tpu"
            and self._env_table(env) is not None
        )
        if fast:
            return self.bind_env_multi(env, donate_state=donate_state)

        env_dev, table_dev = self._env_args(env)

        perceive_jit = jax.jit(
            jax.vmap(
                lambda pts, m, t, env_a, table_a: perceive(
                    Frame(pts, m, t), env_a, config=cfg, table=table_a
                ),
                in_axes=(0, 0, 0, None, None),
            )
        )

        def perceive_batch(pts, m, t):
            return perceive_jit(pts, m, t, env_dev, table_dev)

        def track_scan(state, pb):
            return jax.lax.scan(
                lambda s, pp: track_step(s, Perception(*pp), config=cfg, gains_xy=gains),
                state,
                tuple(pb),
            )

        track_jit = jax.jit(track_scan, donate_argnums=(0,) if donate_state else ())

        def run(state, frames: Frame):
            pb = perceive_batch(frames.points, frames.mask, frames.t)
            return track_jit(state, pb)

        return run


def _step_impl(
    state: TrackerState,
    frame: Frame,
    env: MapEnv,
    table=None,
    *,
    config: TrackerConfig,
    gains_xy: dict,
) -> tuple[TrackerState, FrameOutput]:
    p = perceive(frame, env, config=config, table=table)
    return track_step(state, p, config=config, gains_xy=gains_xy)


class Perception(NamedTuple):
    """Stateless per-frame perception result — everything the tracking
    back-end needs.  Tiny: (C, 4) detections + scalars."""

    dets: jax.Array        # (C, 4)
    det_valid: jax.Array   # (C,)
    t: jax.Array
    n_points: jax.Array
    n_vox: jax.Array
    n_dynamic: jax.Array
    n_clusters: jax.Array
    cc_saturated: jax.Array  # CC convergence loop hit its sweep cap while
    #   labels were still changing — clusters may be split (ADVICE r2)


def perceive_from_acc(
    acc: jax.Array,
    t: jax.Array,
    n_points: jax.Array,
    env: MapEnv,
    *,
    config: TrackerConfig,
    table=None,
) -> Perception:
    """Perception tail after voxel accumulation: finalize -> static mask ->
    compact -> cluster -> circumcenter.  Stateless, so it batches (vmap) over
    frames — the heavy compute runs batched while only the tiny tracking
    back-end is sequential.  With ``cluster_backend="grid"`` the tail stays
    on the dense cell grid (no compaction, no m_max_dynamic cap)."""
    if config.cluster_backend == "grid":
        # this entry takes the scatter-accumulator (n_cells, 4) layout (the
        # point-sharded psum path); the dense tail runs channel-major
        return _perceive_from_dense_acc(
            acc.T, t, n_points, env, config=config, table=table
        )
    vox, vox_mask, n_vox = voxel_finalize(acc, config.caps.m_max_voxels)
    return _perceive_from_vox(vox, vox_mask, n_vox, t, n_points, env, config=config)


def _perceive_from_dense_acc(
    acc: jax.Array,
    t: jax.Array,
    n_points: jax.Array,
    env: MapEnv,
    *,
    config: TrackerConfig,
    table=None,
) -> Perception:
    """Dense-grid perception tail: every stage operates on the (n_cells,)
    layout — the cell index is the point index (ascending lin == PCL order),
    so there is no compaction stage and no dynamic-point capacity at all.
    The postprocess is the sort/scatter/gather-free matmul formulation
    (cluster_table_grid), feeding circumcenters from the dense table."""
    from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features_table
    from multiple_object_tracking_lidar_tpu.ops.cluster_grid import (
        cluster_table_grid,
        connected_components_grid,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape
    from multiple_object_tracking_lidar_tpu.ops.voxel_grid import finalize_dense_cm

    from multiple_object_tracking_lidar_tpu.ops.static_mask import (
        get_cell_static_table,
        remove_static_cells,
    )

    caps = config.caps
    dtype = jnp.dtype(config.dtype)
    dims = grid_shape(config.scene, config.voxel_leaf_size, config.leaf_z)

    # acc arrives CHANNEL-MAJOR (4, n_cells); all dense-grid stages stay in
    # that layout — (n, 3) column slices cost a ~0.25 ms minor-dim relayout
    # EACH on this TPU (docs/PERFORMANCE.md), channel rows are free.
    # elementwise drop-bit fast path: the per-cell table arrives as a jit
    # ARGUMENT from bind_env (closure-baked array constants cost ~0.3 ms per
    # dispatch on this stack — docs/PERFORMANCE.md); when called without one
    # and the map is concrete at trace time, build it here; else fall back to
    # the one-hot map lookup.  Identical semantics either way (tested).
    if table is None:
        table = get_cell_static_table(
            env, config.scene, config.voxel_leaf_size, dims[0], dims[1], dims[2]
        )

    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        MAX_KERNEL_CELLS,
        fused_cc_fits,
    )

    n_cells = dims[0] * dims[1] * dims[2]
    use_kernel = (
        table is not None
        and dtype == jnp.float32
        and fused_cc_fits(n_cells)
        and (
            config.grid_cc == "pallas"
            or (config.grid_cc == "auto" and jax.default_backend() == "tpu")
        )
    )
    if config.grid_cc == "pallas" and (
        table is None or dtype != jnp.float32 or not fused_cc_fits(n_cells)
    ):
        # an explicit kernel request that can't be honored (env is a tracer
        # so no host-precomputed drop-bit table, non-f32 dtype, or a grid
        # too large for the kernel's whole-grid VMEM residency) must not
        # silently degrade (ADVICE r2)
        raise ValueError(
            "grid_cc='pallas' needs a concrete map (per-cell static table), "
            f"dtype=float32, and <= {MAX_KERNEL_CELLS} grid cells (got "
            f"{n_cells}: the kernel keeps the whole grid VMEM-resident, "
            "~410 B/cell vs the 16 MB scoped limit); use a coarser leaf or "
            "grid_cc='auto' for the jnp fallback"
        )
    if use_kernel:
        # fused Pallas kernel: finalize + drop-bit static mask + CC with the
        # whole grid VMEM-resident (ops/grid_pallas.py); ~one dispatch for
        # the whole tail ahead of the cluster table
        from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
            fused_finalize_static_cc,
        )

        scal = jnp.stack(
            [
                env.origin_x,
                env.origin_y,
                env.cos_nyaw,
                env.sin_nyaw,
                env.inv_resolution,
                jnp.float32(config.cluster_tolerance**2),
            ]
        )
        centd, dyn, labels, n_iters, cc_sat = fused_finalize_static_cc(
            acc.astype(jnp.float32),
            scal,
            table.base_row,
            table.base_col,
            table.bits,
            dims=dims,
            tol=config.cluster_tolerance,
            leaf_xy=config.voxel_leaf_size,
            leaf_z=config.leaf_z,
            kwin=table.k,
            # grid-diameter sweep bound (the in-kernel axis scans make real
            # scenes converge in a handful of iterations; the cap only
            # matters for adversarial shapes, where cc_saturated fires —
            # ADVICE r2: the old label_prop_iters cap silently under-merged
            # components spanning more than ~128 cells)
            max_sweeps=None,
            # honor an explicit grid_cc='pallas' on CPU via interpret mode
            # (matching voxel_accumulate_runs_cm; ADVICE r2)
            interpret=jax.default_backend() != "tpu",
        )
        n_vox = (acc[3] > 0).sum()
    else:
        cent, occ, n_vox = finalize_dense_cm(acc)
        if table is not None:
            dyn = remove_static_cells(cent, occ, env, table)
        else:
            # one-hot map-lookup fallback (e.g. env is a tracer under
            # shard_map, so the host-precomputed table is unavailable);
            # remove_static takes (n, 3) points — cent is channel-major
            dyn = remove_static(cent.T, occ, env)

        centd = cent.astype(dtype)
        labels, n_iters, cc_sat = connected_components_grid(
            centd,
            dyn,
            dims,
            config.cluster_tolerance,
            config.voxel_leaf_size,
            config.leaf_z,
            caps.label_prop_iters,
            caps.grid_sweeps_per_iter,
            caps.grid_jumps_per_iter,
        )
    ctab = cluster_table_grid(
        labels,
        n_iters,
        centd,
        dyn,
        dims[0],
        config.min_cluster_size,
        config.max_cluster_size,
        caps.c_max_clusters,
        caps.p_max_cluster,
    )

    if use_kernel:
        # farthest-pair scan via the validity-PREDICATED kernel: empty
        # cluster slots skip their (P, P) work at runtime — the XLA path's
        # static shapes pay all c_max slots every frame (56+ us vs ~15 on
        # headline frames with 3-4 valid slots of 32).  Selection/line/
        # determinant run in shared jnp code (ops/centroid_pallas.py).
        from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
            circumcenter_features_table_pallas_v2,
        )

        dets = circumcenter_features_table_pallas_v2(
            ctab.mpts,
            ctab.member_mask,
            t,
            interpret=jax.default_backend() != "tpu",
        ).astype(dtype)
    else:
        dets = circumcenter_features_table(ctab.mpts, ctab.member_mask, t).astype(dtype)

    return Perception(
        dets=dets,
        det_valid=ctab.cluster_valid,
        t=t,
        n_points=n_points,
        n_vox=n_vox,
        n_dynamic=dyn.sum(),
        n_clusters=ctab.n_clusters,
        cc_saturated=cc_sat.astype(jnp.int32),
    )


def _perceive_batch_tables_from_dense_acc(
    accs: jax.Array,      # (S, 4, n_cells) channel-major accumulators
    env: MapEnv,
    *,
    config: TrackerConfig,
    table,
):
    """Frame-BATCHED dense-grid perception through the cluster table.

    Perception is stateless, so everything up to the circumcenter can run
    batched over the frame axis instead of per frame inside the tracking
    scan.  The round-5 timeline (scripts/profile_timeline.py) showed the
    per-frame cluster-table chain is LATENCY-bound, not FLOP-bound: ~27.5
    us/frame across ~20 small fusions (the 5500-key top_k sort 7.4, the
    rank/slot machinery ~8, the (96, 384) member contraction 8.8 + a 3.3 us
    layout copy), each op too small to fill the machine.  Batched, the same
    chain runs ONCE on (S, ...) operands — same total MACs/bytes, 1/S the
    issue overhead.

    Bit-identity with the per-frame path holds BY CONSTRUCTION, not by
    tolerance: the stacked fused-CC kernel is pinned bit-identical per frame
    (tests/test_grid.py::test_stacked_fused_cc_matches_per_frame), and every
    cluster_table_grid output is integer-exact (one-hot contractions with
    f32 accumulation below 2^24, top_k over int keys, one-nonzero-term
    member extraction), so vmapping it cannot perturb a single bit —
    asserted by tests/test_dispatch.py against the per-frame scan.

    Returns (ctab stacked over S, cc_sat (S,) i32, n_vox (S,), n_dyn (S,));
    the circumcenter + tracking remain per-frame in the caller's scan (the
    circumcenter kernel's cost is its per-ACTIVE-slot serial chain, which
    batching frames cannot shorten).
    """
    from multiple_object_tracking_lidar_tpu.ops.cluster_grid import cluster_table_grid
    from multiple_object_tracking_lidar_tpu.ops.grid_pallas import (
        fused_finalize_static_cc_stacked,
    )
    from multiple_object_tracking_lidar_tpu.ops.voxel import grid_shape

    caps = config.caps
    dims = grid_shape(config.scene, config.voxel_leaf_size, config.leaf_z)
    scal = jnp.stack(
        [
            env.origin_x,
            env.origin_y,
            env.cos_nyaw,
            env.sin_nyaw,
            env.inv_resolution,
            jnp.float32(config.cluster_tolerance**2),
        ]
    )
    cent, dyn, labels, n_iters, cc_sat = fused_finalize_static_cc_stacked(
        accs.astype(jnp.float32),
        scal,
        table.base_row,
        table.base_col,
        table.bits,
        dims=dims,
        tol=config.cluster_tolerance,
        leaf_xy=config.voxel_leaf_size,
        leaf_z=config.leaf_z,
        kwin=table.k,
        max_sweeps=None,
        interpret=jax.default_backend() != "tpu",
    )
    ctab = jax.vmap(
        lambda lab, ni, ce, dy: cluster_table_grid(
            lab,
            ni,
            ce,
            dy,
            dims[0],
            config.min_cluster_size,
            config.max_cluster_size,
            caps.c_max_clusters,
            caps.p_max_cluster,
        )
    )(labels, n_iters, cent, dyn)
    n_vox = (accs[:, 3] > 0).sum(axis=1)
    n_dyn = dyn.sum(axis=1)
    return ctab, cc_sat.astype(jnp.int32), n_vox, n_dyn


def _batch_table_rows(ctab, cc_sat, n_vox, n_dyn, t, n_pts):
    """The scan xs for a batched cluster-table stack: one row per frame (or
    per fleet stream), consumed by _perception_from_table_row."""
    return (
        ctab.mpts,
        ctab.member_mask,
        ctab.cluster_valid,
        ctab.n_clusters,
        cc_sat,
        n_vox,
        n_dyn,
        t,
        n_pts,
    )


def _perception_from_table_row(
    mp, mm, cv, ncl, sat, nv, nd, t, npts, *, config: TrackerConfig
) -> Perception:
    """One frame's Perception from its batched cluster-table row: runs the
    predicated circumcenter kernel (whose cost is its per-ACTIVE-slot serial
    chain — batching frames cannot shorten it, so it stays per-row) and
    assembles the Perception the tracking scan consumes.  Shared by the
    bind_env_multi batched body and the kernel fleet."""
    from multiple_object_tracking_lidar_tpu.ops.centroid_pallas import (
        circumcenter_features_table_pallas_v2,
    )

    dets = circumcenter_features_table_pallas_v2(
        mp, mm, t, interpret=jax.default_backend() != "tpu"
    ).astype(jnp.dtype(config.dtype))
    return Perception(
        dets=dets,
        det_valid=cv,
        t=t,
        n_points=npts,
        n_vox=nv,
        n_dynamic=nd,
        n_clusters=ncl,
        cc_saturated=sat,
    )


def _perceive_from_vox(
    vox: jax.Array,
    vox_mask: jax.Array,
    n_vox: jax.Array,
    t: jax.Array,
    n_points: jax.Array,
    env: MapEnv,
    *,
    config: TrackerConfig,
) -> Perception:
    caps = config.caps
    dtype = jnp.dtype(config.dtype)

    # 2. static removal: one gather into the precomputed dilated map mask
    #    (cpp:664-706), then order-preserving compaction to the cluster set
    dyn_mask = remove_static(vox, vox_mask, env)
    pts, pts_mask, n_dyn = compact_points(vox, dyn_mask, caps.m_max_dynamic)

    # 3. Euclidean clustering (cpp:471-488)
    clusters = euclidean_cluster(
        pts,
        pts_mask,
        config.cluster_tolerance,
        config.min_cluster_size,
        config.max_cluster_size,
        caps.c_max_clusters,
        caps.p_max_cluster,
        caps.label_prop_iters,
        caps.pointer_jumps,
        backend=config.cluster_backend,
    )

    # 4. circumcenter features (cpp:708-822)
    dets = circumcenter_features_sorted(
        clusters.sorted_pts,
        clusters.starts,
        clusters.sizes,
        clusters.cluster_valid,
        t,
        caps.p_max_cluster,
    ).astype(dtype)

    return Perception(
        dets=dets,
        det_valid=clusters.cluster_valid,
        t=t,
        n_points=n_points,
        n_vox=n_vox,
        n_dynamic=n_dyn,
        n_clusters=clusters.n_clusters,
        # all-pairs CC converges in O(log m) thanks to its pointer jumps;
        # reaching the iteration cap is the only saturation signal it has
        # (n_iters == -1 from the pallas backend never flags)
        cc_saturated=(clusters.n_iters >= caps.label_prop_iters).astype(jnp.int32),
    )


def perceive(
    frame: Frame, env: MapEnv, *, config: TrackerConfig, table=None
) -> Perception:
    """Full stateless perception front-end for one frame."""
    if config.voxel_mode == "onehot" or config.cluster_backend == "grid":
        from multiple_object_tracking_lidar_tpu.ops.voxel_grid import (
            voxel_accumulate_onehot_cm,
        )

        pts = frame.points.astype(jnp.dtype(config.dtype))
        n_pts = None
        if config.voxel_mode == "runs":
            # sort + segsum + small densify matmul: ~10x fewer MACs than the
            # direct one-hot histogram at bench density (see
            # ops/voxel_pallas.voxel_accumulate_runs_cm)
            from multiple_object_tracking_lidar_tpu.ops.voxel_pallas import (
                voxel_accumulate_runs_cm,
            )

            acc_cm = voxel_accumulate_runs_cm(
                pts,
                frame.mask,
                config.scene,
                config.voxel_leaf_size,
                config.leaf_z,
                interpret=jax.default_backend() != "tpu",
            )
        elif config.voxel_mode == "onehot":
            acc_cm, n_pts = voxel_accumulate_onehot_cm(
                pts,
                frame.mask,
                config.scene,
                config.voxel_leaf_size,
                config.leaf_z,
                quant=config.voxel_quant,
                with_npts=True,
            )
        else:
            acc_cm = voxel_accumulate(
                pts, frame.mask, config.scene, config.voxel_leaf_size, config.leaf_z
            ).T
        if n_pts is None:
            n_pts = (frame.mask.ravel() != 0).sum()
        if config.cluster_backend == "grid":
            return _perceive_from_dense_acc(
                acc_cm, frame.t, n_pts, env, config=config, table=table
            )
        return perceive_from_acc(
            acc_cm.T, frame.t, n_pts, env, config=config, table=table
        )
    if config.voxel_mode in ("scan", "runs"):
        if config.voxel_mode == "runs":
            # Pallas sorted-runs kernel: deterministic lowering, sidesteps
            # the XLA scatter compile lottery (docs/PERFORMANCE.md)
            from multiple_object_tracking_lidar_tpu.ops.voxel_pallas import (
                voxel_downsample_runs,
            )

            downsample = functools.partial(
                voxel_downsample_runs,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            from multiple_object_tracking_lidar_tpu.ops.voxel import (
                voxel_downsample_scan as downsample,
            )

        vox, vox_mask, n_vox = downsample(
            frame.points.astype(jnp.dtype(config.dtype)),
            frame.mask,
            config.scene,
            config.voxel_leaf_size,
            config.leaf_z,
            config.caps.m_max_voxels,
        )
        return _perceive_from_vox(
            vox, vox_mask, n_vox, frame.t, (frame.mask.ravel() != 0).sum(), env, config=config
        )
    acc = voxel_accumulate(
        frame.points.astype(jnp.dtype(config.dtype)),
        frame.mask,
        config.scene,
        config.voxel_leaf_size,
        config.leaf_z,
    )
    return perceive_from_acc(acc, frame.t, (frame.mask.ravel() != 0).sum(), env, config=config)


def step_from_voxel_acc(
    state: TrackerState,
    acc: jax.Array,
    t: jax.Array,
    n_points: jax.Array,
    env: MapEnv,
    *,
    config: TrackerConfig,
    gains_xy: dict,
) -> tuple[TrackerState, FrameOutput]:
    """Everything after voxel accumulation.  Split out so a point-sharded
    deployment can `psum` partial voxel accumulators over a mesh axis and run
    the (small) remainder replicated — see parallel/sharding.py."""
    p = perceive_from_acc(acc, t, n_points, env, config=config)
    return track_step(state, p, config=config, gains_xy=gains_xy)


def track_step(
    state: TrackerState,
    p: Perception,
    *,
    config: TrackerConfig,
    gains_xy: dict,
) -> tuple[TrackerState, FrameOutput]:
    """Stateful tracking back-end: association, lifecycle, filtering, expiry.
    Operates on the tiny Perception record only."""
    caps = config.caps
    dtype = jnp.dtype(config.dtype)
    L = config.data_length
    dt_gp = config.dt_gp

    dets = p.dets
    det_valid = p.det_valid
    t = p.t

    any_det = det_valid.any()
    was_init = state.initialized
    steady = was_init & any_det   # publish/filter/expire this frame (cpp:163+)

    # ---- A S S O C I A T I O N  +  L I F E C Y C L E ------------------------
    if config.association == "hungarian":
        from multiple_object_tracking_lidar_tpu.ops.hungarian import (
            hungarian_associate_and_update,
        )

        associate = hungarian_associate_and_update
    else:
        associate = associate_and_update
    assoc = associate(
        state.bank,
        state.next_obj_num,
        state.next_birth,
        dets,
        det_valid,
        config.id_threshold,
        dt_gp,
        config.interp_gap_factor,
        allow_match=was_init,  # first frame registers without gating (cpp:153-156)
        **(
            {
                "cond_branch": config.assoc_cond_branch,
                "backend": config.assoc_backend,
            }
            if config.association == "greedy"
            else {}
        ),
    )
    bank = assoc.bank

    # ---- F I L T E R I N G  (whole bank, one dispatch per pass) -------------
    # The reference runs callIHGP once PER ENTRY of this_objIDs (cpp:629-659);
    # when several detections matched the same track (its no-claimed-set
    # quirk), the GP runs repeatedly over the same window, chaining the
    # carried state `m`, and each duplicate publishes the output of ITS pass.
    # Reproduced EXACTLY for any multiplicity: a bounded while_loop runs
    # max(multiplicity) chained batch passes, each duplicate reads its own
    # pass, each track's carry advances once per duplicate (r3; formerly a
    # 3-pass unrolled approximation that saturated at >=4 duplicates).
    k_max = bank.alive.shape[0]
    win_xy = bank.window[:, :, :2]                         # (K, L, 2)
    vels = (win_xy[:, 1:, :] - win_xy[:, :-1, :]) / jnp.asarray(dt_gp, dtype)
    vmean = vels.mean(axis=1)                              # (K, 2) (cpp:887-898,
    #   accumulators zero-initialized — the reference reads them uninitialized,
    #   UB; zero is the de-facto behavior, SURVEY C16)
    y_vel = jnp.moveaxis(vels - vmean[:, None, :], -1, 1)  # (K, 2, L-1)

    lpf_all = lpf_pos(bank.window, config.lpf_tau, dt_gp)  # (cpp:638, 824-833)
    pmean = win_xy[:, -1, :]                               # mean = last value (cpp:847)
    y_pos = jnp.moveaxis(win_xy - pmean[:, None, :], -1, 1)

    def one_pass(m_in):
        if config.position_filter == "ihgp":
            # present-but-disabled reference mode (IHGP_fixed_pos, cpp:835-869):
            # the position filter runs first and the velocity filter chains off
            # its state — the reference reuses the same GP objects sequentially.
            eft_pos_last, m_mid = ihgp_apply_weights(y_pos, m_in, gains_xy["W_pos"])
            pos = eft_pos_last + pmean
            eft_vel_last, m_out = ihgp_apply_weights(y_vel, m_mid, gains_xy["W_vel"])
        else:
            pos = lpf_all
            eft_vel_last, m_out = ihgp_apply_weights(y_vel, m_in, gains_xy["W_vel"])
        vel = eft_vel_last + vmean
        # velocity clamp, NaN-preserving like the C++ if-chain (cpp:649-654)
        vmax = jnp.asarray(config.max_velocity, dtype)
        vel = jnp.where(vel > vmax, vmax, jnp.where(vel < -vmax, -vmax, vel))
        return pos, vel, m_out

    # detection multiplicity per slot and per-detection ordinal
    det_active = assoc.det_ok & steady
    onehot = (
        assoc.det_slot[:, None] == jnp.arange(k_max, dtype=jnp.int32)[None, :]
    ) & det_active[:, None]                                # (D, K)
    mult = onehot.sum(0)                                   # (K,)
    ordinal = jnp.take_along_axis(
        jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1,
        assoc.det_slot[:, None],
        axis=1,
    )[:, 0]                                                # (D,)

    # exact chained passes: one while_loop trip per duplicate ordinal; on
    # ordinary frames (multiplicity <= 1 everywhere) this is ONE pass —
    # cheaper than the old 3-pass unroll.  Detection d reads pass
    # ordinal[d]; track k's carried state stops advancing after mult[k]
    # passes (tracks with no match this frame keep their m unchanged).
    slot = assoc.det_slot
    max_mult = mult.max()

    def dup_cond(c):
        return c[0] < max_mult

    def dup_body(c):
        p, m, pd, vd, m_fin = c
        pos, vel, m_next = one_pass(m)
        selp = (ordinal == p)[:, None]
        pd = jnp.where(selp, pos[slot], pd)
        vd = jnp.where(selp, vel[slot], vd)
        m_fin = jnp.where((mult == p + 1)[:, None, None], m_next, m_fin)
        return p + 1, m_next, pd, vd, m_fin

    _, _, pos_det, vel_det, m0 = jax.lax.while_loop(
        dup_cond,
        dup_body,
        (
            # all inits derived from data so their varying/sharding types
            # match the body outputs under shard_map
            jnp.zeros_like(max_mult),
            bank.m0,
            (dets[:, :2] * 0).astype(dtype),
            (dets[:, :2] * 0).astype(dtype),
            bank.m0,
        ),
    )

    # ---- E X P I R Y  (cpp:545-584) ----------------------------------------
    spin = state.spin_counter + steady.astype(jnp.int32)
    do_prune = spin > jnp.int32(config.prune_period * config.frequency)
    stale = (jnp.asarray(t, dtype) - bank.window[:, L - 1, 3]) > config.prune_period
    alive = jnp.where(do_prune & steady, bank.alive & ~stale, bank.alive)
    spin = jnp.where(do_prune & steady, 0, spin)

    new_state = TrackerState(
        bank=bank._replace(alive=alive, m0=m0),
        next_obj_num=assoc.next_obj_num,
        next_birth=assoc.next_birth,
        spin_counter=spin,
        initialized=was_init | any_det,
    )

    # ---- O U T P U T ---------------------------------------------------------
    out = FrameOutput(
        publish=steady,
        valid=assoc.det_ok & steady,
        obj_id=assoc.det_id,
        pos=pos_det,
        vel=vel_det,
        raw_centroid=dets,
        new_track=assoc.det_new,
        n_points=p.n_points,
        n_voxels=p.n_vox,
        n_dynamic=p.n_dynamic,
        n_clusters=p.n_clusters,
        n_alive=alive.sum(),
        overflow=assoc.overflow,
        # the exact while_loop replays EVERY duplicate pass, so saturation is
        # structurally impossible now (field kept for output compatibility;
        # data-derived zero for shard_map)
        dup_saturated=(mult < 0).sum(),
        cc_saturated=p.cc_saturated,
        assoc_saturated=assoc.assoc_saturated,
    )
    return new_state, out
