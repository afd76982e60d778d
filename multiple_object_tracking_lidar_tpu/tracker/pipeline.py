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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.config import TrackerConfig
from multiple_object_tracking_lidar_tpu.models.ihgp import stationary_gains, ihgp_batch
from multiple_object_tracking_lidar_tpu.models.lpf import lpf_pos
from multiple_object_tracking_lidar_tpu.models.matern32 import matern32_from_log
from multiple_object_tracking_lidar_tpu.ops.assign import associate_and_update
from multiple_object_tracking_lidar_tpu.ops.centroid import circumcenter_features
from multiple_object_tracking_lidar_tpu.ops.cluster import euclidean_cluster
from multiple_object_tracking_lidar_tpu.ops.compact import compact_points
from multiple_object_tracking_lidar_tpu.ops.static_mask import MapEnv, remove_static
from multiple_object_tracking_lidar_tpu.ops.voxel import voxel_downsample_dense
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
        dtype = jnp.dtype(config.dtype)

        ssm_x = matern32_from_log(
            config.logSigma2_x, config.logMagnSigma2_x, config.logLengthScale_x
        )
        ssm_y = matern32_from_log(
            config.logSigma2_y, config.logMagnSigma2_y, config.logLengthScale_y
        )
        gx = stationary_gains(ssm_x, config.dt_gp)
        gy = stationary_gains(ssm_y, config.dt_gp)
        self.gains_x = gx
        self.gains_y = gy
        # stack x/y gains on a leading axis for the vmapped batch filter
        self.gains_xy = jax.tree.map(
            lambda a, b: jnp.stack([jnp.asarray(a, dtype), jnp.asarray(b, dtype)]),
            gx.as_jax(dtype),
            gy.as_jax(dtype),
        )
        self._step = jax.jit(partial(_step_impl, config=config, gains_xy=self.gains_xy))

    def init_state(self) -> TrackerState:
        return init_state(
            self.config.caps.k_max_tracks,
            self.config.data_length,
            jnp.dtype(self.config.dtype),
        )

    def step(self, state: TrackerState, frame: Frame, env: MapEnv):
        return self._step(state, frame, env)


def _step_impl(
    state: TrackerState,
    frame: Frame,
    env: MapEnv,
    *,
    config: TrackerConfig,
    gains_xy: dict,
) -> tuple[TrackerState, FrameOutput]:
    caps = config.caps
    dtype = jnp.dtype(config.dtype)
    L = config.data_length
    dt_gp = config.dt_gp

    # ---- P E R C E P T I O N ------------------------------------------------
    # 1. voxel downsample, leaf (V, V, 20V) (cpp:452-456)
    vox, vox_mask, n_vox = voxel_downsample_dense(
        frame.points,
        frame.mask,
        config.scene,
        config.voxel_leaf_size,
        config.leaf_z,
        caps.m_max_voxels,
    )

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
    )

    # 4. circumcenter features (cpp:708-822)
    dets = circumcenter_features(
        pts, clusters.members, clusters.member_mask, clusters.cluster_valid, frame.t
    ).astype(dtype)
    det_valid = clusters.cluster_valid

    any_det = det_valid.any()
    was_init = state.initialized
    steady = was_init & any_det   # publish/filter/expire this frame (cpp:163+)

    # ---- A S S O C I A T I O N  +  L I F E C Y C L E ------------------------
    assoc = associate_and_update(
        state.bank,
        state.next_obj_num,
        state.next_birth,
        dets,
        det_valid,
        config.id_threshold,
        dt_gp,
        config.interp_gap_factor,
        allow_match=was_init,  # first frame registers without gating (cpp:153-156)
    )
    bank = assoc.bank

    # ---- F I L T E R I N G  (whole bank, one dispatch) ----------------------
    win_xy = bank.window[:, :, :2]                         # (K, L, 2)
    vels = (win_xy[:, 1:, :] - win_xy[:, :-1, :]) / jnp.asarray(dt_gp, dtype)
    vmean = vels.mean(axis=1)                              # (K, 2) (cpp:887-898,
    #   accumulators zero-initialized — the reference reads them uninitialized,
    #   UB; zero is the de-facto behavior, SURVEY C16)
    y_vel = jnp.moveaxis(vels - vmean[:, None, :], -1, 1)  # (K, 2, L-1)

    if config.position_filter == "ihgp":
        # present-but-disabled reference mode (IHGP_fixed_pos, cpp:835-869):
        # position filter runs first and the velocity filter chains off its
        # final state — the reference reuses the same GP objects sequentially.
        pmean = win_xy[:, -1, :]                           # mean = last value (cpp:847)
        y_pos = jnp.moveaxis(win_xy - pmean[:, None, :], -1, 1)
        eft_pos, m_mid = ihgp_batch(y_pos, bank.m0, gains_xy)
        pos_all = eft_pos[:, :, -1] + pmean
        eft_vel, m_new = ihgp_batch(y_vel, m_mid, gains_xy)
    else:
        # default: LPF position (cpp:638, 824-833)
        pos_all = lpf_pos(bank.window, config.lpf_tau, dt_gp)
        eft_vel, m_new = ihgp_batch(y_vel, bank.m0, gains_xy)

    vel_all = eft_vel[:, :, -1] + vmean                    # (K, 2)

    # velocity clamp, NaN-preserving like the C++ if-chain (cpp:649-654)
    vmax = jnp.asarray(config.max_velocity, dtype)
    vel_all = jnp.where(vel_all > vmax, vmax, jnp.where(vel_all < -vmax, -vmax, vel_all))

    # persist GP state only for tracks touched this frame, in steady state
    touched = jnp.zeros(bank.alive.shape[0], dtype=bool).at[assoc.det_slot].set(
        assoc.det_ok & steady, mode="drop"
    )
    m0 = jnp.where(touched[:, None, None], m_new, bank.m0)

    # ---- E X P I R Y  (cpp:545-584) ----------------------------------------
    spin = state.spin_counter + steady.astype(jnp.int32)
    do_prune = spin > jnp.int32(config.prune_period * config.frequency)
    stale = (frame.t - bank.window[:, L - 1, 3]) > config.prune_period
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
        pos=pos_all[assoc.det_slot],
        vel=vel_all[assoc.det_slot],
        raw_centroid=dets,
        new_track=assoc.det_new,
        n_points=frame.mask.sum(),
        n_voxels=n_vox,
        n_dynamic=n_dyn,
        n_clusters=clusters.n_clusters,
        n_alive=alive.sum(),
        overflow=assoc.overflow,
    )
    return new_state, out
