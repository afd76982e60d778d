"""Duplicate-match chained-GP quirk: exact at ANY multiplicity (r3).

The reference has no claimed-set: several detections in one frame can match
the SAME track (cpp:177-219), and callIHGP then runs the GP once per entry
of this_objIDs over the same window, chaining the carried state `m`
(cpp:621-662).  Since r3 the framework replays EVERY duplicate pass with a
bounded while_loop over the true multiplicity (VERDICT r2 stretch #9) — this
file pins oracle-exact parity for all five ordinals of a 5-duplicate frame
and that dup_saturated is structurally zero.
"""

import jax.numpy as jnp
import numpy as np
import oracle

from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Perception, Tracker, track_step

L = 8
DT = 0.1


def _cfg():
    return TrackerConfig(
        data_length=L,
        dtype="float64",
        caps=Capacities(
            n_max_points=64,
            m_max_voxels=64,
            m_max_dynamic=64,
            c_max_clusters=8,
            p_max_cluster=8,
            k_max_tracks=4,
        ),
    )


def _perception(dets_xy, t):
    d = np.zeros((len(dets_xy), 4))
    for i, (x, y) in enumerate(dets_xy):
        d[i] = [x, y, 0.0, t]
    z = jnp.int32(0)
    return Perception(
        dets=jnp.asarray(d),
        det_valid=jnp.ones(len(dets_xy), bool),
        t=jnp.float64(t),
        n_points=z,
        n_vox=z,
        n_dynamic=z,
        n_clusters=jnp.int32(len(dets_xy)),
        cc_saturated=z,
    )


def test_five_duplicates_exact_then_saturated():
    cfg = _cfg()
    tracker = Tracker(cfg)
    state = tracker.init_state()

    # frame 1: register one track at the origin
    state, out1 = track_step(
        state, _perception([(0.0, 0.0)], 0.1), config=cfg, gains_xy=tracker.gains_xy
    )
    assert not bool(out1.publish)

    # frame 2: five detections, all inside the 0.5 m gate of the track AND of
    # each other (so each later duplicate still gates the updated window)
    xs = [0.02, -0.03, 0.05, 0.01, -0.02]
    dets_xy = [(x, 0.04) for x in xs]
    state, out = track_step(
        state, _perception(dets_xy, 0.2), config=cfg, gains_xy=tracker.gains_xy
    )
    assert bool(out.publish)
    np.testing.assert_array_equal(np.asarray(out.obj_id), 0)
    assert int(out.dup_saturated) == 0  # exact replay: saturation impossible

    # ---- oracle: chained passes over the final window -----------------------
    F, Pinf, H, R = oracle.matern32(
        np.exp(cfg.logSigma2_x), np.exp(cfg.logMagnSigma2_x), np.exp(cfg.logLengthScale_x)
    )
    gpx = oracle.IHGPOracle(DT, F, H, Pinf, R)
    Fy, Py, Hy, Ry = oracle.matern32(
        np.exp(cfg.logSigma2_y), np.exp(cfg.logMagnSigma2_y), np.exp(cfg.logLengthScale_y)
    )
    gpy = oracle.IHGPOracle(DT, Fy, Hy, Py, Ry)

    w = [np.array([0.0, 0.0, 0.0, 0.1])] * L
    for x, y in dets_xy:
        w = w[1:] + [np.array([x, y, 0.0, 0.2])]

    tau = cfg.lpf_tau
    a, b = tau / (tau + DT), DT / (tau + DT)  # op order of LPF_pos (cpp:824-833)
    pos_ref = a * np.array(w[-2][:2]) + b * np.array(w[-1][:2])

    vels_ref = []
    for _ in range(5):  # unbounded chained passes, like callIHGP
        gpx.init_step()
        gpy.init_step()
        vx = [(w[k + 1][0] - w[k][0]) / DT for k in range(L - 1)]
        vy = [(w[k + 1][1] - w[k][1]) / DT for k in range(L - 1)]
        mx, my = np.mean(vx), np.mean(vy)
        for k in range(L - 1):
            gpx.update(vx[k] - mx)
            gpy.update(vy[k] - my)
        vels_ref.append(
            np.clip(
                np.array([gpx.get_eft()[-1] + mx, gpy.get_eft()[-1] + my]),
                -cfg.max_velocity,
                cfg.max_velocity,
            )
        )

    pos = np.asarray(out.pos)
    vel = np.asarray(out.vel)
    # all duplicates publish the same LPF position (cpp:638 reads the window)
    np.testing.assert_allclose(
        pos, np.broadcast_to(pos_ref, pos.shape), rtol=0, atol=1e-12
    )
    # ALL five ordinals: exact chained-pass parity (the old 3-pass
    # approximation republished pass 3 for ordinals 3-4; now each duplicate
    # reads its own pass)
    for p in range(5):
        np.testing.assert_allclose(vel[p], vels_ref[p], rtol=0, atol=1e-12)
    # successive passes genuinely differ (the chain is live, not republished)
    assert not np.allclose(vel[3], vel[2], atol=1e-12)

    # carried m advanced through ALL FIVE passes: next frame with a single
    # match must equal an oracle whose GP ran exactly 5 chained passes
    gpx3 = oracle.IHGPOracle(DT, F, H, Pinf, R)
    gpy3 = oracle.IHGPOracle(DT, Fy, Hy, Py, Ry)
    w3 = [np.array([0.0, 0.0, 0.0, 0.1])] * L
    for x, y in dets_xy:
        w3 = w3[1:] + [np.array([x, y, 0.0, 0.2])]
    for _ in range(5):
        gpx3.init_step()
        gpy3.init_step()
        vx = [(w3[k + 1][0] - w3[k][0]) / DT for k in range(L - 1)]
        vy = [(w3[k + 1][1] - w3[k][1]) / DT for k in range(L - 1)]
        mx, my = np.mean(vx), np.mean(vy)
        for k in range(L - 1):
            gpx3.update(vx[k] - mx)
            gpy3.update(vy[k] - my)
        gpx3.get_eft()
        gpy3.get_eft()

    det3 = (0.03, 0.06)
    state, out3 = track_step(
        state, _perception([det3], 0.3), config=cfg, gains_xy=tracker.gains_xy
    )
    w3 = w3[1:] + [np.array([det3[0], det3[1], 0.0, 0.3])]
    gpx3.init_step()
    gpy3.init_step()
    vx = [(w3[k + 1][0] - w3[k][0]) / DT for k in range(L - 1)]
    vy = [(w3[k + 1][1] - w3[k][1]) / DT for k in range(L - 1)]
    mx, my = np.mean(vx), np.mean(vy)
    for k in range(L - 1):
        gpx3.update(vx[k] - mx)
        gpy3.update(vy[k] - my)
    vel3_ref = np.clip(
        np.array([gpx3.get_eft()[-1] + mx, gpy3.get_eft()[-1] + my]),
        -cfg.max_velocity,
        cfg.max_velocity,
    )
    np.testing.assert_allclose(np.asarray(out3.vel)[0], vel3_ref, rtol=0, atol=1e-12)
