"""Greedy association + lifecycle semantics (ref cpp:163-232, 507-619)."""

import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.ops.assign import associate_and_update
from multiple_object_tracking_lidar_tpu.tracker.state import init_state

L = 6
DT = 0.1


def _bank_with_tracks(positions, times=None, k_max=8):
    """Build a bank with len(positions) alive tracks at given last positions."""
    st = init_state(k_max, L, jnp.float64)
    bank = st.bank
    times = times or [0.0] * len(positions)
    alive = np.zeros(k_max, bool)
    obj_id = np.full(k_max, -1, np.int32)
    birth = np.full(k_max, 2**30, np.int32)
    window = np.zeros((k_max, L, 4))
    for i, (p, t) in enumerate(zip(positions, times)):
        alive[i] = True
        obj_id[i] = i
        birth[i] = i
        window[i, :, 0] = p[0]
        window[i, :, 1] = p[1]
        window[i, :, 3] = t
    bank = bank._replace(
        alive=jnp.asarray(alive),
        obj_id=jnp.asarray(obj_id),
        birth_seq=jnp.asarray(birth),
        window=jnp.asarray(window),
    )
    return bank


def _dets(rows):
    d = np.zeros((len(rows), 4))
    for i, r in enumerate(rows):
        d[i, : len(r)] = r
    return jnp.asarray(d), jnp.ones(len(rows), bool)


def test_first_match_in_registration_order():
    # detection gates BOTH tracks; the earlier-registered (id 0) must win,
    # even though track 1 is closer (greedy first-match, cpp:184-207)
    bank = _bank_with_tracks([(0.0, 0.0), (0.05, 0.0)])
    dets, dv = _dets([(0.04, 0.0, 0.0, DT)])
    r = associate_and_update(bank, jnp.int32(2), jnp.int32(2), dets, dv, 0.5, DT)
    assert int(r.det_id[0]) == 0
    assert not bool(r.det_new[0])


def test_duplicate_matches_same_track():
    # two detections both gate track 0: both match it (no claimed-set),
    # window receives both pushes in order
    bank = _bank_with_tracks([(0.0, 0.0)])
    dets, dv = _dets([(0.1, 0.0, 0.0, DT), (-0.1, 0.0, 0.0, DT)])
    r = associate_and_update(bank, jnp.int32(1), jnp.int32(1), dets, dv, 0.5, DT)
    assert int(r.det_id[0]) == 0 and int(r.det_id[1]) == 0
    w = np.asarray(r.bank.window[0])
    np.testing.assert_allclose(w[-1, 0], -0.1)
    np.testing.assert_allclose(w[-2, 0], 0.1)


def test_same_frame_registration_is_matchable():
    # det A registers a new track; det B within gate of A matches it
    bank = _bank_with_tracks([])
    dets, dv = _dets([(1.0, 1.0, 0.0, DT), (1.1, 1.0, 0.0, DT)])
    r = associate_and_update(bank, jnp.int32(0), jnp.int32(0), dets, dv, 0.5, DT)
    assert bool(r.det_new[0]) and not bool(r.det_new[1])
    assert int(r.det_id[0]) == 0 and int(r.det_id[1]) == 0


def test_new_track_window_filled_with_detection():
    bank = _bank_with_tracks([])
    dets, dv = _dets([(2.0, 3.0, 0.0, 0.7)])
    r = associate_and_update(bank, jnp.int32(0), jnp.int32(0), dets, dv, 0.5, DT)
    w = np.asarray(r.bank.window[0])
    np.testing.assert_allclose(w[:, 0], 2.0)
    np.testing.assert_allclose(w[:, 1], 3.0)
    np.testing.assert_allclose(w[:, 3], 0.7)


def test_interp_backfill_contents():
    # track last seen at t=0 pos x=0; detection at t=0.5, x=1.0
    # gap = 0.5 > 3*dt -> lost = round(0.5/0.1)-1 = 4 interpolated samples
    # interp x: 0.25, 0.5, 0.75, 1.0(t=0.4); then push det (x=1.0, t=0.5)
    bank = _bank_with_tracks([(0.0, 0.0)])
    dets, dv = _dets([(1.0, 0.0, 0.0, 0.5)])
    r = associate_and_update(bank, jnp.int32(1), jnp.int32(1), dets, dv, 1.5, DT)
    w = np.asarray(r.bank.window[0])
    np.testing.assert_allclose(w[:, 0], [0.0, 0.25, 0.5, 0.75, 1.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(w[:, 3], [0.0, 0.1, 0.2, 0.3, 0.4, 0.5], atol=1e-12)


def test_interp_matches_oracle_long_gap():
    import oracle
    from multiple_object_tracking_lidar_tpu.config import TrackerConfig

    cfg = TrackerConfig(data_length=L)
    ref = oracle.ReferenceTracker(cfg)
    ref._register(np.array([0.0, 0.0, 0.0, 0.0]))
    det = np.array([2.0, -1.0, 0.0, 1.3])  # lost = 12 > L
    ref._interp(0, det)
    ref.windows[0].pop(0)
    ref.windows[0].append(det)

    bank = _bank_with_tracks([(0.0, 0.0)])
    dets, dv = _dets([tuple(det)])
    r = associate_and_update(bank, jnp.int32(1), jnp.int32(1), dets, dv, 5.0, DT)
    np.testing.assert_allclose(
        np.asarray(r.bank.window[0]), np.asarray(ref.windows[0]), atol=1e-9
    )


def test_miss_outside_gate_registers_new():
    bank = _bank_with_tracks([(0.0, 0.0)])
    dets, dv = _dets([(5.0, 5.0, 0.0, DT)])
    r = associate_and_update(bank, jnp.int32(1), jnp.int32(1), dets, dv, 0.5, DT)
    assert bool(r.det_new[0])
    assert int(r.det_id[0]) == 1
    assert int(r.next_obj_num) == 2


def test_bank_overflow_drops_detection():
    bank = _bank_with_tracks([(float(i), 50.0) for i in range(8)], k_max=8)
    dets, dv = _dets([(30.0, 30.0, 0.0, DT)])
    r = associate_and_update(bank, jnp.int32(8), jnp.int32(8), dets, dv, 0.5, DT)
    assert int(r.overflow) == 1
    assert int(r.det_id[0]) == -1
    assert not bool(r.det_ok[0])
    assert int(r.next_obj_num) == 8  # id counter not advanced


def test_large_ids_exact_in_slow_path():
    # ids/births beyond 2**24 are not representable in f32; the sequential
    # fallback must carry them integrally.  Two detections gating one track
    # defeats the independence test, forcing the scan path.
    big = 2**24  # 16777216: big+1 == big in f32
    bank = _bank_with_tracks([(0.0, 0.0)])
    bank = bank._replace(
        obj_id=bank.obj_id.at[0].set(big + 1),
        birth_seq=bank.birth_seq.at[0].set(big + 1),
    )
    dets, dv = _dets(
        [(0.1, 0.0, 0.0, DT), (-0.1, 0.0, 0.0, DT), (50.0, 50.0, 0.0, DT)]
    )
    r = associate_and_update(
        bank, jnp.int32(big + 3), jnp.int32(big + 3), dets, dv, 0.5, DT
    )
    assert int(r.det_id[0]) == big + 1 and int(r.det_id[1]) == big + 1
    assert bool(r.det_new[2]) and int(r.det_id[2]) == big + 3
    assert int(r.next_obj_num) == big + 4
    assert int(r.bank.obj_id[1]) == big + 3
    assert int(r.bank.birth_seq[1]) == big + 3


def test_allow_match_false_registers_everything():
    bank = _bank_with_tracks([(0.0, 0.0)])
    dets, dv = _dets([(0.01, 0.0, 0.0, DT)])
    r = associate_and_update(
        bank, jnp.int32(1), jnp.int32(1), dets, dv, 0.5, DT, allow_match=jnp.bool_(False)
    )
    assert bool(r.det_new[0])
    assert int(r.det_id[0]) == 1


def test_nonfinite_detection_matches_gather_formulation(monkeypatch):
    """ADVICE r3: _onehot_take's 0*Inf row-poisoning blast radius must not
    change OBSERVABLE behavior vs a true gather.  One non-finite detection
    (a subnormal-G circumcenter overflow, cpp:787-809) flows through the
    window shift/backfill path under both formulations; published outputs
    must agree: identical finite values, identical non-finite PATTERN at
    the published granularity (per published coordinate), and the NaN
    watchdog condition fires identically."""
    import functools

    import multiple_object_tracking_lidar_tpu.ops.assign as assign_mod
    from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import (
        Perception,
        track_step,
    )
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker

    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=L,
        dtype="float32",
        caps=Capacities(
            n_max_points=256, m_max_voxels=128, m_max_dynamic=64,
            c_max_clusters=4, p_max_cluster=16, k_max_tracks=8,
        ),
    )
    gains = Tracker.compute_gains(
        cfg,
        (cfg.logSigma2_x, cfg.logMagnSigma2_x, cfg.logLengthScale_x),
        (cfg.logSigma2_y, cfg.logMagnSigma2_y, cfg.logLengthScale_y),
    )[2]
    step = functools.partial(track_step, config=cfg, gains_xy=gains)

    def perception(rows, t):
        d = np.zeros((4, 4), np.float32)
        v = np.zeros(4, bool)
        for i, r in enumerate(rows):
            d[i, : len(r)] = r
            v[i] = True
        z = jnp.int32(0)
        return Perception(
            dets=jnp.asarray(d), det_valid=jnp.asarray(v), t=jnp.float32(t),
            n_points=z, n_vox=z, n_dynamic=z, n_clusters=jnp.int32(len(rows)),
            cc_saturated=z,
        )

    def run():
        st = init_state(cfg.caps.k_max_tracks, L, jnp.float32)
        outs = []
        # frame 1 registers; frame 2 injects the non-finite detection onto
        # the registered track; frame 3 publishes with the poisoned window
        st, o = step(st, perception([(0.0, 0.0, 0.0, 0.1)], 0.1))
        outs.append(o)
        st, o = step(st, perception([(np.inf, np.nan, 0.0, 0.2)], 0.2))
        outs.append(o)
        st, o = step(st, perception([(0.05, 0.0, 0.0, 0.3)], 0.3))
        outs.append(o)
        return [jax.tree.map(np.asarray, o) for o in outs]

    import jax

    ours = run()

    def gather_take(table, idx):
        # out[k, i, :] = table[k, idx[k, i], :]
        return jnp.take_along_axis(table, idx[..., None], axis=1)

    monkeypatch.setattr(assign_mod, "_onehot_take", gather_take)
    ref = run()

    for o_a, o_b in zip(ours, ref):
        # published validity/ids identical
        np.testing.assert_array_equal(o_a.valid, o_b.valid)
        np.testing.assert_array_equal(o_a.obj_id, o_b.obj_id)
        for fa, fb in ((o_a.pos, o_b.pos), (o_a.vel, o_b.vel)):
            fin_a, fin_b = np.isfinite(fa), np.isfinite(fb)
            # the published non-finite pattern is identical (the watchdog
            # keys on any non-finite in a published row)
            np.testing.assert_array_equal(fin_a, fin_b)
            np.testing.assert_allclose(
                fa[fin_a & fin_b], fb[fin_a & fin_b], rtol=1e-6
            )
        # the NaN-watchdog condition (runtime/node.py): any published
        # non-finite pos/vel — identical either way
        bad_a = (~np.isfinite(o_a.pos[o_a.valid])).any() or (
            ~np.isfinite(o_a.vel[o_a.valid])
        ).any()
        bad_b = (~np.isfinite(o_b.pos[o_b.valid])).any() or (
            ~np.isfinite(o_b.vel[o_b.valid])
        ).any()
        assert bad_a == bad_b
