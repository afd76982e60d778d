"""Auction assignment (improved association mode)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from multiple_object_tracking_lidar_tpu.ops.hungarian import (
    auction_assign,
    hungarian_associate_and_update,
)
from multiple_object_tracking_lidar_tpu.tracker.state import init_state

L = 6
DT = 0.1


def test_auction_matches_scipy(rng):
    for _ in range(5):
        d, k = 12, 10
        cost = rng.uniform(0, 10, (d, k))
        feas = rng.uniform(size=(d, k)) < 0.7
        assigned, sat = auction_assign(
            jnp.asarray(cost), jnp.asarray(feas), eps=1e-4, max_cost=10.0
        )
        assigned = np.asarray(assigned)
        assert int(sat) == 0
        # feasibility respected, one-to-one
        used = [a for a in assigned if a >= 0]
        assert len(used) == len(set(used))
        for i, a in enumerate(assigned):
            if a >= 0:
                assert feas[i, a]
        # compare total cost against scipy on the gated problem
        big = 1e6
        c2 = np.where(feas, cost, big)
        rows, cols = linear_sum_assignment(c2)
        scipy_pairs = [(r, c) for r, c in zip(rows, cols) if feas[r, c]]
        scipy_cost = sum(cost[r, c] for r, c in scipy_pairs)
        ours_cost = sum(cost[i, a] for i, a in enumerate(assigned) if a >= 0)
        # auction assigns maximal cardinality too
        assert len(used) == len(scipy_pairs)
        assert ours_cost <= scipy_cost + d * 1e-3


def test_auction_adversarial_near_ties(rng):
    """VERDICT r2 weak #6: near-tied costs at larger D are the auction's
    pathological regime (tiny bid increments -> many iterations).  Either the
    matching is optimal within the documented D*eps bound with the
    saturation flag clear, or the flag must fire — never a silently
    suboptimal frame."""
    d = k = 48
    base = rng.uniform(0, 1e-3, (d, k))          # all costs within 1e-3
    cost = 0.5 + base                             # near-tied everywhere
    feas = np.ones((d, k), bool)
    assigned, sat = auction_assign(
        jnp.asarray(cost), jnp.asarray(feas), eps=1e-4, max_cost=1.0
    )
    assigned = np.asarray(assigned)
    rows, cols = linear_sum_assignment(cost)
    scipy_cost = cost[rows, cols].sum()
    used = [a for a in assigned if a >= 0]
    if int(sat) == 0:
        assert len(used) == len(set(used)) == d
        ours = sum(cost[i, a] for i, a in enumerate(assigned) if a >= 0)
        assert ours <= scipy_cost + d * 1e-4
    # a starved iteration budget MUST raise the flag (deterministic: with
    # one iteration per phase most rows cannot be assigned)
    _, sat2 = auction_assign(
        jnp.asarray(cost), jnp.asarray(feas), eps=1e-4, max_cost=1.0, max_iters=1
    )
    assert int(sat2) > 0


def _bank(positions, k_max=8):
    st = init_state(k_max, L, jnp.float64)
    bank = st.bank
    alive = np.zeros(k_max, bool)
    obj_id = np.full(k_max, -1, np.int32)
    birth = np.full(k_max, 2**30, np.int32)
    window = np.zeros((k_max, L, 4))
    for i, p in enumerate(positions):
        alive[i] = True
        obj_id[i] = i
        birth[i] = i
        window[i, :, 0] = p[0]
        window[i, :, 1] = p[1]
    return bank._replace(
        alive=jnp.asarray(alive),
        obj_id=jnp.asarray(obj_id),
        birth_seq=jnp.asarray(birth),
        window=jnp.asarray(window),
    )


def test_hungarian_beats_greedy_on_crossing():
    """Two tracks at x=0 and x=0.3; detections at x=0.28 and x=0.02.
    Greedy (det order) gives det0 -> track0 (dist .28 < .5, first in reg
    order) — a misassignment.  Hungarian pairs det0->track1, det1->track0."""
    bank = _bank([(0.0, 0.0), (0.3, 0.0)])
    dets = jnp.asarray(
        [[0.28, 0.0, 0.0, DT], [0.02, 0.0, 0.0, DT]], jnp.float64
    )
    dv = jnp.ones(2, bool)
    r = hungarian_associate_and_update(
        bank, jnp.int32(2), jnp.int32(2), dets, dv, 0.5, DT
    )
    assert int(r.det_id[0]) == 1
    assert int(r.det_id[1]) == 0
    w = np.asarray(r.bank.window)
    np.testing.assert_allclose(w[1, -1, 0], 0.28)
    np.testing.assert_allclose(w[0, -1, 0], 0.02)


def test_hungarian_registers_unmatched():
    bank = _bank([(0.0, 0.0)])
    dets = jnp.asarray(
        [[0.1, 0.0, 0.0, DT], [5.0, 5.0, 0.0, DT], [8.0, 8.0, 0.0, DT]], jnp.float64
    )
    dv = jnp.ones(3, bool)
    r = hungarian_associate_and_update(
        bank, jnp.int32(1), jnp.int32(1), dets, dv, 0.5, DT
    )
    assert int(r.det_id[0]) == 0          # matched existing
    assert int(r.det_id[1]) == 1          # first new id
    assert int(r.det_id[2]) == 2
    assert bool(r.det_new[1]) and bool(r.det_new[2])
    assert int(r.next_obj_num) == 3
    # windows of new tracks filled with their detection
    w = np.asarray(r.bank.window)
    slot1 = int(r.det_slot[1])
    np.testing.assert_allclose(w[slot1, :, 0], 5.0)


def test_hungarian_no_duplicates():
    """Two detections near one track: only the closer one matches; the other
    registers a new track (contrast with greedy's duplicate-id quirk)."""
    bank = _bank([(0.0, 0.0)])
    dets = jnp.asarray(
        [[0.2, 0.0, 0.0, DT], [0.05, 0.0, 0.0, DT]], jnp.float64
    )
    dv = jnp.ones(2, bool)
    r = hungarian_associate_and_update(
        bank, jnp.int32(1), jnp.int32(1), dets, dv, 0.5, DT
    )
    ids = [int(r.det_id[0]), int(r.det_id[1])]
    assert ids[1] == 0          # closer detection takes the track
    assert ids[0] == 1          # farther one becomes a new track
    assert len(set(ids)) == 2


def test_pipeline_runs_with_hungarian(fixture_map, tiny_config):
    import jax

    from multiple_object_tracking_lidar_tpu.io.scenario import Scenario, ScenarioObject
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame

    cfg = tiny_config.replace(association="hungarian")
    tracker = Tracker(cfg)
    state = tracker.init_state()
    env = build_static_mask(fixture_map, cfg.static_tolarance)
    sc = Scenario(
        grid=fixture_map,
        objects=[ScenarioObject(0.0, 1.0, 0.0, 0.4), ScenarioObject(1.0, 6.0, -0.3, 0.0)],
        static_points_per_frame=400,
        seed=2,
    )
    ids = set()
    for k in range(10):
        pts, t = sc.frame_arrays(k)
        buf = np.zeros((cfg.caps.n_max_points, 3), np.float32)
        buf[: len(pts)] = pts[: cfg.caps.n_max_points]
        mask = np.zeros(cfg.caps.n_max_points, bool)
        mask[: min(len(pts), cfg.caps.n_max_points)] = True
        state, out = tracker.step(
            state, Frame(points=jnp.asarray(buf), mask=jnp.asarray(mask), t=jnp.float32(t)), env
        )
        out = jax.tree.map(np.asarray, out)
        frame_ids = [int(out.obj_id[i]) for i in range(len(out.valid)) if out.valid[i]]
        assert len(frame_ids) == len(set(frame_ids))  # no duplicate ids
        ids.update(frame_ids)
    assert ids == {0, 1}
