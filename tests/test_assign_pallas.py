"""Parity: the VMEM Pallas association-scan kernel vs the jnp lax.scan.

The kernel (`ops/assign_pallas.py`) must make bit-identical greedy decisions
to the order-faithful jnp scan in `ops/assign.py` — same slots, ids,
registrations, interp triggers, counters, and resulting bank — on every
frame shape: conflict-heavy frames (duplicate gating, near-threshold
spacing), first-frame registration, bank overflow, interp gaps, and invalid
detections.  Runs in Pallas interpret mode on CPU (ref semantics:
cpp:177-219, 507-543).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_object_tracking_lidar_tpu.ops.assign import associate_and_update
from multiple_object_tracking_lidar_tpu.tracker.state import init_state

L = 6
DT = 0.1
THR = 0.5


def _bank(positions, times=None, k_max=8, extra_alive=()):
    st = init_state(k_max, L, jnp.float32)
    bank = st.bank
    times = times or [0.0] * len(positions)
    alive = np.zeros(k_max, bool)
    obj_id = np.full(k_max, -1, np.int32)
    birth = np.full(k_max, 2**30, np.int32)
    window = np.zeros((k_max, L, 4), np.float32)
    for i, (p, t) in enumerate(zip(positions, times)):
        alive[i] = True
        obj_id[i] = i
        birth[i] = i
        window[i, :, 0] = p[0]
        window[i, :, 1] = p[1]
        window[i, :, 3] = t
    for i in extra_alive:
        alive[i] = True
        obj_id[i] = 100 + i
        birth[i] = 100 + i
    return bank._replace(
        alive=jnp.asarray(alive),
        obj_id=jnp.asarray(obj_id),
        birth_seq=jnp.asarray(birth),
        window=jnp.asarray(window),
    )


def _both(bank, nobj, nbirth, dets, dv, allow=True, thr=THR):
    kw = dict(
        id_threshold=thr,
        dt_gp=DT,
        allow_match=allow,
    )
    a = associate_and_update(
        bank, jnp.int32(nobj), jnp.int32(nbirth), dets, dv, backend="jnp", **kw
    )
    b = associate_and_update(
        bank, jnp.int32(nobj), jnp.int32(nbirth), dets, dv, backend="pallas", **kw
    )
    return a, b


def _assert_equal(a, b):
    """Full AssocResult parity.  ``det_slot`` is compared only where
    ``det_ok``: for dropped/invalid detections the fast jnp path emits 0 and
    the slow path emits the would-be free slot — a pre-existing don't-care
    (every consumer masks on det_ok, see apply_window_updates / pipeline
    multiplicity tables)."""
    for name in a._fields:
        x, y = getattr(a, name), getattr(b, name)
        if name == "bank":
            for bn in x._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(x, bn)),
                    np.asarray(getattr(y, bn)),
                    err_msg=f"mismatch in bank.{bn}",
                )
            continue
        if name == "det_slot":
            ok = np.asarray(a.det_ok)
            np.testing.assert_array_equal(
                np.asarray(x)[ok], np.asarray(y)[ok], err_msg="det_slot[ok]"
            )
            continue
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"mismatch in {name}"
        )


def test_conflict_heavy_duplicates():
    # two dets gate the same track; third det gates two tracks — the
    # order-faithful sequential semantics must match exactly
    bank = _bank([(0.0, 0.0), (0.4, 0.0)])
    dets = jnp.asarray(
        [
            [0.1, 0.0, 0.0, DT],
            [-0.1, 0.0, 0.0, DT],
            [0.2, 0.0, 0.0, DT],
        ],
        jnp.float32,
    )
    dv = jnp.ones(3, bool)
    a, b = _both(bank, 2, 2, dets, dv)
    _assert_equal(a, b)
    assert int(a.det_id[0]) == 0 and int(a.det_id[1]) == 0


def test_first_frame_registration():
    bank = _bank([])
    dets = jnp.asarray(
        [[float(i), 0.0, 0.0, 0.0] for i in range(5)], jnp.float32
    )
    dv = jnp.ones(5, bool)
    a, b = _both(bank, 0, 0, dets, dv, allow=jnp.bool_(False))
    _assert_equal(a, b)
    assert int(a.next_obj_num) == 5


def test_overflow_and_invalid():
    # 3 free slots, 5 want to register (one invalid in the middle)
    bank = _bank([(100.0, 100.0)] * 5, k_max=8)
    dets = jnp.asarray(
        [[float(3 * i), 50.0, 0.0, DT] for i in range(6)], jnp.float32
    )
    dv = jnp.asarray([True, True, False, True, True, True])
    a, b = _both(bank, 5, 5, dets, dv)
    _assert_equal(a, b)
    assert int(a.overflow) == 2  # 5 valid new, 3 slots


def test_interp_gap_trigger():
    bank = _bank([(0.0, 0.0)], times=[0.0])
    dets = jnp.asarray([[0.1, 0.0, 0.0, 0.55]], jnp.float32)  # gap 0.55 > 3*DT
    dv = jnp.ones(1, bool)
    a, b = _both(bank, 1, 1, dets, dv)
    _assert_equal(a, b)
    # interp backfilled the window identically (checked via bank.window above)


def test_register_then_match_within_frame():
    # det 0 registers a new track; det 1 lands within thr of det 0 and must
    # match that just-registered track (sequential visibility, cpp:177-219)
    bank = _bank([])
    dets = jnp.asarray(
        [[1.0, 1.0, 0.0, DT], [1.1, 1.0, 0.0, DT]], jnp.float32
    )
    dv = jnp.ones(2, bool)
    a, b = _both(bank, 7, 3, dets, dv)
    _assert_equal(a, b)
    assert int(a.det_id[1]) == 7 and not bool(a.det_new[1])


@pytest.mark.parametrize("seed", range(8))
def test_random_dense_frames(seed):
    rng = np.random.default_rng(seed)
    k_max = 16
    n_alive = int(rng.integers(0, k_max))
    pos = rng.uniform(-2, 2, (n_alive, 2)).astype(np.float32)
    times = [float(t) for t in rng.uniform(0.0, 0.3, n_alive)]
    bank = _bank([tuple(p) for p in pos], times=times, k_max=k_max)
    D = int(rng.integers(1, 20))
    # cluster detections tightly so conflicts are the norm, with time jitter
    # that trips the interp branch on some rows
    dets = np.zeros((D, 4), np.float32)
    dets[:, :2] = rng.uniform(-2, 2, (D, 2)) * rng.choice(
        [0.2, 1.0], D
    ).reshape(-1, 1)
    dets[:, 3] = rng.choice([DT, 0.55], D)
    dv = rng.uniform(size=D) > 0.15
    if not dv.any():
        dv[0] = True
    a, b = _both(
        bank,
        n_alive,
        n_alive,
        jnp.asarray(dets),
        jnp.asarray(dv),
    )
    _assert_equal(a, b)


def test_nonsquare_capacities():
    # D > K and K not a multiple of 8
    bank = _bank([(0.0, 0.0)], k_max=5)
    dets = jnp.asarray(
        [[0.05 * i, 0.0, 0.0, DT] for i in range(11)], jnp.float32
    )
    dv = jnp.ones(11, bool)
    a, b = _both(bank, 1, 1, dets, dv)
    _assert_equal(a, b)
