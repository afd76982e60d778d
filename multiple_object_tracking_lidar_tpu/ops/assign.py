"""Data association + track lifecycle: order-faithful scan, vectorized writes.

Reference behavior (ref: src/multiple_object_tracking_lidar.cpp:163-232,
507-619): for each new centroid IN CLUSTER ORDER, scan registered tracks IN
REGISTRATION ORDER and claim the FIRST whose last queued position is within
``id_threshold`` (strict <, 2-D distance, cpp:194).  On a match: if the time
gap exceeds 3*dt_gp, backfill the window by linear interpolation
(cpp:197-200, 593-619), then pop-front/push-back the window (cpp:586-591).
On a miss: register a new track whose window is entirely filled with the
detection (cpp:507-519).  Notable reference quirks reproduced faithfully:

* Greedy first-match, NOT Hungarian — a later detection can claim a track a
  closer detection "should" have had.
* No claimed-set: several detections may match the SAME track in one frame
  (each pops/pushes the window); the output list then contains duplicate ids.
* A track registered earlier in the same frame CAN be matched by a later
  detection of the same frame.

TPU design: the inherently sequential DECISIONS run in a `lax.scan` whose
carry is only the small per-track summary the decisions read (last position/
time, alive, ids) — O(K) scalar vector work per detection.  The heavy state
(the (K, L, 4) windows) is rebuilt once afterwards in closed form: a slot
that received detections d_1..d_c applies an optional interpolation backfill
(for d_1's gap only; same-frame followers have gap 0), one full-window fill
if d_1 registered, and c (or c-1) pushes — all expressible as masked gathers.

Deviation (documented): the reference's bank grows without bound; ours drops
a new registration when all K slots are alive and reports it in ``overflow``
(the id counter is not advanced).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.tracker.state import TrackBank

_INT_BIG = jnp.int32(2**30)


class AssocResult(NamedTuple):
    bank: TrackBank
    next_obj_num: jax.Array
    next_birth: jax.Array
    det_slot: jax.Array     # (D,) bank slot per detection
    det_id: jax.Array       # (D,) published obj id per detection (-1 dropped)
    det_new: jax.Array      # (D,) registered a new track
    det_ok: jax.Array       # (D,) detection produced/updated a track
    overflow: jax.Array     # scalar int32


def _interp_backfill(w: jnp.ndarray, det: jnp.ndarray, dt_gp: float) -> jnp.ndarray:
    """Vectorized equivalent of fill_with_linear_interpolation (cpp:593-619).

    The reference pops/pushes ``lost_num`` interpolated samples
    interp[j] = last + (j+1) * d_total / lost_num at times last.t + (j+1)*dt_gp.
    Closed form over window positions: new[k] = w[k + lost] for
    k < L - lost, else interp[k - (L - lost)].
    """
    L = w.shape[0]
    last = w[L - 1]
    gap = det[3] - last[3]
    lost = jnp.round(gap / dt_gp).astype(jnp.int32) - 1  # cpp:603
    lost_c = jnp.clip(lost, 1, None)  # guard division; caller gates lost >= 1

    ks = jnp.arange(L, dtype=jnp.int32)
    src = ks + lost
    shifted = w[jnp.clip(src, 0, L - 1)]
    jj = (ks - L + lost_c + 1).astype(w.dtype)  # (j+1) for interp region
    d_total = det - last                         # dx, dy total; z total = 0 (cpp:601)
    step_xyz = d_total[:3] / lost_c.astype(w.dtype)
    interp = jnp.concatenate(
        [
            last[None, :3] + jj[:, None] * step_xyz[None, :] * jnp.array([1.0, 1.0, 0.0], w.dtype),
            (last[3] + jj * jnp.asarray(dt_gp, w.dtype))[:, None],
        ],
        axis=1,
    )
    return jnp.where((src < L)[:, None], shifted, interp)


def associate_and_update(
    bank: TrackBank,
    next_obj_num: jax.Array,
    next_birth: jax.Array,
    dets: jnp.ndarray,        # (D, 4) [x, y, 0, t]
    det_valid: jnp.ndarray,   # (D,)
    id_threshold: float,
    dt_gp: float,
    interp_gap_factor: float = 3.0,
    allow_match: jax.Array | bool = True,
) -> AssocResult:
    """``allow_match=False`` reproduces the first-frame path (cpp:153-156):
    every centroid registers a new track, no gating against the bank."""
    K = bank.alive.shape[0]
    L = bank.window.shape[1]
    D = dets.shape[0]
    idxK = jnp.arange(K, dtype=jnp.int32)
    dtype = bank.window.dtype

    # ---- decision scan: small carry only ------------------------------------
    def step(carry, xs):
        alive, obj_id, birth_seq, last_xyt, nobj, nbirth, ovf = carry
        det, dv = xs

        dx = det[0] - last_xyt[:, 0]
        dy = det[1] - last_xyt[:, 1]
        dist = jnp.sqrt(dx * dx + dy * dy)
        gate = alive & (dist < id_threshold) & allow_match
        any_match = gate.any()

        # first match in registration order == min birth_seq among gated
        slot_m = jnp.argmin(jnp.where(gate, birth_seq, _INT_BIG))
        # registration target: lowest-index free slot
        slot_n = jnp.argmin(jnp.where(alive, _INT_BIG, idxK))
        bank_full = alive.all()
        slot = jnp.where(any_match, slot_m, slot_n).astype(jnp.int32)

        gap = det[3] - last_xyt[slot, 2]
        do_interp = any_match & (gap > interp_gap_factor * dt_gp) & (
            jnp.round(gap / dt_gp).astype(jnp.int32) - 1 >= 1
        )

        register = dv & ~any_match & ~bank_full
        matched = dv & any_match
        write = matched | register

        last_xyt = last_xyt.at[slot].set(
            jnp.where(write, det[jnp.array([0, 1, 3])], last_xyt[slot])
        )
        alive = alive.at[slot].set(jnp.where(register, True, alive[slot]))
        obj_id = obj_id.at[slot].set(jnp.where(register, nobj, obj_id[slot]))
        birth_seq = birth_seq.at[slot].set(jnp.where(register, nbirth, birth_seq[slot]))

        out_id = jnp.where(
            matched, obj_id[slot], jnp.where(register, nobj, jnp.int32(-1))
        )
        nobj = nobj + register.astype(jnp.int32)
        nbirth = nbirth + register.astype(jnp.int32)
        ovf = ovf + (dv & ~any_match & bank_full).astype(jnp.int32)

        return (alive, obj_id, birth_seq, last_xyt, nobj, nbirth, ovf), (
            slot, out_id, register, write, do_interp & write,
        )

    last_xyt0 = jnp.stack(
        [bank.window[:, L - 1, 0], bank.window[:, L - 1, 1], bank.window[:, L - 1, 3]],
        axis=1,
    )
    # ovf seed derived from state so its varying-axes type matches the body
    # output under shard_map/vmap (value is 0)
    ovf0 = next_obj_num * jnp.int32(0)
    carry0 = (bank.alive, bank.obj_id, bank.birth_seq, last_xyt0, next_obj_num, next_birth, ovf0)
    carry, (slots, ids, news, oks, interps) = jax.lax.scan(step, carry0, (dets, det_valid))
    alive, obj_id, birth_seq, _, nobj, nbirth, ovf = carry
    slots = slots.astype(jnp.int32)

    # ---- vectorized window rebuild ------------------------------------------
    # per-slot detection table in arrival order
    onehot = (slots[:, None] == idxK[None, :]) & oks[:, None]            # (D, K)
    ordinal = jnp.take_along_axis(
        jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1, slots[:, None], axis=1
    )[:, 0]                                                              # (D,)
    mult = onehot.sum(0)                                                 # (K,)
    table = (
        jnp.zeros((K + 1, D, 4), dtype)
        .at[jnp.where(oks, slots, K), jnp.clip(ordinal, 0, D - 1)]
        .set(jnp.where(oks[:, None], dets, 0.0), mode="drop")[:K]
    )                                                                    # (K, D, 4)

    # which slots' FIRST detection registered / interpolated
    first_reg = (
        jnp.zeros(K + 1, bool)
        .at[jnp.where(oks & (ordinal == 0), slots, K)]
        .set(news, mode="drop")[:K]
    )
    first_interp = (
        jnp.zeros(K + 1, bool)
        .at[jnp.where(oks & (ordinal == 0), slots, K)]
        .set(interps, mode="drop")[:K]
    )

    d1 = table[:, 0, :]                                                  # (K, 4)
    interp_w = jax.vmap(lambda w, d: _interp_backfill(w, d, dt_gp))(bank.window, d1)
    base = jnp.where(first_interp[:, None, None], interp_w, bank.window)
    base = jnp.where(
        first_reg[:, None, None], jnp.broadcast_to(d1[:, None, :], (K, L, 4)), base
    )

    # pushes: all assigned dets except d1 when it registered (the fill IS d1)
    n_push = jnp.where(first_reg, mult - 1, mult)                        # (K,)
    offset = first_reg.astype(jnp.int32)                                 # skip d1 if filled
    ks = jnp.arange(L, dtype=jnp.int32)[None, :]                         # (1, L)
    src = ks + n_push[:, None]                                           # (K, L)
    from_base = jnp.take_along_axis(base, jnp.clip(src, 0, L - 1)[..., None], axis=1)
    push_idx = jnp.clip(ks - (L - n_push[:, None]) + offset[:, None], 0, D - 1)
    from_push = jnp.take_along_axis(table, push_idx[..., None], axis=1)
    window = jnp.where((src < L)[..., None], from_base, from_push)
    window = jnp.where((mult > 0)[:, None, None], window, bank.window)

    # reset GP carry for newly registered tracks (ctor zeroes m, cpp:45)
    reg_mask = (
        jnp.zeros(K + 1, bool).at[jnp.where(news, slots, K)].set(news, mode="drop")[:K]
    )
    m0 = jnp.where(reg_mask[:, None, None], 0.0, bank.m0)

    return AssocResult(
        bank=TrackBank(alive=alive, obj_id=obj_id, birth_seq=birth_seq, window=window, m0=m0),
        next_obj_num=nobj,
        next_birth=nbirth,
        det_slot=slots,
        det_id=ids.astype(jnp.int32),
        det_new=news,
        det_ok=oks,
        overflow=ovf,
    )
