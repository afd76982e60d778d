"""Checkpoint/resume for TrackerState.

The reference has no checkpoint story — a restart loses the whole track bank
(SURVEY §5.d).  Here the state is a fixed-shape pytree of arrays, so
serialization is one npz file; restoring resumes tracking mid-stream with
identical ids, windows and GP carries.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from multiple_object_tracking_lidar_tpu.tracker.state import TrackBank, TrackerState

_FIELDS = [
    "alive", "obj_id", "birth_seq", "window", "m0",
    "next_obj_num", "next_birth", "spin_counter", "initialized",
]


def save_state(path: str, state: TrackerState, extra: dict | None = None) -> None:
    flat = {
        "alive": state.bank.alive,
        "obj_id": state.bank.obj_id,
        "birth_seq": state.bank.birth_seq,
        "window": state.bank.window,
        "m0": state.bank.m0,
        "next_obj_num": state.next_obj_num,
        "next_birth": state.next_birth,
        "spin_counter": state.spin_counter,
        "initialized": state.initialized,
    }
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(extra or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str) -> tuple[TrackerState, dict]:
    with np.load(path) as z:
        d = {k: z[k] for k in _FIELDS}
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")
    bank = TrackBank(
        alive=jnp.asarray(d["alive"]),
        obj_id=jnp.asarray(d["obj_id"]),
        birth_seq=jnp.asarray(d["birth_seq"]),
        window=jnp.asarray(d["window"]),
        m0=jnp.asarray(d["m0"]),
    )
    state = TrackerState(
        bank=bank,
        next_obj_num=jnp.asarray(d["next_obj_num"]),
        next_birth=jnp.asarray(d["next_birth"]),
        spin_counter=jnp.asarray(d["spin_counter"]),
        initialized=jnp.asarray(d["initialized"]),
    )
    return state, meta
