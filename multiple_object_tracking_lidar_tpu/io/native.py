"""ctypes bindings to the native host runtime (native/motl_host.cpp).

Loaded lazily and optional: every native entry point has a NumPy reference
implementation (io/pointcloud2.py, utils/colors.py) used when the shared
library hasn't been built.  Build with:  make -C native
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libmotl_host.so")


def load_native():
    """Return the loaded library or None (cached)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.motl_decode_pc2_f32.restype = ctypes.c_long
    lib.motl_decode_pc2_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.POINTER(ctypes.c_long),
    ]
    lib.motl_glibc_colors.restype = None
    lib.motl_glibc_colors.argtypes = [
        ctypes.c_uint, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def decode_pc2_native(msg, n_max: int) -> tuple[np.ndarray, np.ndarray] | None:
    """Native decode of the canonical float32 XYZ layout; None if unsupported."""
    lib = load_native()
    if lib is None:
        return None
    offs = {}
    for f in msg.fields:
        offs[f.name] = (f.offset, f.datatype)
    try:
        (xo, xdt), (yo, ydt), (zo, zdt) = offs["x"], offs["y"], offs["z"]
    except KeyError:
        return None
    if not (xdt == ydt == zdt == 7):  # FLOAT32 only in the native path
        return None
    # Bounds validation before handing raw pointers to C: the native decoder
    # reads data + i*point_step + off with no checks of its own, so a malformed
    # or truncated message must fall back to the (raising) NumPy path instead
    # of reading out of bounds on the host.
    if msg.n_points < 0 or msg.point_step <= 0:
        return None
    if max(xo, yo, zo) + 4 > msg.point_step:
        return None
    if len(msg.data) < msg.n_points * msg.point_step:
        return None

    out = np.empty((n_max, 3), dtype=np.float32)
    mask = np.empty(n_max, dtype=np.uint8)
    seen = ctypes.c_long(0)
    lib.motl_decode_pc2_f32(
        msg.data,
        msg.n_points,
        msg.point_step,
        xo, yo, zo,
        1 if msg.is_bigendian else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_max,
        ctypes.byref(seen),
    )
    return out, mask.astype(bool)


def glibc_colors_native(seed: int, n: int) -> np.ndarray | None:
    lib = load_native()
    if lib is None:
        return None
    out = np.empty((n, 4), dtype=np.float32)
    lib.motl_glibc_colors(seed, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
