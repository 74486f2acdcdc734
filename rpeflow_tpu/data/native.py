"""ctypes bindings for the native host-side data kernels (csrc/host_ops.cpp).

The library is built on first use (plain g++, see csrc/build.sh); every entry
point returns False / falls back to numpy when the library is unavailable so
the pipeline never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_CSRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC_DIR, "build", "librpeflow_host.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(["sh", os.path.join(_CSRC_DIR, "build.sh")],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.event_scatter_add.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.event_scatter_trilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.flow_warp_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_float,
        ]
        _LIB = lib
        return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def event_scatter_add(vox, xs, ys, tis, weights, num_bins) -> bool:
    """Scatter ``weights`` into ``vox [B, H, W]`` at (tis, ys, xs). Returns
    True when the native path handled it."""
    lib = _load()
    if lib is None:
        return False
    if not (vox.flags["C_CONTIGUOUS"] and vox.dtype == np.float32):
        return False  # in-place write requires the caller's own buffer
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    tis = np.ascontiguousarray(tis, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    b, h, w = vox.shape
    lib.event_scatter_add(_fptr(vox), len(xs), _iptr(xs), _iptr(ys),
                          _iptr(tis), _fptr(weights), b, h, w)
    return True


def event_scatter_trilinear(vox, xs, ys, ts, values, num_bins) -> bool:
    lib = _load()
    if lib is None:
        return False
    if not (vox.flags["C_CONTIGUOUS"] and vox.dtype == np.float32):
        return False
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    ts = np.ascontiguousarray(ts, np.float32)
    values = np.ascontiguousarray(
        np.broadcast_to(np.asarray(values, np.float32), xs.shape))
    b, h, w = vox.shape
    lib.event_scatter_trilinear(_fptr(vox), len(xs), _fptr(xs), _fptr(ys),
                                _fptr(ts), _fptr(values), b, h, w)
    return True
