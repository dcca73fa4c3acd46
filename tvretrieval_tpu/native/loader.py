"""ctypes loader for the native C++ helpers (native/libtvr_native.so).

Builds the library on first use if the toolchain is available; callers fall
back to the numpy implementations when it is not (native_available() ->
False). The reference has no first-party native code (SURVEY.md §2) — here
the host-side post-processing hot ops (temporal NMS over ~10K queries x 200
predictions) run in C++.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtvr_native.so"))

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.temporal_nms.restype = ctypes.c_int
        lib.temporal_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.temporal_nms_batch.restype = None
        lib.temporal_nms_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return get_native_lib() is not None


def temporal_nms_native(preds: np.ndarray, nms_threshold: float,
                        max_after_nms: int) -> np.ndarray:
    """preds: (n, 3) float32 [st, ed, score] -> (kept, 3) float32."""
    lib = get_native_lib()
    assert lib is not None, "native library unavailable"
    preds = np.ascontiguousarray(preds, dtype=np.float32)
    out = np.empty((max_after_nms, 3), dtype=np.float32)
    kept = lib.temporal_nms(
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(preds),
        ctypes.c_float(nms_threshold), max_after_nms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:kept]


def temporal_nms_batch_native(preds: np.ndarray, offsets: np.ndarray,
                              nms_threshold: float, max_after_nms: int):
    """preds: (sum_n, 3); offsets: (n_queries+1,) int64 ->
    (out (Q, max_after, 3), n_kept (Q,))."""
    lib = get_native_lib()
    assert lib is not None, "native library unavailable"
    preds = np.ascontiguousarray(preds, dtype=np.float32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_q = len(offsets) - 1
    out = np.empty((n_q, max_after_nms, 3), dtype=np.float32)
    n_kept = np.empty((n_q,), dtype=np.int32)
    lib.temporal_nms_batch(
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_q, ctypes.c_float(nms_threshold), max_after_nms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_kept.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, n_kept
