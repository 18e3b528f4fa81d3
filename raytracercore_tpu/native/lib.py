"""ctypes bindings + lazy compilation for the native components."""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libbvh.so"
_SRC = _DIR / "bvh_builder.cpp"

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO),
                     str(_SRC)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_SO))
            lib.rtc_build_bvh.restype = ctypes.c_int
            lib.rtc_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — fall back to numpy builder
            log.warning("native BVH builder unavailable (%s); "
                        "using numpy fallback", e)
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(tri_bmin: np.ndarray, tri_bmax: np.ndarray,
                     leaf_size: int = 4):
    """Run the C++ binned-SAH builder.

    Args: [T, 3] float32 per-triangle bounds.
    Returns (bmin [N,3], bmax [N,3], skip [N], leaf_slot [N],
    leaf_prims [L, K]) as numpy arrays, or None if the native lib is
    unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = int(tri_bmin.shape[0])
    bmin = np.ascontiguousarray(tri_bmin, np.float32)
    bmax = np.ascontiguousarray(tri_bmax, np.float32)
    cap_nodes = 2 * n + 1
    out_bmin = np.empty((cap_nodes, 3), np.float32)
    out_bmax = np.empty((cap_nodes, 3), np.float32)
    out_skip = np.empty(cap_nodes, np.int32)
    out_slot = np.empty(cap_nodes, np.int32)
    out_prims = np.empty(cap_nodes * leaf_size, np.int32)
    n_nodes = np.zeros(1, np.int32)
    n_leaves = np.zeros(1, np.int32)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.rtc_build_bvh(fp(bmin), fp(bmax), n, leaf_size,
                           fp(out_bmin), fp(out_bmax), ip(out_skip),
                           ip(out_slot), ip(out_prims), ip(n_nodes),
                           ip(n_leaves))
    if rc != 0:
        return None
    nn = int(n_nodes[0])
    nl = int(n_leaves[0])
    return (out_bmin[:nn].copy(), out_bmax[:nn].copy(),
            out_skip[:nn].copy(), out_slot[:nn].copy(),
            out_prims[: nl * leaf_size].reshape(nl, leaf_size).copy())
