"""ctypes bindings for the native host-runtime library (libupp_native.so).

Builds on demand with g++ (no pip deps); every entry point has a numpy
fallback so the framework keeps working without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "upp_native.cpp")
_SO = os.path.join(_DIR, "libupp_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.upp_fps.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                                ctypes.c_int, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int32)]
        lib.upp_fps_batch.argtypes = [ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.c_int]
        lib.upp_read_npy_batch.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int64,
                                           ctypes.POINTER(ctypes.c_float),
                                           ctypes.c_int]
        lib.upp_read_npy_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def fps_host(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    """Host FPS indices [m] for one cloud [n, 3] (pointnet2 semantics).
    Native when available, numpy fallback otherwise."""
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = pts.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty(m, np.int32)
        lib.upp_fps(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    n, m, start, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    dist = np.full(n, 1e10, np.float32)
    idx = np.empty(m, np.int64)
    cur = start
    for s in range(m):
        idx[s] = cur
        d = ((pts - pts[cur]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    return idx.astype(np.int32)


def fps_host_batch(points: np.ndarray, m: int, n_threads: int = 8) -> np.ndarray:
    """Batched host FPS indices [b, m] for clouds [b, n, 3]."""
    pts = np.ascontiguousarray(points[..., :3], np.float32)
    b, n, _ = pts.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((b, m), np.int32)
        lib.upp_fps_batch(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          b, n, m,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          n_threads)
        return out
    return np.stack([fps_host(pts[i], m) for i in range(b)])


def read_npy_batch(paths: List[str], n_points: int, n_threads: int = 8
                   ) -> np.ndarray:
    """Parallel-read b .npy clouds into [b, n_points, 3] f32 (zero-padded)."""
    lib = get_lib()
    b = len(paths)
    if lib is not None:
        out = np.empty((b, n_points, 3), np.float32)
        blob = b"".join(p.encode() + b"\0" for p in paths)
        ok = lib.upp_read_npy_batch(
            blob, b, n_points * 3,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if ok == b:
            return out
        # a failed read is zero-filled by the C++ side; silently training on
        # an all-zero cloud (→ 0/0 NaNs in per-cloud normalisation) is worse
        # than failing — re-read per-item so the exception names the file
    out = np.zeros((b, n_points, 3), np.float32)
    for i, p in enumerate(paths):
        arr = np.load(p).astype(np.float32).reshape(-1, 3)[:n_points]
        out[i, :arr.shape[0]] = arr
    return out
