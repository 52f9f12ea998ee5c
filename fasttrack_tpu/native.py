"""ctypes bindings for the native host kernels (native/fasttrack_native.cpp).

Builds the shared library on first use if absent (g++ is in the image).
These are the CPU sides of the offload toggles plus the quadtree keypoint
distribution kept on host like the reference does.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libfasttrack_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.hamming_matrix_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fast_score_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.distribute_octree.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.distribute_octree.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def hamming_matrix_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 32) x (M, 32) packed uint8 -> (N, M) int32 Hamming (native)."""
    lib = _load()
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    n, m = len(a), len(b)
    out = np.empty((n, m), np.int32)
    lib.hamming_matrix_u8(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def fast_score(img: np.ndarray) -> np.ndarray:
    """(H, W) float32 -> FAST-9 score map (native CPU path)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out = np.empty((h, w), np.float32)
    lib.fast_score_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def distribute_octree(
    x: np.ndarray, y: np.ndarray, score: np.ndarray,
    bounds: tuple, n_target: int,
) -> np.ndarray:
    """Quadtree keypoint balancing (DistributeOctTree); returns selected
    indices (<= n_target), spread spatially, best score per cell."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    score = np.ascontiguousarray(score, np.float32)
    out = np.empty(n_target, np.int32)
    cnt = lib.distribute_octree(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), int(bounds[0]), int(bounds[1]), int(bounds[2]), int(bounds[3]),
        int(n_target),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out[:cnt].copy()
