"""ctypes bindings for the native host kernels (native/gaussctrl_native.cpp).

Builds the shared library on first use (g++, see native/Makefile) and exposes
numpy-friendly wrappers. Every entry point has a pure-python/cv2 fallback at
its call site, so the framework works without a compiler — the native path is
the fast default for the host data pipeline (the role OpenCV/simple_knn play
for the reference's dependency stack).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgaussctrl_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (_LIB_PATH.stat().st_mtime <
                                      (_NATIVE_DIR / "gaussctrl_native.cpp"
                                       ).stat().st_mtime):
            subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.undistort_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float)]
        lib.resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.knn_mean_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def undistort(image: np.ndarray, fx: float, fy: float, cx: float, cy: float,
              dist6) -> np.ndarray:
    """OPENCV-model undistortion, output intrinsics == input intrinsics.

    image [H,W,C] float32 in any range; dist6 = (k1,k2,k3,k4,p1,p2)
    (the transforms.json field order, gc_dataparser_ns.py)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(image, np.float32)
    h, w, c = img.shape
    out = np.empty_like(img)
    d = np.ascontiguousarray(dist6, np.float64)
    lib.undistort_f32(_fptr(img), h, w, c, fx, fy, cx, cy,
                      d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      _fptr(out))
    return out


def resize(image: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(image, np.float32)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear(_fptr(img), h, w, c, oh, ow, _fptr(out))
    return out


def knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to each point's k nearest neighbours (simple_knn role)."""
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((pts.shape[0],), np.float32)
    lib.knn_mean_dist(_fptr(pts), pts.shape[0], k, _fptr(out))
    return out
