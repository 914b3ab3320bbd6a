"""ctypes bindings + lazy build of the native host-pipeline library
(``native/slak_host.cpp``) — the data-path analog of the reference's native
kernel build (``cutlass/.../setup.py``), minus the CUDA.

The library compiles once per machine into ``native/build/`` with g++ -O3;
everything degrades gracefully to the PIL path when a compiler is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "slak_host.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libslak_host.so")


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SLAK_NO_NATIVE"):
            return None
        path = _build()
        if path is None or not os.path.exists(_SRC):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.slak_rrc_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.slak_center_crop_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.slak_host_version.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rrc_normalize(img: np.ndarray, crop, size: int, hflip: bool,
                  mean: np.ndarray, std: np.ndarray) -> Optional[np.ndarray]:
    """img uint8 (H, W, 3); crop = (left, top, w, h). None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty((size, size, 3), np.float32)
    lib.slak_rrc_normalize(
        _up(img), img.shape[0], img.shape[1],
        int(crop[0]), int(crop[1]), int(crop[2]), int(crop[3]),
        _fp(out), size, int(hflip),
        _fp(np.ascontiguousarray(mean, np.float32)),
        _fp(np.ascontiguousarray(std, np.float32)))
    return out


def center_crop_normalize(img: np.ndarray, size: int, scale_size: int,
                          mean: np.ndarray, std: np.ndarray
                          ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty((size, size, 3), np.float32)
    lib.slak_center_crop_normalize(
        _up(img), img.shape[0], img.shape[1], _fp(out), size, scale_size,
        _fp(np.ascontiguousarray(mean, np.float32)),
        _fp(np.ascontiguousarray(std, np.float32)))
    return out
