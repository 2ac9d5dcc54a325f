"""ctypes bindings for the native C++ data-loader core.

Builds `tripled_tpu/data/native/loader.cpp` on demand (g++, links libpng /
libjpeg) and exposes `load_image` / `load_batch`: file → decoded + Lanczos
resized float32 HWC in one native call. `available()` gates usage so every
caller falls back to the PIL path when the toolchain or libraries are
missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native", "loader.cpp")
_SO = os.path.join(_DIR, "native", "libtripled_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.tripled_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tripled_load_image.restype = ctypes.c_int
        lib.tripled_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.tripled_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_image(path: str, height: int, width: int, flip: bool = False) -> np.ndarray:
    """Decode + Lanczos-resize one image natively → float32 (H, W, 3) [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((height, width, 3), np.float32)
    rc = lib.tripled_load_image(
        path.encode(), height, width, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native load failed ({rc}): {path}")
    return out


def load_batch(
    paths: list[str], height: int, width: int,
    flips: list[bool] | None = None, num_threads: int | None = None,
) -> np.ndarray:
    """Threaded batched decode+resize → float32 (N, H, W, 3)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    flips = flips or [False] * n
    if num_threads is None:
        num_threads = min(max(os.cpu_count() or 1, 1), n)
    out = np.empty((n, height, width, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fl = (ctypes.c_int * n)(*[int(f) for f in flips])
    fails = lib.tripled_load_batch(
        arr, n, height, width, fl,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if fails:
        raise IOError(f"native batch load: {fails}/{n} images failed")
    return out
