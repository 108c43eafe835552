"""ctypes bindings for the native (C++) volume loader.

Builds libvolume_loader.so on first use (g++ + libpng are part of the
image); falls back cleanly to the PIL path in data/ingest.py when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvolume_loader.so")
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO)
                < os.path.getmtime(os.path.join(_DIR, "volume_loader.cpp"))):
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.octcubem_png_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.octcubem_png_dims.restype = ctypes.c_int
        lib.octcubem_load_png_stack.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.octcubem_load_png_stack.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_png_stack_native(paths: list[str], downsample_width: bool = True,
                          n_threads: int = 8) -> np.ndarray | None:
    # default 8 threads: this container under-reports cores (nproc=1) but
    # measured decode throughput scales ~6.5x up to 8 threads
    """[T, H, W] float32 in [0, 1], or None if the native path is
    unavailable (caller falls back to PIL)."""
    lib = _get_lib()
    if lib is None or not paths:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.octcubem_png_dims(paths[0].encode(), int(downsample_width),
                             ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((len(paths), h.value, w.value), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.octcubem_load_png_stack(
        arr, len(paths), h.value, w.value, int(downsample_width), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out
