"""ctypes loader/builder for the native PNG filter helper (native/pngfilter.cpp).

Builds the shared object on first use with g++ (baked into the image); falls
back to None if the toolchain is unavailable — pngcodec.py then uses its pure
numpy/Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pngfilter.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "_pngfilter.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded ctypes library, building it if needed, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not (os.path.exists(_SRC) and _build()):
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.png_unfilter.restype = ctypes.c_int
            lib.png_unfilter.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ]
            lib.png_filter_up.restype = None
            lib.png_filter_up.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_long, ctypes.c_long,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib
