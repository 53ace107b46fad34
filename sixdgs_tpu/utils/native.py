"""Loader for the native gsio library (build-on-demand via g++, cached).

Falls back to None when no toolchain is available; all callers have pure
numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
SO_PATH = os.path.join(NATIVE_DIR, "build", "libgsio.so")


def get_gsio() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(SO_PATH):
                src = os.path.join(NATIVE_DIR, "gsio.cpp")
                if not os.path.exists(src):
                    return None
                os.makedirs(os.path.dirname(SO_PATH), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", SO_PATH, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(SO_PATH)
            lib.gsio_count_points3d.restype = ctypes.c_longlong
            lib.gsio_count_points3d.argtypes = [ctypes.c_char_p]
            lib.gsio_read_points3d.restype = ctypes.c_longlong
            lib.gsio_read_points3d.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_longlong,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
