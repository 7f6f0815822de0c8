"""ctypes bindings for the native C++ runtime components.

Builds libslamdata.so from dataloader.cpp on first use (g++ -O3, cached next
to the source); every entry point degrades gracefully to the pure-Python
implementations in dataio/ when the toolchain or zlib is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataloader.cpp")
_SO = os.path.join(_DIR, "libslamdata.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # Portable baseline flags (no -march=native): a tuned .so can outlive
    # the machine it was built on (copied caches/images) and SIGILL at call
    # time; the decoder is IO/zlib-bound, so target-generic -O3 costs ~0.
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.sd_create.restype = ctypes.c_void_p
        lib.sd_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.sd_get.restype = ctypes.c_int
        lib.sd_get.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
        lib.sd_destroy.argtypes = [ctypes.c_void_p]
        lib.sd_decode.restype = ctypes.c_int
        lib.sd_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


MAX_PIXELS = 4096 * 4096


def decode_gray(path: str, raw16: bool = False) -> Optional[np.ndarray]:
    """One-shot native decode; None if native unavailable or decode failed."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(MAX_PIXELS, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.sd_decode(path.encode(), int(raw16),
                       buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       MAX_PIXELS, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Threaded native prefetcher over an ordered path list. Frames come
    back in order via fetch(i); decoding runs ahead on C++ threads."""

    def __init__(self, paths: list[str], depth: int = 8, raw16: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._handle = lib.sd_create(arr, len(paths), depth, int(raw16))
        self.n = len(paths)

    def fetch(self, idx: int) -> Optional[np.ndarray]:
        buf = np.empty(MAX_PIXELS, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.sd_get(
            self._handle, idx,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            MAX_PIXELS, ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            return None
        return buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.sd_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
