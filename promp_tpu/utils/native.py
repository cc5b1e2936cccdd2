"""ctypes bindings for the C++ runtime components (runtime/).

The native pieces are optional accelerations: everything degrades to pure
Python when the shared library hasn't been built. Build with
``make -C runtime`` (g++, no external deps); ``ensure_built`` does this
on demand.

Currently bound:
  * logsink — async background file writer (runtime/logsink.cpp), used by
    the KV logger so CSV/JSONL writes never block the device-feeding loop
    (the reference logger writes synchronously on the training thread,
    meta_policy_search/utils/logger.py:109-140).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "liblogsink.so")

_lib = None


def ensure_built(quiet=True):
    """Build the native library if missing; returns True on success."""
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.exists(os.path.join(_RUNTIME_DIR, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", _RUNTIME_DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.logsink_open.restype = ctypes.c_void_p
    lib.logsink_open.argtypes = [ctypes.c_char_p]
    lib.logsink_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_size_t]
    lib.logsink_flush.argtypes = [ctypes.c_void_p]
    lib.logsink_close.argtypes = [ctypes.c_void_p]
    lib.logsink_queued.restype = ctypes.c_size_t
    lib.logsink_queued.argtypes = [ctypes.c_void_p]
    lib.logsink_dropped.restype = ctypes.c_size_t
    lib.logsink_dropped.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class AsyncFileSink:
    """File-like append-only sink backed by the C++ writer thread.

    Falls back to buffered Python IO when the native lib is unavailable,
    so callers never need to branch.
    """

    def __init__(self, path):
        self.path = path
        lib = _load()
        self._lib = lib
        self._handle = None
        self._fallback = None
        if lib is not None:
            self._handle = lib.logsink_open(path.encode())
        if not self._handle:
            self._fallback = open(path, "at")

    @property
    def native(self):
        return self._handle is not None

    def write(self, text):
        if self._handle:
            data = text.encode()
            self._lib.logsink_write(self._handle, data, len(data))
        else:
            self._fallback.write(text)

    def flush(self):
        if self._handle:
            self._lib.logsink_flush(self._handle)
        else:
            self._fallback.flush()

    def dropped_rows(self):
        if self._handle:
            return int(self._lib.logsink_dropped(self._handle))
        return 0

    def close(self):
        if self._handle:
            self._lib.logsink_close(self._handle)
            self._handle = None
        elif self._fallback:
            self._fallback.close()
            self._fallback = None
