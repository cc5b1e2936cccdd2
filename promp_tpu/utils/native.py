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
  * ckptwriter — async durable checkpoint writer (runtime/ckptwriter.cpp):
    write + fsync + atomic rename + dir fsync on a background thread, so
    snapshot IO (reference logger.py:376-396 writes joblib pickles inline)
    never stalls training and can never leave a torn file.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "liblogsink.so")
_CKPT_LIB_PATH = os.path.join(_RUNTIME_DIR, "libckptwriter.so")

_lib = None
_ckpt_lib = None


def ensure_built(quiet=True, lib_path=_LIB_PATH):
    """Build the native libraries if missing; returns True on success."""
    if os.path.exists(lib_path):
        return True
    if not os.path.exists(os.path.join(_RUNTIME_DIR, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", _RUNTIME_DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(lib_path)
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


def _load_ckpt():
    global _ckpt_lib
    if _ckpt_lib is not None:
        return _ckpt_lib
    if not os.path.exists(_CKPT_LIB_PATH) and not ensure_built(
            lib_path=_CKPT_LIB_PATH):
        return None
    lib = ctypes.CDLL(_CKPT_LIB_PATH)
    lib.ckpt_open.restype = ctypes.c_void_p
    lib.ckpt_open.argtypes = []
    lib.ckpt_submit.restype = ctypes.c_long
    lib.ckpt_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_char_p, ctypes.c_size_t]
    lib.ckpt_wait.restype = ctypes.c_int
    lib.ckpt_wait.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int]
    lib.ckpt_pending.restype = ctypes.c_long
    lib.ckpt_pending.argtypes = [ctypes.c_void_p]
    lib.ckpt_errors.restype = ctypes.c_long
    lib.ckpt_errors.argtypes = [ctypes.c_void_p]
    lib.ckpt_close.argtypes = [ctypes.c_void_p]
    _ckpt_lib = lib
    return lib


class AsyncCheckpointWriter:
    """Durable async snapshot writer backed by the C++ worker thread.

    ``submit(path, blob)`` enqueues already-serialized bytes and returns
    immediately; the worker writes a temp file, fsyncs, renames over
    ``path`` and fsyncs the directory. ``wait(seq)`` blocks until that
    submission is durable. Falls back to synchronous atomic writes when
    the native lib is unavailable, so callers never branch.
    """

    def __init__(self):
        lib = _load_ckpt()
        self._lib = lib
        self._handle = lib.ckpt_open() if lib is not None else None

    @property
    def native(self):
        return self._handle is not None

    def submit(self, path, blob):
        """Enqueue bytes for a durable write to ``path``; returns a seq id
        (or 0 after a completed synchronous fallback write)."""
        if self._handle:
            seq = self._lib.ckpt_submit(self._handle, str(path).encode(),
                                        blob, len(blob))
            if seq > 0:
                return int(seq)
        # synchronous fallback: atomic tmp+rename (no background thread)
        import tempfile
        d = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return 0

    def wait(self, seq, timeout_s=60.0):
        """True once submission ``seq`` is durable on disk."""
        if seq == 0:
            return True
        if not self._handle:
            return True
        return self._lib.ckpt_wait(self._handle, seq,
                                   int(timeout_s * 1000)) == 1

    def pending(self):
        if self._handle:
            return int(self._lib.ckpt_pending(self._handle))
        return 0

    def errors(self):
        if self._handle:
            return int(self._lib.ckpt_errors(self._handle))
        return 0

    def close(self):
        """Drain the queue (completing all submitted writes) and join."""
        if self._handle:
            self._lib.ckpt_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
