"""ctypes binding to the native C++ batch wav loader (native/evc_io.cpp).

Replaces the reference's multiprocessing.Pool + librosa.load data path
(``utils.py:174-215``) with an in-process thread pool: no worker-process
spawn, no pickle transport, decode straight into numpy buffers. Builds the
shared library on first use if a toolchain is present; callers gracefully
fall back to the pure-numpy reader when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libevc_io.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.evc_load_batch.restype = ctypes.c_void_p
        lib.evc_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ]
        lib.evc_batch_length.restype = ctypes.c_long
        lib.evc_batch_length.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.evc_batch_sr.restype = ctypes.c_int
        lib.evc_batch_sr.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.evc_batch_error_msg.restype = ctypes.c_char_p
        lib.evc_batch_error_msg.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.evc_batch_copy.restype = None
        lib.evc_batch_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.evc_batch_free.restype = None
        lib.evc_batch_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_wavs(paths: list[str], n_threads: int = 0) -> tuple[list[np.ndarray], int]:
    """Decode a batch of wav files in parallel → (signals, sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    handle = lib.evc_load_batch(arr, len(paths), n_threads)
    if not handle:
        raise MemoryError("evc_load_batch failed")
    try:
        sigs: list[np.ndarray] = []
        sr = None
        for i, p in enumerate(paths):
            err = lib.evc_batch_error_msg(handle, i)
            if err:
                raise ValueError(f"{p}: {err.decode()}")
            n = lib.evc_batch_length(handle, i)
            this_sr = lib.evc_batch_sr(handle, i)
            if sr is not None and this_sr != sr:
                raise ValueError(f"inconsistent sample rates: {this_sr} vs {sr}")
            sr = this_sr
            buf = np.empty(n, dtype=np.float64)
            lib.evc_batch_copy(
                handle, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            )
            sigs.append(buf)
        return sigs, int(sr)
    finally:
        lib.evc_batch_free(handle)
