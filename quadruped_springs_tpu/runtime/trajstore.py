"""ctypes bindings for the native trajectory store (runtime/trajstore.cpp).

Builds the shared library on first use (g++, no external deps). Falls back
to a pure-NumPy implementation if no C++ toolchain is available so the
package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libtrajstore.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                               capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ts_writer_open.restype = ctypes.c_void_p
        lib.ts_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.ts_writer_append_batch.restype = ctypes.c_int
        lib.ts_writer_append_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64]
        lib.ts_writer_close.restype = ctypes.c_int
        lib.ts_writer_close.argtypes = [ctypes.c_void_p]
        lib.ts_reader_open.restype = ctypes.c_void_p
        lib.ts_reader_open.argtypes = [ctypes.c_char_p]
        lib.ts_reader_rows.restype = ctypes.c_uint64
        lib.ts_reader_rows.argtypes = [ctypes.c_void_p]
        lib.ts_reader_cols.restype = ctypes.c_uint32
        lib.ts_reader_cols.argtypes = [ctypes.c_void_p]
        lib.ts_reader_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.ts_reader_data.argtypes = [ctypes.c_void_p]
        lib.ts_reader_verify.restype = ctypes.c_int
        lib.ts_reader_verify.argtypes = [ctypes.c_void_p]
        lib.ts_reader_close.restype = ctypes.c_int
        lib.ts_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def have_native() -> bool:
    return _load() is not None


def write(path: str, rows: np.ndarray) -> None:
    """Write a (T, C) float32 trajectory; native fast path, npy fallback."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    if rows.ndim != 2:
        raise ValueError("rows must be (T, C)")
    lib = _load()
    if lib is None:
        np.save(path + ".npy", rows)
        return
    h = lib.ts_writer_open(path.encode(), rows.shape[1])
    if not h:
        raise IOError(f"cannot open {path} for writing")
    rc = lib.ts_writer_append_batch(
        h, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows.shape[0])
    rc |= lib.ts_writer_close(h)
    if rc != 0:
        raise IOError(f"write to {path} failed")


def read(path: str, verify: bool = True) -> np.ndarray:
    """Read a trajectory back; zero-copy mmap view copied on return."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return np.load(path + ".npy")
    h = lib.ts_reader_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        if verify and lib.ts_reader_verify(h) != 1:
            raise IOError(f"CRC mismatch in {path}")
        rows = lib.ts_reader_rows(h)
        cols = lib.ts_reader_cols(h)
        buf = np.ctypeslib.as_array(lib.ts_reader_data(h),
                                    shape=(rows, cols))
        return buf.copy()
    finally:
        lib.ts_reader_close(h)
