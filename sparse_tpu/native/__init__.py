"""Native (C++) host-runtime kernels, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; all
entry points degrade gracefully to NumPy when the toolchain or binary is
unavailable, so the package works (slower) anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "canonical.cpp")
_LIB_PATH = os.path.join(_HERE, "_canonical.so")

_lock = threading.Lock()
_lib = None
_tried = False

# numpy argsort beats thread spin-up below this size
NATIVE_MIN_SIZE = int(os.environ.get("SPARSE_TPU_NATIVE_MIN_SIZE", 1 << 16))


def _build():
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        _LIB_PATH,
        _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            _deps = (_SRC, os.path.join(_HERE, "pool.h"))
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < max(
                os.path.getmtime(d) for d in _deps if os.path.exists(d)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.st_argsort_i64.restype = ctypes.c_int
            lib.st_argsort_i64.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.st_build_indptr.restype = ctypes.c_int
            lib.st_build_indptr.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.st_dedup_sum_sorted_f64.restype = ctypes.c_int64
            lib.st_dedup_sum_sorted_f64.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def argsort_i64(keys, max_key=None):
    """Stable argsort of non-negative int64 keys.

    Fast path: when ``max_key * (n+1) < 2^63`` the key and original index
    are packed into a single int64 and sorted with numpy's vectorized
    ``np.sort`` — ~10x faster than ``np.argsort`` on this hardware. Falls
    back to the native parallel radix sort, then to numpy argsort.
    """
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    if n < NATIVE_MIN_SIZE:
        return np.argsort(keys, kind="stable")
    if max_key is None:
        max_key = int(keys.max(initial=0))
    idx_bits = max(int(n - 1).bit_length(), 1)
    if max_key.bit_length() + idx_bits <= 63:
        packed = (keys << np.int64(idx_bits)) | np.arange(n, dtype=np.int64)
        packed.sort()
        return packed & np.int64((1 << idx_bits) - 1)
    lib = get_lib()
    if lib is None:
        return np.argsort(keys, kind="stable")
    perm = np.empty(n, dtype=np.int64)
    rc = lib.st_argsort_i64(_ptr(keys), n, _ptr(perm))
    if rc != 0:  # pragma: no cover - defensive
        return np.argsort(keys, kind="stable")
    return perm


def sort_with_perm(keys, max_key=None):
    """(perm, sorted_keys_or_None): like :func:`argsort_i64` but also returns
    the sorted keys for free when the packed path is taken (saves the caller
    a gather)."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    if n >= NATIVE_MIN_SIZE:
        if max_key is None:
            max_key = int(keys.max(initial=0))
        idx_bits = max(int(n - 1).bit_length(), 1)
        if int(max_key).bit_length() + idx_bits <= 63:
            packed = (keys << np.int64(idx_bits)) | np.arange(n, dtype=np.int64)
            packed.sort()
            return packed & np.int64((1 << idx_bits) - 1), packed >> np.int64(idx_bits)
    return argsort_i64(keys, max_key=max_key), None


def dedup_sum_sorted(sorted_keys, vals):
    """Sum values over runs of equal (sorted) keys.

    Returns (unique_positions, summed_values). Native single pass when
    available; numpy diff+reduceat otherwise. Values must be float64 for the
    native path (other dtypes take the numpy path)."""
    sorted_keys = np.ascontiguousarray(sorted_keys, dtype=np.int64)
    n = sorted_keys.shape[0]
    lib = get_lib() if n >= NATIVE_MIN_SIZE and vals.dtype == np.float64 else None
    if lib is None or not vals.flags.c_contiguous:
        if n == 0:
            return np.empty(0, dtype=np.int64), vals[:0]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(sorted_keys) != 0]))
        # dtype=vals.dtype: add.reduceat accumulates sub-intp integers at
        # intp by default, silently upcasting i8/i16/i32 results
        return starts, np.add.reduceat(vals, starts, dtype=vals.dtype)
    vals_out = np.empty(n, dtype=np.float64)
    unique_pos = np.empty(n, dtype=np.int64)
    u = lib.st_dedup_sum_sorted_f64(
        _ptr(sorted_keys),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        vals_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _ptr(unique_pos),
    )
    return unique_pos[:u].copy(), vals_out[:u].copy()


def build_indptr(sorted_rows, n_rows):
    """indptr from sorted row ids (native bincount+cumsum or numpy)."""
    sorted_rows = np.ascontiguousarray(sorted_rows, dtype=np.int64)
    lib = get_lib() if sorted_rows.shape[0] >= NATIVE_MIN_SIZE else None
    if lib is None:
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount(sorted_rows, minlength=n_rows), out=indptr[1:])
        return indptr
    indptr = np.empty(n_rows + 1, dtype=np.int64)
    lib.st_build_indptr(_ptr(sorted_rows), sorted_rows.shape[0], n_rows, _ptr(indptr))
    return indptr
