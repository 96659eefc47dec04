"""ctypes bindings for the native eager-path kernels (eager.cpp).

Role parity with the reference's Numba layer: the two-pointer elemwise join
(`_umath.py:53 _match_arrays`) and the Gustavson SpGEMM kernels
(`_common.py:543-717`). Everything degrades to the numpy formulations when
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "eager.cpp")
_LIB_PATH = os.path.join(_HERE, "_eager.so")

_lock = threading.Lock()
_lib = None
_tried = False

# below this combined nnz the numpy paths win on call overhead
NATIVE_MIN_NNZ = int(os.environ.get("SPARSE_TPU_EAGER_MIN_NNZ", 4096))

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)
_f32p = ctypes.POINTER(ctypes.c_float)


def _build():
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(base[:1] + ["-march=native"] + base[1:], check=True, capture_output=True, timeout=120)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True, timeout=120)


def get_lib():
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
            lib.st_union_join_i64.restype = ctypes.c_int64
            lib.st_union_join_i64.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p, _i64p, _i64p]
            for name, vp, ct in [
                ("st_union_join_vals_f64", _f64p, ctypes.c_double),
                ("st_union_join_vals_f32", _f32p, ctypes.c_float),
            ]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [_i64p, vp, ctypes.c_int64, ct, _i64p, vp, ctypes.c_int64, ct, _i64p, vp, vp]
            for name, vp in [
                ("st_add_join_f64", _f64p),
                ("st_sub_join_f64", _f64p),
                ("st_mul_join_f64", _f64p),
                ("st_add_join_f32", _f32p),
                ("st_sub_join_f32", _f32p),
                ("st_mul_join_f32", _f32p),
            ]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [_i64p, vp, ctypes.c_int64, _i64p, vp, ctypes.c_int64, _i64p, vp]
            lib.st_unravel_i64.restype = ctypes.c_int
            lib.st_unravel_i64.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p]
            for ts in ("f64", "f32"):
                vp = _f64p if ts == "f64" else _f32p
                for isuf in ("i64", "i32"):
                    fn = getattr(lib, f"st_canonicalize2d_{ts}_{isuf}")
                    fn.restype = ctypes.c_int64
                    fn.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, vp, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_void_p, ctypes.c_void_p, vp,
                    ]
            for op in ("add", "sub", "mul"):
                for ts, vp in (("f64", _f64p), ("f32", _f32p), ("s64", _i64p)):
                    for isuf in ("i32", "i64"):
                        fn = getattr(lib, f"st_{op}_join2d_{ts}_{isuf}")
                        fn.restype = ctypes.c_int64
                        fn.argtypes = [
                            ctypes.c_void_p, ctypes.c_void_p, vp, ctypes.c_int64,
                            ctypes.c_void_p, ctypes.c_void_p, vp, ctypes.c_int64,
                            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, vp,
                        ]
            for name, vp in [("st_bincount_sum_f64", _f64p), ("st_bincount_sum_f32", _f32p)]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [_i64p, vp, ctypes.c_int64, ctypes.c_int64, vp, _i64p]
            for name, vp in [("st_row_reduce_sorted_f64", _f64p), ("st_row_reduce_sorted_f32", _f32p)]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [_i64p, vp, ctypes.c_int64, _i64p, vp, _i64p]
            lib.st_spgemm_symbolic.restype = ctypes.c_int
            lib.st_spgemm_symbolic.argtypes = [
                _i64p, _i64p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, _i64p,
            ]
            for name, vp in [("st_spgemm_numeric_f64", _f64p), ("st_spgemm_numeric_f32", _f32p)]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    _i64p, _i64p, vp, ctypes.c_int64, _i64p, _i64p, vp, ctypes.c_int64, _i64p, _i64p, vp,
                ]
            lib.st_spgemm_ubcount.restype = ctypes.c_int
            lib.st_spgemm_ubcount.argtypes = [_i64p, _i64p, ctypes.c_int64, _i64p, _i64p]
            lib.st_uncompress_indptr.restype = ctypes.c_int
            lib.st_uncompress_indptr.argtypes = [_i64p, ctypes.c_int64, _i64p]
            for name, vp in [("st_spgemm_onephase_f64", _f64p), ("st_spgemm_onephase_f32", _f32p)]:
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    _i64p, _i64p, vp, ctypes.c_int64, _i64p, _i64p, vp, ctypes.c_int64,
                    _i64p, _i64p, _i64p, vp,
                ]
            vpp = ctypes.c_void_p
            for ts in ("f64", "f32"):
                vp = _f64p if ts == "f64" else _f32p
                for isuf in ("i64", "i32"):
                    fn = getattr(lib, f"st_csr_spmv_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [vpp, vpp, vp, ctypes.c_int64, vp, vp]
                    fn = getattr(lib, f"st_csr_spmm_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [vpp, vpp, vp, ctypes.c_int64, vp, ctypes.c_int64, vp]
                    fn = getattr(lib, f"st_csc_spmv_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [vpp, vpp, vp, ctypes.c_int64, ctypes.c_int64, vp, vp]
                    fn = getattr(lib, f"st_csc_spmm_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [vpp, vpp, vp, ctypes.c_int64, ctypes.c_int64, vp, ctypes.c_int64, vp]
                    fn = getattr(lib, f"st_transpose2d_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [
                        vpp, vpp, vp, ctypes.c_int64, ctypes.c_int64, _i64p, vpp, vpp, vp,
                    ]
                    fn = getattr(lib, f"st_dense_spmm_csrt_{ts}_{isuf}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [
                        _i64p, vpp, vp, ctypes.c_int64, vp, ctypes.c_int64, ctypes.c_int64, vp,
                    ]
            for isuf in ("i64", "i32"):
                fn = getattr(lib, f"st_transpose2d_bytes_{isuf}")
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    vpp, vpp, vpp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i64p, vpp, vpp, vpp,
                ]
            _i8p = ctypes.POINTER(ctypes.c_int8)
            _terms = [ctypes.c_int, _i8p, _i64p, _i64p, _i64p]
            for isuf in ("i64", "i32"):
                fn = getattr(lib, f"st_relinearize_{isuf}")
                fn.restype = ctypes.c_int
                fn.argtypes = [_i64p, ctypes.c_int64] + _terms * 3 + [_i64p, _i64p, vpp]
            lib.st_csr_row_splice_bytes.restype = ctypes.c_int64
            lib.st_csr_row_splice_bytes.argtypes = [
                _i64p, vpp, ctypes.c_int64, vpp, ctypes.c_int64, _i64p, ctypes.c_int64,
                _i64p, vpp, vpp,
            ]
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def _ip(a):
    return a.ctypes.data_as(_i64p)


def _vp(a):
    if a.dtype == np.float64:
        return a.ctypes.data_as(_f64p)
    if a.dtype == np.int64:
        return a.ctypes.data_as(_i64p)
    return a.ctypes.data_as(_f32p)


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def union_join(ka, kb):
    """Union of two sorted unique int64 key arrays.

    Returns ``(keys, ia, ib)`` where ``ia``/``ib`` hold the source position of
    each union key in the respective input or -1 — or None when the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    ka = _c64(ka)
    kb = _c64(kb)
    na, nb = ka.shape[0], kb.shape[0]
    k_out = np.empty(na + nb, dtype=np.int64)
    ia = np.empty(na + nb, dtype=np.int64)
    ib = np.empty(na + nb, dtype=np.int64)
    u = lib.st_union_join_i64(_ip(ka), na, _ip(kb), nb, _ip(k_out), _ip(ia), _ip(ib))
    return k_out[:u], ia[:u], ib[:u]


def union_join_values(ka, va, fa, kb, vb, fb):
    """Union of two sorted unique key streams with both value streams
    materialized at the union (stored value or the operand's fill), one pass.

    Returns ``(keys, va_out, vb_out)`` or None when unavailable or the value
    dtypes differ / aren't f32/f64."""
    lib = get_lib()
    if lib is None or va.dtype != vb.dtype or va.dtype not in (np.float64, np.float32):
        return None
    ka = _c64(ka)
    kb = _c64(kb)
    va = np.ascontiguousarray(va)
    vb = np.ascontiguousarray(vb)
    na, nb = ka.shape[0], kb.shape[0]
    k_out = np.empty(na + nb, dtype=np.int64)
    va_out = np.empty(na + nb, dtype=va.dtype)
    vb_out = np.empty(na + nb, dtype=va.dtype)
    fn = lib.st_union_join_vals_f64 if va.dtype == np.float64 else lib.st_union_join_vals_f32
    u = fn(_ip(ka), _vp(va), na, va.dtype.type(fa), _ip(kb), _vp(vb), nb, va.dtype.type(fb), _ip(k_out), _vp(va_out), _vp(vb_out))
    return k_out[:u], va_out[:u], vb_out[:u]


_FUSED = {"add": "st_add_join", "subtract": "st_sub_join", "multiply": "st_mul_join"}
_FUSED2D = {"add": "st_add_join2d", "subtract": "st_sub_join2d", "multiply": "st_mul_join2d"}


def fused_join_2d(op_name, ra, ca, va, rb, cb, vb, k_cols):
    """2-D fused {add,subtract,multiply} for zero fills: merges canonical
    (row, col) coordinate streams directly, emitting output coordinates in
    the same pass — no linearize/unravel. Returns ``(rows, cols, values)``
    or None."""
    lib = get_lib()
    if lib is None or op_name not in _FUSED2D:
        return None
    if va.dtype != vb.dtype or va.dtype not in (np.float64, np.float32, np.int64):
        return None
    ra = np.ascontiguousarray(ra)
    ca = np.ascontiguousarray(ca)
    rb = np.ascontiguousarray(rb)
    cb = np.ascontiguousarray(cb)
    if not (ra.dtype == ca.dtype == rb.dtype == cb.dtype) or ra.dtype not in (np.int32, np.int64):
        return None
    va = np.ascontiguousarray(va)
    vb = np.ascontiguousarray(vb)
    isuf = "i32" if ra.dtype == np.int32 else "i64"
    tsuf = "s64" if va.dtype == np.int64 else _suffix(va.dtype)
    fn = getattr(lib, f"{_FUSED2D[op_name]}_{tsuf}_{isuf}")
    na, nb = ra.shape[0], rb.shape[0]
    r_out = np.empty(na + nb, dtype=ra.dtype)
    c_out = np.empty(na + nb, dtype=ra.dtype)
    v_out = np.empty(na + nb, dtype=va.dtype)
    u = fn(_ivp(ra), _ivp(ca), _vp(va), na, _ivp(rb), _ivp(cb), _vp(vb), nb, k_cols, _ivp(r_out), _ivp(c_out), _vp(v_out))
    return r_out[:u], c_out[:u], v_out[:u]


def fused_join(op_name, ka, va, kb, vb):
    """Fused sorted-union {add,subtract,multiply} for zero fill values.

    Evaluates the op at every union coordinate with exact IEEE semantics and
    prunes results bitwise-equal to +0.0 (the package's `equivalent` rule).
    Returns ``(keys, values)`` or None when not applicable/available.
    """
    lib = get_lib()
    if lib is None or op_name not in _FUSED:
        return None
    if va.dtype != vb.dtype or va.dtype not in (np.float64, np.float32):
        return None
    if not (va.flags.c_contiguous and vb.flags.c_contiguous):
        va = np.ascontiguousarray(va)
        vb = np.ascontiguousarray(vb)
    ka = _c64(ka)
    kb = _c64(kb)
    suffix = "_f64" if va.dtype == np.float64 else "_f32"
    fn = getattr(lib, _FUSED[op_name] + suffix)
    na, nb = ka.shape[0], kb.shape[0]
    k_out = np.empty(na + nb, dtype=np.int64)
    v_out = np.empty(na + nb, dtype=va.dtype)
    u = fn(_ip(ka), _vp(va), na, _ip(kb), _vp(vb), nb, _ip(k_out), _vp(v_out))
    return k_out[:u].copy(), v_out[:u].copy()


def canonicalize2d(rows, cols, vals, n_rows):
    """Sort a 2-D COO triplet row-major and sum duplicates (counting-sort by
    row + threaded per-row stable sort — the scipy coo→csr strategy).

    Returns ``(rows, cols, vals)`` canonical int64 triplets, or None when the
    native library is unavailable or vals isn't f32/f64."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    rows = np.ascontiguousarray(rows)
    cols = np.ascontiguousarray(cols)
    if rows.dtype == cols.dtype and rows.dtype == np.int32:
        isuf = "i32"
    else:
        rows = rows.astype(np.int64, copy=False)
        cols = cols.astype(np.int64, copy=False)
        isuf = "i64"
    vals = np.ascontiguousarray(vals)
    n = rows.shape[0]
    rows_out = np.empty(n, dtype=rows.dtype)
    cols_out = np.empty(n, dtype=rows.dtype)
    vals_out = np.empty(n, dtype=vals.dtype)
    fn = getattr(lib, f"st_canonicalize2d_{_suffix(vals.dtype)}_{isuf}")
    u = fn(_ivp(rows), _ivp(cols), _vp(vals), n, n_rows, _ivp(rows_out), _ivp(cols_out), _vp(vals_out))
    return rows_out[:u], cols_out[:u], vals_out[:u]


def bincount_sum(keys, weights, n_bins):
    """Fused ``(bincount(keys, weights), bincount(keys))`` in one pass.
    Returns ``(sums, counts)`` (sums in the weights' dtype) or None."""
    lib = get_lib()
    if lib is None or weights.dtype not in (np.float64, np.float32):
        return None
    keys = _c64(keys)
    weights = np.ascontiguousarray(weights)
    sums = np.empty(n_bins, dtype=weights.dtype)
    counts = np.empty(n_bins, dtype=np.int64)
    fn = lib.st_bincount_sum_f64 if weights.dtype == np.float64 else lib.st_bincount_sum_f32
    fn(_ip(keys), _vp(weights), keys.shape[0], n_bins, _vp(sums), _ip(counts))
    return sums, counts


def bincount_sum_compact(keys, weights, n_bins):
    """Sums-only weighted bincount fused with nonzero compaction: returns
    ``(idx, vals)`` for the bins whose sum is nonzero (exactly the pruned
    add-reduce result for zero fill), or None without the native lib."""
    lib = get_lib()
    if lib is None or weights.dtype not in (np.float64, np.float32):
        return None
    if keys.dtype == np.int32 and keys.flags.c_contiguous:
        isuf = "_i32"
        kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        isuf = ""
        keys = _c64(keys)
        kp = _ip(keys)
    weights = np.ascontiguousarray(weights)
    sums = np.empty(n_bins, dtype=weights.dtype)
    out_idx = np.empty(n_bins, dtype=np.int64)
    out_vals = np.empty(n_bins, dtype=weights.dtype)
    suf = "f64" if weights.dtype == np.float64 else "f32"
    fn = getattr(lib, f"st_bincount_sum_compact_{suf}{isuf}")
    fn.restype = ctypes.c_int64
    m = fn(kp, _vp(weights), keys.shape[0], n_bins, _vp(sums), _ip(out_idx), _vp(out_vals))
    return out_idx[:m], out_vals[:m]


def sorted_reduce_compact(keys, weights, max_runs=None):
    """Compact add-reduce over SORTED keys: returns ``(idx, vals)`` for
    runs with nonzero sum (same prune rule as :func:`bincount_sum_compact`)
    — one pass with per-run 4-way unrolled accumulation, ~3x the bincount
    form on sorted keys (which is FP-add-latency-bound there).
    ``max_runs``: caller-known bound on distinct keys (sizes the output
    buffers; a few-MB np.empty per call is measurable).  Returns None
    without the native lib / unsupported dtype."""
    lib = get_lib()
    if lib is None or weights.dtype not in (np.float64, np.float32):
        return None
    if keys.dtype == np.int32 and keys.flags.c_contiguous:
        isuf = "_i32"
        kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        isuf = ""
        keys = _c64(keys)
        kp = _ip(keys)
    weights = np.ascontiguousarray(weights)
    n = keys.shape[0]
    cap = n if max_runs is None else min(n, int(max_runs))
    out_idx = np.empty(cap, dtype=np.int64)
    out_vals = np.empty(cap, dtype=weights.dtype)
    suf = "f64" if weights.dtype == np.float64 else "f32"
    fn = getattr(lib, f"st_sorted_reduce_compact_{suf}{isuf}")
    fn.restype = ctypes.c_int64
    m = fn(kp, _vp(weights), n, _ip(out_idx), _vp(out_vals))
    return out_idx[:m], out_vals[:m]


def unravel(keys, shape):
    """Row-major unravel of int64 keys into an (ndim, n) int64 coordinate
    matrix (threaded). Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = _c64(keys)
    shape_arr = np.asarray(shape, dtype=np.int64)
    n = keys.shape[0]
    ndim = shape_arr.shape[0]
    coords = np.empty((ndim, n), dtype=np.int64)
    lib.st_unravel_i64(_ip(keys), n, _ip(shape_arr), ndim, _ip(coords))
    return coords


def _suffix(dtype):
    return "f64" if dtype == np.float64 else "f32"


def _index_pair(indptr, idx, owner=None):
    """(indptr, idx, isuffix) with ONE common index dtype, converting only
    the (small) indptr when the (large) index array is int32.  ``owner``:
    an immutable-buffer holder (GCXS) to memoize the prepared pair on —
    repeated matvecs on the same matrix skip the contiguity/dtype passes
    (the fixed ~30 us matters at spmv_add's 10k-nnz scale)."""
    if owner is not None:
        memo = getattr(owner, "_idxpair_memo", None)
        if memo is not None and memo[0] is indptr and memo[1] is idx:
            return memo[2], memo[3], memo[4]
    indptr_c = np.ascontiguousarray(indptr)
    idx_c = np.ascontiguousarray(idx)
    if idx_c.dtype == np.int32 and indptr_c[-1] <= np.iinfo(np.int32).max:
        res = indptr_c.astype(np.int32, copy=False), idx_c, "i32"
    else:
        res = indptr_c.astype(np.int64, copy=False), idx_c.astype(np.int64, copy=False), "i64"
    if owner is not None:
        try:
            owner._idxpair_memo = (indptr, idx) + res
        except AttributeError:
            pass
    return res


def _ivp(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def csr_spmm_dense(indptr, cols, vals, b, n_rows, owner=None):
    """CSR × dense → dense (threaded rows). ``b`` is ``(K,)`` or ``(K, N)``
    matching vals' dtype (f32/f64). Returns the dense result or None."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    pa, ja, isuf = _index_pair(indptr, cols, owner=owner)
    va = np.ascontiguousarray(vals)
    b = np.ascontiguousarray(b, dtype=va.dtype)
    if b.ndim == 2 and b.shape[1] == 1:
        return csr_spmm_dense(pa, ja, va, b[:, 0], n_rows, owner=owner)[:, None]
    if b.ndim == 1:
        out = np.empty(n_rows, dtype=va.dtype)
        getattr(lib, f"st_csr_spmv_{_suffix(va.dtype)}_{isuf}")(_ivp(pa), _ivp(ja), _vp(va), n_rows, _vp(b), _vp(out))
        return out
    n = b.shape[1]
    out = np.empty((n_rows, n), dtype=va.dtype)
    getattr(lib, f"st_csr_spmm_{_suffix(va.dtype)}_{isuf}")(_ivp(pa), _ivp(ja), _vp(va), n_rows, _vp(b), n, _vp(out))
    return out


def csc_spmm_dense(indptr, rows, vals, b, n_rows, n_cols, owner=None):
    """CSC × dense → dense (single scatter pass). ``indptr`` over columns,
    ``rows`` the row ids. Returns the dense result or None."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    pc, ia, isuf = _index_pair(indptr, rows, owner=owner)
    va = np.ascontiguousarray(vals)
    b = np.ascontiguousarray(b, dtype=va.dtype)
    if b.ndim == 2 and b.shape[1] == 1:
        return csc_spmm_dense(pc, ia, va, b[:, 0], n_rows, n_cols, owner=owner)[:, None]
    if b.ndim == 1:
        # np.zeros = calloc: untouched output pages stay on the shared zero
        # page; the acc kernel scatters without an in-kernel memset
        out = np.zeros(n_rows, dtype=va.dtype)
        getattr(lib, f"st_csc_spmv_acc_{_suffix(va.dtype)}_{isuf}")(_ivp(pc), _ivp(ia), _vp(va), n_cols, _vp(b), _vp(out))
        return out
    n = b.shape[1]
    out = np.empty((n_rows, n), dtype=va.dtype)
    getattr(lib, f"st_csc_spmm_{_suffix(va.dtype)}_{isuf}")(
        _ivp(pc), _ivp(ia), _vp(va), n_cols, n_rows, _vp(b), n, _vp(out)
    )
    return out


def coo_spmv_entries(rows, cols, vals, x, n_rows, y=None):
    """Entry-loop matvec for the sparse-row regime (nnz << n_rows): loops
    over the stored entries only, where CSR/CSC kernels pay a per-row/
    per-column fixed cost over the whole dimension (measured 0.24-0.30 ms
    vs ~0.07 at the spmv_add example's 10k nnz / 100k rows).  ``rows`` and
    ``cols`` must share an index dtype (callers memoize matched buffers).
    ``y``: optional fused additive seed (``A@x+y``).  Returns the dense
    result or None."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    if rows.dtype != cols.dtype or rows.dtype not in (np.int32, np.int64):
        return None
    isuf = "i32" if rows.dtype == np.int32 else "i64"
    va = np.ascontiguousarray(vals)
    x = np.ascontiguousarray(x, dtype=va.dtype)
    if y is not None:
        y = np.ascontiguousarray(y, dtype=va.dtype)
        out = np.empty(n_rows, dtype=va.dtype)
        getattr(lib, f"st_coo_spmv_add_{_suffix(va.dtype)}_{isuf}")(
            _ivp(rows), _ivp(cols), _vp(va), va.shape[0], n_rows, _vp(x), _vp(y), _vp(out)
        )
        return out
    out = np.zeros(n_rows, dtype=va.dtype)
    getattr(lib, f"st_coo_spmv_acc_{_suffix(va.dtype)}_{isuf}")(
        _ivp(rows), _ivp(cols), _vp(va), va.shape[0], _vp(x), _vp(out)
    )
    return out


def spmv_add(indptr, idx, vals, x, y, n_rows, n_cols, compressed_rows, owner=None):
    """Fused ``A @ x + y`` matvec (CSR when ``compressed_rows`` else CSC):
    the output is seeded with ``y`` instead of zeros, saving the separate
    full-length add pass of the unfused expression (the reference's
    headline ``spmv_add`` example shape is output-bandwidth-bound at 10k
    nnz).  Returns the dense result or None when unavailable."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    pa, ja, isuf = _index_pair(indptr, idx, owner=owner)
    va = np.ascontiguousarray(vals)
    x = np.ascontiguousarray(x, dtype=va.dtype)
    y = np.ascontiguousarray(y, dtype=va.dtype)
    if x.ndim != 1 or y.shape != (n_rows,):
        return None
    out = np.empty(n_rows, dtype=va.dtype)
    if compressed_rows:
        getattr(lib, f"st_csr_spmv_add_{_suffix(va.dtype)}_{isuf}")(
            _ivp(pa), _ivp(ja), _vp(va), n_rows, _vp(x), _vp(y), _vp(out)
        )
    else:
        getattr(lib, f"st_csc_spmv_add_{_suffix(va.dtype)}_{isuf}")(
            _ivp(pa), _ivp(ja), _vp(va), n_cols, n_rows, _vp(x), _vp(y), _vp(out)
        )
    return out


def spgemm_csr(indptr_a, cols_a, vals_a, indptr_b, cols_b, vals_b, n_rows, n_cols):
    """CSR×CSR Gustavson SpGEMM (two-phase, nnz-balanced threaded rows).

    Returns ``(indptr_c, cols_c, vals_c)`` with cols sorted within each row
    (canonical order), keeping computed zeros — or None when unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    if vals_a.dtype != vals_b.dtype or vals_a.dtype not in (np.float64, np.float32):
        return None
    pa = _c64(indptr_a)
    ja = _c64(cols_a)
    pb = _c64(indptr_b)
    jb = _c64(cols_b)
    va = np.ascontiguousarray(vals_a)
    vb = np.ascontiguousarray(vals_b)

    # one-phase when the ESC product bound is close to the operand sizes:
    # skip the whole symbolic pass, compact in-kernel
    pc_ub = np.empty(n_rows + 1, dtype=np.int64)
    lib.st_spgemm_ubcount(_ip(pa), _ip(ja), n_rows, _ip(pb), _ip(pc_ub))
    ub_total = int(pc_ub[-1])
    if ub_total <= max(3 * (va.shape[0] + vb.shape[0]), 1 << 20):
        pc = np.empty(n_rows + 1, dtype=np.int64)
        jc = np.empty(ub_total, dtype=np.int64)
        vc = np.empty(ub_total, dtype=va.dtype)
        fn = lib.st_spgemm_onephase_f64 if va.dtype == np.float64 else lib.st_spgemm_onephase_f32
        fn(_ip(pa), _ip(ja), _vp(va), n_rows, _ip(pb), _ip(jb), _vp(vb), n_cols, _ip(pc_ub), _ip(pc), _ip(jc), _vp(vc))
        nnz_c = int(pc[-1])
        return pc, jc[:nnz_c], vc[:nnz_c]

    row_nnz = np.empty(n_rows, dtype=np.int64)
    lib.st_spgemm_symbolic(_ip(pa), _ip(ja), n_rows, _ip(pb), _ip(jb), n_cols, _ip(row_nnz))
    pc = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_nnz, out=pc[1:])
    nnz_c = int(pc[-1])
    jc = np.empty(nnz_c, dtype=np.int64)
    vc = np.empty(nnz_c, dtype=va.dtype)
    fn = lib.st_spgemm_numeric_f64 if va.dtype == np.float64 else lib.st_spgemm_numeric_f32
    fn(_ip(pa), _ip(ja), _vp(va), n_rows, _ip(pb), _ip(jb), _vp(vb), n_cols, _ip(pc), _ip(jc), _vp(vc))
    return pc, jc, vc


def row_reduce_sorted(keys, weights):
    """One-pass grouped add-reduce over sorted keys.

    Returns ``(unique_keys, sums, counts)`` (the roles of
    ``flatnonzero(diff)`` + ``np.add.reduceat`` + the boundary gather in the
    reduce plumbing) or None when unavailable or weights aren't f32/f64."""
    lib = get_lib()
    if lib is None or weights.dtype not in (np.float64, np.float32):
        return None
    keys = _c64(keys)
    weights = np.ascontiguousarray(weights)
    n = keys.shape[0]
    keys_out = np.empty(n, dtype=np.int64)
    sums = np.empty(n, dtype=weights.dtype)
    counts = np.empty(n, dtype=np.int64)
    fn = lib.st_row_reduce_sorted_f64 if weights.dtype == np.float64 else lib.st_row_reduce_sorted_f32
    g = fn(_ip(keys), _vp(weights), n, _ip(keys_out), _vp(sums), _ip(counts))
    return keys_out[:g], sums[:g], counts[:g]


def uncompress_indptr(indptr, n_rows):
    """``np.repeat(np.arange(n_rows), np.diff(indptr))`` natively (threaded).
    Returns int64 row ids or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pc = _c64(indptr)
    ic = np.empty(int(pc[-1]), dtype=np.int64)
    lib.st_uncompress_indptr(_ip(pc), n_rows, _ip(ic))
    return ic


def transpose2d(rows, cols, vals, n_cols, want_rows=True):
    """Stable counting-scatter transpose of a CANONICAL 2-D COO triplet.

    Because canonical order already sorts ties by row within each column, one
    O(nnz + n_cols) stable scatter yields the transposed canonical triplet —
    no sort, no dedup. Returns ``(indptr, rows_t, cols_t, vals_t)`` where
    ``indptr`` (int64, over the input's columns) with ``cols_t``/``vals_t``
    is simultaneously the CSC of the input; ``rows_t`` is None when
    ``want_rows`` is False. Returns None when the native library is
    unavailable or vals isn't f32/f64."""
    lib = get_lib()
    if lib is None:
        return None
    generic = vals.dtype not in (np.float64, np.float32)
    if generic and (vals.dtype.hasobject or vals.dtype.itemsize not in (1, 2, 4, 8, 16)):
        return None
    rows = np.ascontiguousarray(rows)
    cols = np.ascontiguousarray(cols)
    if rows.dtype == cols.dtype and rows.dtype == np.int32:
        isuf = "i32"
    else:
        rows = rows.astype(np.int64, copy=False)
        cols = cols.astype(np.int64, copy=False)
        isuf = "i64"
    vals = np.ascontiguousarray(vals)
    n = rows.shape[0]
    indptr = np.empty(n_cols + 1, dtype=np.int64)
    rows_t = np.empty(n, dtype=rows.dtype) if want_rows else None
    cols_t = np.empty(n, dtype=rows.dtype)
    vals_t = np.empty(n, dtype=vals.dtype)
    if generic:
        fn = getattr(lib, f"st_transpose2d_bytes_{isuf}")
        rc = fn(
            _ivp(rows), _ivp(cols), _ivp(vals), n, n_cols, vals.dtype.itemsize, _ip(indptr),
            _ivp(rows_t) if want_rows else None, _ivp(cols_t), _ivp(vals_t),
        )
        if rc:
            return None
    else:
        fn = getattr(lib, f"st_transpose2d_{_suffix(vals.dtype)}_{isuf}")
        fn(
            _ivp(rows), _ivp(cols), _vp(vals), n, n_cols, _ip(indptr),
            _ivp(rows_t) if want_rows else None, _ivp(cols_t), _vp(vals_t),
        )
    return indptr, rows_t, cols_t, vals_t


def dense_spmm_csrt(indptr, kids, vals, x, n_out):
    """dense (M, K) × sparse (K, N) → dense (M, N) via the CSR of the sparse
    transpose (``indptr`` over N, ``kids`` the K-ids — i.e. the input's CSC
    buffers from :func:`transpose2d`). Both dense transposes are fused into
    the native call (blocked + threaded). Returns the result or None."""
    lib = get_lib()
    if lib is None or vals.dtype not in (np.float64, np.float32):
        return None
    pn = _c64(indptr)
    kids = np.ascontiguousarray(kids)
    isuf = "i32" if kids.dtype == np.int32 else "i64"
    if isuf == "i64":
        kids = kids.astype(np.int64, copy=False)
    va = np.ascontiguousarray(vals)
    x = np.ascontiguousarray(x, dtype=va.dtype)
    m, k = x.shape
    out = np.empty((m, n_out), dtype=va.dtype)
    fn = getattr(lib, f"st_dense_spmm_csrt_{_suffix(va.dtype)}_{isuf}")
    fn(_ip(pn), _ivp(kids), _vp(va), n_out, _vp(x), m, k, _vp(out))
    return out


def relinearize(indptr, indices, lin_terms, row_terms, col_terms):
    """Fused indptr-expansion + mixed-radix target-key computation for GCXS
    restructuring.  Each term list holds ``(src, div, mod, mul)`` tuples
    (``src``: 0 = compressed-row id, 1 = stored index, 2 = the intermediate
    linear index built from ``lin_terms``; ``mod`` 0 = no modulo) and the
    produced key is ``sum(((src // div) % mod) * mul)``.  Returns
    ``(new_row, new_col)`` int64 arrays or None when the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pc = _c64(indptr)
    indices = np.ascontiguousarray(indices)
    isuf = "i32" if indices.dtype == np.int32 else "i64"
    if isuf == "i64":
        indices = indices.astype(np.int64, copy=False)
    n_rows = len(pc) - 1
    nnz = int(pc[-1])
    out_row = np.empty(nnz, dtype=np.int64)
    out_col = np.empty(nnz, dtype=np.int64)

    def pack(terms):
        src = np.ascontiguousarray([t[0] for t in terms], dtype=np.int8)
        div = np.ascontiguousarray([t[1] for t in terms], dtype=np.int64)
        mod = np.ascontiguousarray([t[2] for t in terms], dtype=np.int64)
        mul = np.ascontiguousarray([t[3] for t in terms], dtype=np.int64)
        return (
            [len(terms), src.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _ip(div), _ip(mod), _ip(mul)],
            (src, div, mod, mul),  # keepalive
        )

    la, lk = pack(lin_terms)
    ra, rk = pack(row_terms)
    ca, ck = pack(col_terms)
    fn = getattr(lib, f"st_relinearize_{isuf}")
    fn(_ip(pc), n_rows, *la, *ra, *ca, _ip(out_row), _ip(out_col), indices.ctypes.data_as(ctypes.c_void_p))
    return out_row, out_col


def csr_row_splice(indptr, indices, data, picks):
    """Pack CSR rows ``picks`` into a compact CSR: one native pass builds
    ``(rel_indptr, indices_out, data_out)`` (segment memcpys), replacing
    the repeat/cumsum/gather numpy pipeline.  Returns None when the
    library is unavailable or the value dtype is not byte-copyable."""
    lib = get_lib()
    if lib is None or data.dtype.hasobject:
        return None
    pc = _c64(indptr)
    picks = np.ascontiguousarray(picks, dtype=np.int64)
    indices = np.ascontiguousarray(indices)
    data = np.ascontiguousarray(data)
    total = int(pc[picks + 1].sum() - pc[picks].sum())
    rel_indptr = np.empty(picks.size + 1, dtype=np.int64)
    ind_out = np.empty(total, dtype=indices.dtype)
    dat_out = np.empty(total, dtype=data.dtype)
    lib.st_csr_row_splice_bytes(
        _ip(pc),
        indices.ctypes.data_as(ctypes.c_void_p),
        indices.dtype.itemsize,
        data.ctypes.data_as(ctypes.c_void_p),
        data.dtype.itemsize,
        _ip(picks),
        picks.size,
        _ip(rel_indptr),
        ind_out.ctypes.data_as(ctypes.c_void_p),
        dat_out.ctypes.data_as(ctypes.c_void_p),
    )
    return rel_indptr, ind_out, dat_out
