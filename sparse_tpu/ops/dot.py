"""Matmul family: ``tensordot`` / ``matmul`` / ``dot`` / ``sddmm`` and the
format-dispatch core ``_dot``.

Semantics mirror reference ``_common.py:95-500``:

- ``tensordot`` moves contracted axes, reshapes both operands to 2-D,
  multiplies, reshapes back; ``return_type`` selects np.ndarray vs COO.
- sparse × dense returns **dense** by default; sparse × sparse returns sparse.
- all operands must have zero fill values.

The 2-D compute cores are TPU-native:

- SpMM / SpMV: gather + sorted segment-sum XLA kernels
  (``sparse_tpu.kernels.dot``) instead of the reference's Numba CSR loops.
- SpGEMM (sparse × sparse): vectorized expand–sort–contract — materialize
  all partial products by joining on the contraction index, then canonicalize
  (sort + duplicate-sum). Replaces the sequential Gustavson linked-list
  accumulator (``_common.py:640-717``), which has no parallel analogue on
  TPU; ESC is sorts + segment ops, which do.
"""

from __future__ import annotations

import warnings

import numpy as np

from .._utils import check_zero_fill_value, index_dtype_for, zero_of_dtype
from ..core.base import SparseArray
from ..core.coo import COO
from ..native import eager as _native_eager

__all__ = ["tensordot", "matmul", "dot", "vecdot", "sddmm"]


def tensordot(a, b, axes=2, *, return_type=None):
    """Tensor contraction over the given axes (numpy semantics).

    Examples
    --------
    >>> import numpy as np
    >>> import sparse_tpu as sparse
    >>> a = sparse.COO.from_numpy(np.eye(3))
    >>> b = np.arange(6.0).reshape(3, 2)
    >>> sparse.tensordot(a, b, axes=(1, 0)).tolist()
    [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]]
    """
    from ..core.gcxs import GCXS

    a = _from_scipy_operand(a)
    b = _from_scipy_operand(b)
    check_zero_fill_value(a, b, func_name="tensordot")

    if np.isscalar(a) or np.isscalar(b):
        raise ValueError("Cannot perform tensordot on scalars")

    try:
        iter(axes)
    except TypeError:
        axes_a = list(range(-axes, 0))
        axes_b = list(range(axes))
    else:
        axes_a, axes_b = axes
    try:
        na = len(axes_a)
        axes_a = list(axes_a)
    except TypeError:
        axes_a = [axes_a]
        na = 1
    try:
        nb = len(axes_b)
        axes_b = list(axes_b)
    except TypeError:
        axes_b = [axes_b]
        nb = 1

    as_ = a.shape
    nda = a.ndim
    bs = b.shape
    ndb = b.ndim
    equal = True
    if nda == 0 or ndb == 0:
        pos = int(nda == 0)
        raise ValueError(f"Input {pos} operand does not have enough dimensions")
    if na != nb:
        equal = False
    else:
        for k in range(na):
            if as_[axes_a[k]] != bs[axes_b[k]]:
                equal = False
                break
            if axes_a[k] < 0:
                axes_a[k] += nda
            if axes_b[k] < 0:
                axes_b[k] += ndb
    if not equal:
        raise ValueError("shape-mismatch for sum")

    notin = [k for k in range(nda) if k not in axes_a]
    newaxes_a = notin + axes_a
    N2 = 1
    for axis in axes_a:
        N2 *= as_[axis]
    newshape_a = (-1, N2)
    olda = [as_[axis] for axis in notin]

    notin = [k for k in range(ndb) if k not in axes_b]
    newaxes_b = axes_b + notin
    N2 = 1
    for axis in axes_b:
        N2 *= bs[axis]
    newshape_b = (N2, -1)
    oldb = [bs[axis] for axis in notin]

    if any(dim == 0 for dim in (*newshape_a, *newshape_b)) or 0 in olda or 0 in oldb:
        res = _empty_result(a, b, olda, oldb, return_type)
        return res

    if isinstance(a, SparseArray):
        at = a.transpose(tuple(newaxes_a)).reshape(_concrete_2d_shape(as_, newaxes_a, nda - na))
    else:
        at = np.transpose(np.asarray(a), newaxes_a).reshape(_concrete_2d_shape(as_, newaxes_a, nda - na))
    if isinstance(b, SparseArray):
        bt = b.transpose(tuple(newaxes_b)).reshape(_concrete_2d_shape_b(bs, newaxes_b, nb))
    else:
        bt = np.transpose(np.asarray(b), newaxes_b).reshape(_concrete_2d_shape_b(bs, newaxes_b, nb))

    res = _dot(at, bt, return_type)
    if isinstance(res, np.ndarray):
        return res.reshape(olda + oldb)
    return res.reshape(tuple(olda + oldb))


def _concrete_2d_shape(shape, newaxes, n_keep):
    keep = int(np.prod([shape[ax] for ax in newaxes[:n_keep]], dtype=np.float64))
    red = int(np.prod([shape[ax] for ax in newaxes[n_keep:]], dtype=np.float64))
    return (keep, red)


def _concrete_2d_shape_b(shape, newaxes, n_red):
    red = int(np.prod([shape[ax] for ax in newaxes[:n_red]], dtype=np.float64))
    keep = int(np.prod([shape[ax] for ax in newaxes[n_red:]], dtype=np.float64))
    return (red, keep)


def _empty_result(a, b, olda, oldb, return_type):
    shape = tuple(olda + oldb)
    dt = np.promote_types(a.dtype, b.dtype)
    if return_type == np.ndarray or (return_type is None and not (isinstance(a, SparseArray) and isinstance(b, SparseArray))):
        return np.zeros(shape, dtype=dt)
    return COO(np.empty((len(shape), 0), dtype=np.intp), np.empty((0,), dtype=dt), shape=shape)


def _from_scipy_operand(x):
    """Accept scipy.sparse matrices/arrays as operands (reference
    ``_common.py:95-218`` converts them to COO at the dot-family entry)."""
    import scipy.sparse

    if isinstance(x, scipy.sparse.spmatrix | scipy.sparse.sparray):
        return COO.from_scipy_sparse(x)
    return x


def matmul(a, b):
    """``a @ b`` with numpy matmul semantics (batching, 1-D promotion)."""
    if (
        type(b) is np.ndarray
        and b.ndim == 1
        and isinstance(a, SparseArray)
        and a.ndim == 2
        and a.shape[1] == b.shape[0]
        and a.size
    ):
        # eager matvec fast path: one memoized branch straight to the
        # native kernel — the matmul->dot->_dot->_spmm_dense wrapper chain
        # is a measurable share of wall time at spmv_add's 10k-nnz scale
        res = _matvec_fast(a, b)
        if res is not None:
            return res
    a = _from_scipy_operand(a)
    b = _from_scipy_operand(b)
    check_zero_fill_value(a, b, func_name="matmul")
    if not hasattr(a, "ndim") or not hasattr(b, "ndim"):
        a = a if isinstance(a, SparseArray) else np.asarray(a)
        b = b if isinstance(b, SparseArray) else np.asarray(b)
    if np.isscalar(a) or np.isscalar(b) or a.ndim == 0 or b.ndim == 0:
        raise ValueError("matmul: Input operands do not have enough dimensions")

    if _has_nan(a) or _has_nan(b):
        warnings.warn(
            "Nan will not be propagated in matrix multiplication",
            RuntimeWarning,
            stacklevel=2,
        )

    # 1-D promotions
    if a.ndim == 1 and b.ndim == 1:
        return dot(a, b)
    if a.ndim <= 2 and b.ndim <= 2:
        return dot(a, b)

    # batched: broadcast leading dims, recurse
    a_orig, b_orig = a, b
    if a.ndim == 1:
        a = a.reshape((1,) + a.shape)
    if b.ndim == 1:
        b = b.reshape(b.shape + (1,))
    batch_a = a.shape[:-2]
    batch_b = b.shape[:-2]
    batch = np.broadcast_shapes(batch_a, batch_b)
    a = _broadcast_batched(a, batch + a.shape[-2:])
    b = _broadcast_batched(b, batch + b.shape[-2:])

    from .common import stack

    if a.ndim > 2:
        res = [matmul(a[i], b[i]) for i in range(a.shape[0])]
        if all(isinstance(r, np.ndarray) for r in res):
            out = np.stack(res)
        else:
            res = [COO.from_numpy(r) if isinstance(r, np.ndarray) else r for r in res]
            out = stack(res)
    else:
        out = dot(a, b)
    if a_orig.ndim == 1:
        out = out[..., 0, :] if out.ndim > 2 else out[0]
    if b_orig.ndim == 1:
        out = out[..., 0]
    return out


def _broadcast_batched(x, shape):
    if x.shape == shape:
        return x
    if isinstance(x, np.ndarray):
        return np.broadcast_to(x, shape)
    from .elemwise import broadcast_to as sp_broadcast_to

    return sp_broadcast_to(x, shape)


def _has_nan(x):
    if isinstance(x, SparseArray):
        data = getattr(x, "data", None)
        # memoized per (instance, data buffer): the NaN warning scan reads
        # all of `data` on every matmul otherwise
        memo = getattr(x, "_nan_memo", None)
        if memo is not None and memo[0] is data:
            return memo[1]
        arr = np.asarray(data) if data is not None else np.empty(0)
        res = bool(arr.size and np.issubdtype(arr.dtype, np.floating) and np.isnan(np.min(arr)))
        try:
            x._nan_memo = (data, res)
        except AttributeError:
            pass
        return res
    x = np.asarray(x)
    # min-reduce propagates NaN in ONE pass with no bool temporary
    # (isnan().any() materializes x.size bools first) — the same trick the
    # reference uses (_common.py:67)
    return bool(x.size and np.issubdtype(x.dtype, np.floating) and np.isnan(np.min(x)))


def dot(a, b):
    """``np.dot`` semantics: contract last axis of a with second-to-last of b."""
    a = _from_scipy_operand(a)
    b = _from_scipy_operand(b)
    check_zero_fill_value(a, b, func_name="dot")
    if not hasattr(a, "ndim") or not hasattr(b, "ndim"):
        a = a if isinstance(a, SparseArray) else np.asarray(a)
        b = b if isinstance(b, SparseArray) else np.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        raise ValueError("Cannot perform dot product on scalars")

    if a.ndim == 1 and b.ndim == 1:
        if isinstance(a, SparseArray):
            res = (a * b).sum()
            return res.todense()[()] if isinstance(res, SparseArray) else res
        res = (b * a).sum()
        return res.todense()[()] if isinstance(res, SparseArray) else res

    # 2-D fast paths: skip tensordot's transpose/reshape generality (all
    # no-ops for already-2-D operands) and dispatch straight to the kernel —
    # eager matvec/matmul call rates make the wrapper chain measurable
    if a.ndim == 2 and b.ndim in (1, 2) and a.shape[1] == b.shape[0]:
        if isinstance(a, SparseArray) and isinstance(b, np.ndarray):
            return _dot(a, b)
        if isinstance(a, np.ndarray) and isinstance(b, SparseArray) and b.ndim == 2:
            return _dot(a, b)

    a_axis = -1
    b_axis = -2
    if b.ndim == 1:
        b_axis = -1
    return tensordot(a, b, axes=(a_axis, b_axis))


def vecdot(x1, x2, /, *, axis=-1):
    """Conjugating vector dot product along ``axis`` (Array API)."""
    import builtins

    ndmin = builtins.min((x1.ndim, x2.ndim))
    if not (-ndmin <= axis < ndmin) or x1.shape[axis] != x2.shape[axis]:
        raise ValueError("Shapes must match along `axis`.")
    if np.issubdtype(x1.dtype, np.complexfloating):
        x1 = np.conjugate(x1) if isinstance(x1, np.ndarray) else x1.conj()
    return np.sum(x1 * x2, axis=axis, dtype=np.result_type(x1, x2))


# ---------------------------------------------------------------------------
# 2-D dispatch core
# ---------------------------------------------------------------------------


def _dot(a, b, return_type=None):
    from ..core.gcxs import GCXS

    out_shape = (a.shape[0], b.shape[1]) if b.ndim == 2 else (a.shape[0],)

    a_sparse = isinstance(a, SparseArray)
    b_sparse = isinstance(b, SparseArray)

    if a_sparse and b_sparse:
        # CSR×CSR direct: both operands row-compressed → run the native
        # Gustavson kernel straight on their buffers and emit the result
        # GCXS in place, skipping tocoo + canonicalize + re-compress
        # (~35% of the eager GCXS matmul wall time)
        if return_type is not COO and return_type != np.ndarray:
            direct = _spgemm_gcxs_direct(a, b)
            if direct is not None:
                return direct
        a_coo = a.tocoo() if not isinstance(a, COO) else a
        b_coo = b.tocoo() if not isinstance(b, COO) else b
        res = _spgemm(a_coo, b_coo)
        if return_type == np.ndarray:
            return res.todense()
        # reference rule (_common.py:339-495): all-COO operands → COO,
        # anything involving GCXS → GCXS
        if (isinstance(a, GCXS) or isinstance(b, GCXS)) and return_type is not COO and res.ndim >= 2:
            ca = a.compressed_axes if isinstance(a, GCXS) else b.compressed_axes
            ca = tuple(ax for ax in ca if ax < res.ndim) or (0,)
            return res.asformat("gcxs", compressed_axes=ca)
        return res

    if a_sparse and not b_sparse:
        res = _spmm_dense(a, np.asarray(b))
        if return_type is COO:
            return COO.from_numpy(res)
        from ..core.gcxs import GCXS as _G

        if return_type is _G:
            return COO.from_numpy(res).asformat("gcxs")
        return res

    if b_sparse and not a_sparse:
        res = _dense_spmm(np.asarray(a), b)
        if return_type is COO:
            return COO.from_numpy(res)
        from ..core.gcxs import GCXS as _G

        if return_type is _G:
            return COO.from_numpy(res).asformat("gcxs")
        return res

    return np.dot(a, b)


def _spmm_dense(a, b):
    """sparse (M, K) × dense (K,) or (K, N) → dense.

    Fast path: the native C++ CSR/CSC kernels (threaded rows; role of
    reference ``_dot_csr_ndarray_type`` / ``_dot_csc_ndarray_type``,
    ``_common.py:720-905``) straight off the compressed buffers (GCXS) or
    a bincount-built indptr (canonical COO). Falls back to the XLA
    segment-sum kernel for other dtypes / missing toolchain."""
    from ..core.gcxs import GCXS
    from ..kernels import dot as kdot

    accel = _spmm_dense_accelerator(a, b)
    if accel is not None:
        return accel

    native = _spmm_dense_native(a, np.asarray(b))
    if native is not None:
        return native

    if isinstance(a, GCXS) and a.ndim == 2 and a.compressed_axes in ((0,), (1,)):
        from ..core.gcxs import _uncompress_indptr_np

        rows_sorted = True
        if a.compressed_axes == (0,):
            rows = _uncompress_indptr_np(np.asarray(a.indptr))
            cols = np.asarray(a.indices).astype(np.int64)
        else:  # CSC: internal CSR is of Aᵀ
            cols = _uncompress_indptr_np(np.asarray(a.indptr))
            rows = np.asarray(a.indices).astype(np.int64)
            rows_sorted = False
        coords = np.stack([rows, cols])
        data = np.asarray(a.data)
    else:
        rows_sorted = True
        a_coo = a.tocoo() if not isinstance(a, COO) else a
        coords = np.asarray(a_coo.coords)
        data = np.asarray(a_coo.data)
    dt = np.promote_types(data.dtype, b.dtype)
    if np.issubdtype(dt, np.complexfloating) or dt.itemsize > 8 or dt == np.float16:
        # dtypes XLA handles awkwardly: dense fallback through numpy
        return _spmm_dense_np(coords, data.astype(dt), b.astype(dt), a.shape[0])
    data = data.astype(dt, copy=False)
    b = b.astype(dt, copy=False)
    with kdot.on_cpu():
        if b.ndim == 1:
            out = kdot.coo_spmv(coords[0], coords[1], data, b, n_rows=a.shape[0], rows_sorted=rows_sorted)
        else:
            out = kdot.coo_spmm(coords[0], coords[1], data, b, n_rows=a.shape[0], rows_sorted=rows_sorted)
    return np.asarray(out).astype(dt, copy=False)


def _spmm_dense_accelerator(a, b):
    """Opt-in accelerator path for eager sparse×dense
    (``SPARSE_TPU_EAGER_MATMUL=default``): run the block-ELL MXU kernel on
    jax's default backend, caching the layout on the array
    (``COO.enable_caching`` makes repeated matmuls reuse it). Returns None
    when the knob is off or the operand doesn't qualify."""
    from .._settings import EAGER_MATMUL_DEVICE

    if EAGER_MATMUL_DEVICE != "default":
        return None
    if not isinstance(a, COO) or a.ndim != 2:
        a = a.tocoo() if hasattr(a, "tocoo") and a.ndim == 2 else a
        if not isinstance(a, COO):
            return None
    dt = np.promote_types(a.dtype, np.asarray(b).dtype)
    if dt not in (np.float64, np.float32):
        return None
    import jax.numpy as jnp

    from ..kernels.row_ell import row_ell_spmm, row_ell_spmm_program, row_ell_spmv

    rell = a.to_row_ell()
    # the row-ELL kernels promote internally (result_type of data and dense)
    bj = jnp.asarray(np.asarray(b), dtype=dt)
    if np.asarray(b).ndim == 1:
        out = row_ell_spmv(rell, bj)
    elif _layout_seen_before(rell) and _tier_nbytes(rell) <= _PROGRAM_EMBED_MAX_BYTES:
        # constant-embedded program (memoized on the layout): XLA
        # pre-lays-out the tier arrays — 3.78 vs 4.65 ms at the bench
        # shape.  Worth a per-layout compile only on REPEAT use (the
        # layout cache on COO makes repeats share tiers identity); a
        # one-shot dot() takes the args-based kernel below instead of a
        # multi-second recompile.  Big layouts stay args-based too: 100MB+
        # closure constants can blow the tunnel compile-request limit.
        out = row_ell_spmm_program(rell)(bj)
    else:
        out = row_ell_spmm(rell, bj)
    return np.asarray(out)


# Program embedding gate for the eager accelerator: promote a layout to
# the constant-embedded program only once it has been seen before (a
# repeat-use signal — solvers/benchmarks hit the same matrix every call)
# and its tiers are small enough to inline into a compile request.
_PROGRAM_EMBED_MAX_BYTES = 80 * 1024 * 1024
_SEEN_LAYOUTS = {}


def _tier_nbytes(rell):
    return sum(int(c.nbytes) + int(d.nbytes) for c, d in rell.tiers)


def _layout_seen_before(rell):
    key = id(rell.tiers)
    hit = _SEEN_LAYOUTS.get(key)
    if hit is not None and hit is rell.tiers:
        return True
    _SEEN_LAYOUTS[key] = rell.tiers
    if len(_SEEN_LAYOUTS) > 64:
        _SEEN_LAYOUTS.pop(next(iter(_SEEN_LAYOUTS)))
    return False


def _entry_matvec_buffers(a, dt):
    """``(row_ids, col_ids, data)`` per-entry triplets (matching index
    dtype) for the entry-loop matvec, memoized on the instance — the
    sparse-row-regime kernel (``nnz << n_rows``) iterates entries only."""
    from ..core.gcxs import GCXS, _uncompress_indptr_np

    memo = getattr(a, "_entry_mv_memo", None)
    if memo is not None and memo[0] is a.data:
        ri, ci = memo[1], memo[2]
    elif isinstance(a, COO):
        coords = np.asarray(a.coords)
        ri = np.ascontiguousarray(coords[0].astype(np.int64, copy=False))
        ci = np.ascontiguousarray(coords[1].astype(np.int64, copy=False))
    elif isinstance(a, GCXS) and a.compressed_axes in ((0,), (1,)):
        idx = np.asarray(a.indices)
        unc = _uncompress_indptr_np(np.asarray(a.indptr)).astype(idx.dtype, copy=False)
        ri, ci = (unc, idx) if a.compressed_axes == (0,) else (idx, unc)
    else:
        return None
    if memo is None or memo[0] is not a.data:
        try:
            a._entry_mv_memo = (a.data, ri, ci)
        except AttributeError:
            pass
    return ri, ci, np.asarray(a.data).astype(dt, copy=False)


def _compressed_matvec_buffers(a, dt):
    """``(indptr, idx, data, compressed_rows)`` buffers for the native
    CSR/CSC matvec kernels, or None.  GCXS hands over its compressed
    buffers directly; canonical COO contributes its memoized row indptr."""
    from ..core.gcxs import GCXS
    from ..native import build_indptr

    if isinstance(a, GCXS) and a.ndim == 2 and a.compressed_axes in ((0,), (1,)):
        data = np.asarray(a.data).astype(dt, copy=False)
        return np.asarray(a.indptr), np.asarray(a.indices), data, a.compressed_axes == (0,)
    if isinstance(a, COO) and a.ndim == 2:
        coords = np.asarray(a.coords)
        data = np.asarray(a.data).astype(dt, copy=False)
        memo = getattr(a, "_indptr_memo", None)
        if memo is not None and memo[0] is a.coords:
            indptr = memo[1]
        else:
            indptr = build_indptr(coords[0], a.shape[0])
            try:
                a._indptr_memo = (a.coords, indptr)
            except AttributeError:
                pass
        return indptr, coords[1], data, True
    return None


def _matvec_fast(a, b):
    """2-D sparse @ 1-D float ndarray straight to the native kernel.

    Applicability is decided BEFORE any semantic side effect (fill-value
    error, NaN warning) so a None return leaves the generic path to redo
    them exactly once."""
    from .._settings import EAGER_MATMUL_DEVICE

    if EAGER_MATMUL_DEVICE == "default":
        return None  # accelerator knob routes matvecs to the device kernels
    dt = np.promote_types(a.dtype, b.dtype)
    if dt not in (np.float64, np.float32) or _native_eager.get_lib() is None:
        return None
    entry = _entry_matvec_buffers(a, dt) if a.nnz * 2 <= a.shape[0] else None
    bufs = None if entry is not None else _compressed_matvec_buffers(a, dt)
    if entry is None and bufs is None:
        return None
    check_zero_fill_value(a, b, func_name="matmul")
    if _has_nan(a) or _has_nan(b):
        warnings.warn(
            "Nan will not be propagated in matrix multiplication",
            RuntimeWarning,
            stacklevel=3,
        )
    b = b.astype(dt, copy=False)
    if entry is not None:
        ri, ci, data = entry
        res = _native_eager.coo_spmv_entries(ri, ci, data, b, a.shape[0])
        if res is not None:
            return res
        bufs = _compressed_matvec_buffers(a, dt)
        if bufs is None:
            return None
    indptr, idx, data, compressed_rows = bufs
    if compressed_rows:
        return _native_eager.csr_spmm_dense(indptr, idx, data, b, a.shape[0], owner=a)
    return _native_eager.csc_spmm_dense(indptr, idx, data, b, a.shape[0], a.shape[1], owner=a)


def matvec_add(a, x, y):
    """Fused ``a @ x + y`` (sparse 2-D ``a``, dense 1-D ``x``/``y``).

    One native pass seeds the output with ``y`` instead of zeros — the
    unfused expression pays a memset plus a separate full-length add pass,
    which dominates at the reference ``spmv_add`` example's density
    (``/root/reference/examples/spmv_add_example.py:11-66``: 99,990×100k
    @1e-6 is output-bandwidth-bound).  Semantics are exactly
    ``matmul(a, x) + y`` (same fill-value errors and NaN warning); any
    non-native case falls back to that expression."""
    if (
        isinstance(a, SparseArray)
        and a.ndim == 2
        and type(x) is np.ndarray
        and x.ndim == 1
        and type(y) is np.ndarray
        and y.shape == (a.shape[0],)
        and a.shape[1] == x.shape[0]
        and a.size
    ):
        dt = np.promote_types(np.promote_types(a.dtype, x.dtype), y.dtype)
        if dt in (np.float64, np.float32) and _native_eager.get_lib() is not None:
            entry = _entry_matvec_buffers(a, dt) if a.nnz * 2 <= a.shape[0] else None
            bufs = None if entry is not None else _compressed_matvec_buffers(a, dt)
            if entry is not None or bufs is not None:
                check_zero_fill_value(a, x, func_name="matmul")
                if _has_nan(a) or _has_nan(x):
                    warnings.warn(
                        "Nan will not be propagated in matrix multiplication",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                xdt = x.astype(dt, copy=False)
                ydt = y.astype(dt, copy=False)
                if entry is not None:
                    ri, ci, data = entry
                    res = _native_eager.coo_spmv_entries(ri, ci, data, xdt, a.shape[0], y=ydt)
                    if res is not None:
                        return res
                    bufs = _compressed_matvec_buffers(a, dt)
                if bufs is not None:
                    indptr, idx, data, compressed_rows = bufs
                    res = _native_eager.spmv_add(
                        indptr,
                        idx,
                        data,
                        xdt,
                        ydt,
                        a.shape[0],
                        a.shape[1],
                        compressed_rows,
                        owner=a,
                    )
                    if res is not None:
                        return res
    return matmul(a, x) + y


def _spmm_dense_native(a, b):
    """C++ CSR/CSC × dense, or None when not applicable."""
    from ..core.gcxs import GCXS
    from ..native import build_indptr

    dt = np.promote_types(a.dtype, b.dtype)
    if dt not in (np.float64, np.float32) or _native_eager.get_lib() is None:
        return None
    if isinstance(a, GCXS) and a.ndim == 2 and a.compressed_axes in ((0,), (1,)):
        data = np.asarray(a.data).astype(dt, copy=False)
        if a.compressed_axes == (0,):  # CSR
            return _native_eager.csr_spmm_dense(np.asarray(a.indptr), np.asarray(a.indices), data, b, a.shape[0], owner=a)
        return _native_eager.csc_spmm_dense(
            np.asarray(a.indptr), np.asarray(a.indices), data, b, a.shape[0], a.shape[1], owner=a
        )
    if isinstance(a, COO) and a.ndim == 2:
        coords = np.asarray(a.coords)
        data = np.asarray(a.data).astype(dt, copy=False)
        # memoize the row indptr on the (canonical, immutable) COO: solver
        # loops and repeated eager matmuls hit the same matrix every call
        memo = getattr(a, "_indptr_memo", None)
        if memo is not None and memo[0] is a.coords:
            indptr = memo[1]
        else:
            indptr = build_indptr(coords[0], a.shape[0])
            try:
                a._indptr_memo = (a.coords, indptr)
            except AttributeError:
                pass
        return _native_eager.csr_spmm_dense(indptr, coords[1], data, b, a.shape[0])
    return None


def _spmm_dense_np(coords, data, b, n_rows):
    rows, cols = coords[0], coords[1]
    if b.ndim == 1:
        out = np.zeros((n_rows,), dtype=data.dtype)
        np.add.at(out, rows, data * b[cols])
    else:
        out = np.zeros((n_rows, b.shape[1]), dtype=data.dtype)
        np.add.at(out, rows, data[:, None] * b[cols])
    return out


def _dense_spmm(a, b):
    """dense (M, K) × sparse (K, N) → dense.

    Native path: ``(a @ b)ᵀ = bᵀ @ aᵀ`` — b's canonical row-sorted COO (or
    GCXS buffers) double as a column-compressed layout of bᵀ, so the C++
    CSR/CSC kernels apply with two dense transposes and no index copies."""
    from ..kernels import dot as kdot

    b_coo = b.tocoo() if not isinstance(b, COO) else b
    coords = np.asarray(b_coo.coords)
    data = np.asarray(b_coo.data)
    dt = np.promote_types(data.dtype, a.dtype)
    if b_coo.ndim == 1:
        # (M, K) @ (K,) -> handled by caller via b_axis=-1: b is 1-D sparse
        rows = coords[0]
        out = np.zeros((a.shape[0],), dtype=dt)
        contrib = a[:, rows] * data[None, :].astype(dt)
        return contrib.sum(axis=1)
    if dt in (np.float64, np.float32) and _native_eager.get_lib() is not None:
        K, N = b.shape
        a_np = np.asarray(a)
        m_rows = 1 if a_np.ndim == 1 else a_np.shape[0]
        # for a handful of rows the CSC build costs more than the plain
        # scatter SpMV saves — take the gather path only when the row count
        # amortizes it or the buffers are already memoized
        want_csc = data.dtype in (np.float64, np.float32) and (
            m_rows >= 4 or getattr(b_coo, "_csc_memo", None) is not None
        )
        csc = b_coo._csc_buffers() if want_csc else None
        if csc is not None:
            indptr_n, kids, vals = csc
            vals = vals.astype(dt, copy=False)
            if m_rows == 1:
                # x @ S = Sᵀ x: gather SpMV over the CSR of the transpose
                x = (a_np if a_np.ndim == 1 else a_np[0]).astype(dt, copy=False)
                out = _native_eager.csr_spmm_dense(indptr_n, kids, vals, x, N)
                if out is not None:
                    return out if a_np.ndim == 1 else out[None, :]
            else:
                # fused kernel: both dense transposes happen natively
                out = _native_eager.dense_spmm_csrt(indptr_n, kids, vals, a_np.astype(dt, copy=False), N)
                if out is not None:
                    return out
        from ..native import build_indptr

        at = np.ascontiguousarray(np.asarray(a).T, dtype=dt)  # (K, M)
        indptr = build_indptr(coords[0], K)
        out_t = _native_eager.csc_spmm_dense(indptr, coords[1], data.astype(dt, copy=False), at, N, K)
        if out_t is not None:
            return np.ascontiguousarray(out_t.T)
    if np.issubdtype(dt, np.complexfloating) or dt.itemsize > 8 or dt == np.float16:
        rows, cols = coords[0], coords[1]
        out = np.zeros((a.shape[0], b.shape[1]), dtype=dt)
        np.add.at(out.T, cols, (a.astype(dt)[:, rows] * data.astype(dt)[None, :]).T)
        return out
    with kdot.on_cpu():
        out = kdot.dense_coo_matmul(
            a.astype(dt, copy=False), coords[0], coords[1], data.astype(dt, copy=False), n_out_cols=b.shape[1]
        )
    return np.asarray(out)


def _spgemm(a, b):
    """COO (M, K) × COO (K, N) → COO via expand–sort–contract.

    Joins A's entries with B's rows on the contraction index k, materializes
    all nnz(A-row k)×nnz(B-row k) partial products with vectorized
    repeat/gather, then lets the canonical COO constructor sort and sum
    duplicates. Computed (cancellation) zeros are kept, matching the
    reference's symbolic-pattern semantics."""
    if a.ndim == 1:
        a = a.reshape((1, -1))
        res = _spgemm(a, b)
        return res.reshape(res.shape[1:]) if res.ndim == 2 else res
    if b.ndim == 1:
        b = b.reshape((-1, 1))
        res = _spgemm(a, b)
        return res.reshape(res.shape[:-1])

    M, K = a.shape
    K2, N = b.shape
    assert K == K2

    a_coords = np.asarray(a.coords)
    a_data = np.asarray(a.data)
    b_coords = np.asarray(b.coords)
    b_data = np.asarray(b.data)
    dt = np.promote_types(a_data.dtype, b_data.dtype)

    # native Gustavson fast path (role of reference `_dot_csr_csr_type`,
    # `_common.py:640`): two-phase threaded CSR×CSR in C++, keeping computed
    # zeros like the numpy formulation below
    if dt in (np.float64, np.float32) and a_data.size + b_data.size >= _native_eager.NATIVE_MIN_NNZ:
        native = _spgemm_native(a_coords, a_data, b_coords, b_data, M, K, N, dt)
        if native is not None:
            return native

    # sort A entries by contraction index k
    order = np.argsort(a_coords[1], kind="stable")
    a_i = a_coords[0][order]
    a_k = a_coords[1][order]
    a_v = a_data[order]

    # B is row-major sorted: entries grouped by k already
    b_counts = np.bincount(b_coords[0], minlength=K)
    b_starts = np.concatenate([[0], np.cumsum(b_counts)[:-1]])

    repeats = b_counts[a_k]
    total = int(repeats.sum())
    if total == 0:
        return COO(
            np.empty((2, 0), dtype=np.intp), np.empty((0,), dtype=dt), shape=(M, N), prune=False
        )

    ends = np.cumsum(repeats)
    starts = ends - repeats
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, repeats)
    b_idx = np.repeat(b_starts[a_k], repeats) + within

    out_i = np.repeat(a_i, repeats)
    out_j = b_coords[1][b_idx]
    out_v = (np.repeat(a_v, repeats).astype(dt) * b_data[b_idx].astype(dt))

    # prune=True: the reference prunes computed fill-values from every _dot
    # result (``_common.py:378-495``) so cancellation can't leave explicit
    # zeros in storage
    return COO(
        np.stack([out_i, out_j], axis=0),
        out_v,
        shape=(M, N),
        has_duplicates=True,
        sorted=False,
        prune=True,
    )


def _spgemm_gcxs_direct(a, b):
    """CSR×CSR → GCXS(CSR) on the native kernel's raw output, or None.

    Applies when both operands are 2-D row-compressed GCXS with zero fill
    and f32/f64 data (role of the reference's ``_dot_csr_csr_type``,
    ``_common.py:640``, which likewise never leaves CSR)."""
    from ..core.gcxs import GCXS

    if not (isinstance(a, GCXS) and isinstance(b, GCXS)):
        return None
    if a.ndim != 2 or b.ndim != 2 or a.compressed_axes != b.compressed_axes:
        return None
    if a.compressed_axes not in ((0,), (1,)):
        return None
    # CSC×CSC: (A@B)ᵀ = Bᵀ@Aᵀ, and a CSC's buffers ARE the CSR buffers of
    # its transpose — run the kernel swapped and emit CSC of the product
    csc = a.compressed_axes == (1,)
    if csc:
        a, b = b, a
    dt = np.promote_types(a.dtype, b.dtype)
    if dt not in (np.float64, np.float32) or _native_eager.get_lib() is None:
        return None
    a_data = np.asarray(a.data)
    b_data = np.asarray(b.data)
    if a_data.size + b_data.size < _native_eager.NATIVE_MIN_NNZ:
        return None
    if csc:
        M, N = a.shape[1], b.shape[0]  # rows/cols of the transposed product
    else:
        M, N = a.shape[0], b.shape[1]
    res = _native_eager.spgemm_csr(
        np.asarray(a.indptr),
        np.asarray(a.indices),
        a_data.astype(dt, copy=False),
        np.asarray(b.indptr),
        np.asarray(b.indices),
        b_data.astype(dt, copy=False),
        M,
        N,
    )
    if res is None:  # pragma: no cover - defensive
        return None
    pc, jc, vc = res
    # prune computed zeros (cancellation), matching the reference's
    # prune=True on every _dot result; rebuilding indptr is one bincount
    keep = vc != 0
    if not keep.all():
        rows = _native_eager.uncompress_indptr(pc, M)
        if rows is None:  # pragma: no cover - defensive
            rows = np.repeat(np.arange(M, dtype=np.int64), np.diff(pc))
        rows, jc, vc = rows[keep], jc[keep], vc[keep]
        pc = np.zeros(M + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows, minlength=M), out=pc[1:])
    idx_dtype = index_dtype_for(max(M, N, vc.size))
    return GCXS._make(
        vc,
        jc.astype(idx_dtype, copy=False),
        pc.astype(idx_dtype, copy=False),
        (N, M) if csc else (M, N),
        (1,) if csc else (0,),
        zero_of_dtype(dt),
    )


def _spgemm_native(a_coords, a_data, b_coords, b_data, M, K, N, dt):
    """CSR×CSR through the C++ two-phase Gustavson kernel; None if unavailable.

    Inputs are canonical COO buffers (row-major sorted), so the CSR indptr is
    a bincount/cumsum away and the kernel's per-row sorted output is already
    canonical — the result is built with ``COO._make`` (no re-sort)."""
    from ..native import build_indptr

    if _native_eager.get_lib() is None:
        return None
    pa = build_indptr(a_coords[0], M)
    pb = build_indptr(b_coords[0], K)
    res = _native_eager.spgemm_csr(
        pa,
        a_coords[1],
        a_data.astype(dt, copy=False),
        pb,
        b_coords[1],
        b_data.astype(dt, copy=False),
        M,
        N,
    )
    if res is None:  # pragma: no cover - defensive
        return None
    pc, jc, vc = res
    rows = _native_eager.uncompress_indptr(pc, M)
    if rows is None:  # pragma: no cover - defensive
        rows = np.repeat(np.arange(M, dtype=np.int64), np.diff(pc))
    # prune computed zeros (cancellation), matching the reference's
    # prune=True on every _dot result (``_common.py:378-495``)
    keep = vc != 0
    if not keep.all():
        rows, jc, vc = rows[keep], jc[keep], vc[keep]
    idx_dtype = index_dtype_for(max(M, N))
    coords = np.stack([rows, jc]).astype(idx_dtype, copy=False)
    return COO._make(coords, vc, (M, N), zero_of_dtype(dt))


def sddmm(s, lhs, rhs):
    """Sampled dense-dense matmul: ``s * (lhs @ rhs)`` evaluated only at the
    stored coordinates of the sparse sample matrix ``s`` (COO, zero fill).

    The TPU-native fused path for the reference's sddmm example
    (``examples/sddmm_example.py``): gathers the needed lhs rows / rhs
    columns at s's coordinates and contracts, never forming lhs @ rhs."""
    from ..kernels import dot as kdot

    check_zero_fill_value(s, func_name="sddmm")
    s_coo = s.tocoo() if not isinstance(s, COO) else s
    coords = np.asarray(s_coo.coords)
    data = np.asarray(s_coo.data)
    lhs = np.asarray(lhs)
    rhs = np.asarray(rhs)
    dt = np.promote_types(data.dtype, np.promote_types(lhs.dtype, rhs.dtype))
    if np.issubdtype(dt, np.complexfloating) or dt == np.float16:
        vals = data.astype(dt) * np.einsum("ek,ek->e", lhs.astype(dt)[coords[0]], rhs.T.astype(dt)[coords[1]])
    else:
        with kdot.on_cpu():
            vals = np.asarray(
                kdot.sddmm(
                    coords[0], coords[1], data.astype(dt, copy=False), lhs.astype(dt, copy=False), rhs.astype(dt, copy=False)
                )
            )
    return COO._make(coords.copy(), vals, s_coo.shape, np.asarray(0, dtype=dt)[()])
