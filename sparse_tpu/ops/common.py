"""Namespace op library: the long tail of array functions over sparse
formats (concatenate/stack, kron, triu/tril, nan-reductions, where,
argmax/argmin, roll, diagonal, sort, unique, take, pad, repeat/tile,
diff, interp, …).

Semantics mirror reference ``_coo/common.py`` and ``_common.py``; the
per-row Numba kernels (``_sort_coo:1400``, ``_compute_minmax_args:1454``)
are replaced with vectorized grouped passes (lexsort + reduceat), the
data-parallel formulation that also maps onto TPU segment primitives.
"""

from __future__ import annotations

import operator
import warnings
from collections import namedtuple
from collections.abc import Iterable
from functools import reduce as _functools_reduce

import numpy as np

from .._utils import (
    can_store,
    check_consistent_fill_value,
    check_zero_fill_value,
    equivalent,
    normalize_axis,
    zero_of_dtype,
)
from ..core.base import SparseArray
from ..core.coo import COO


def _is_scipy_sparse_obj(x):
    import scipy.sparse

    return scipy.sparse.issparse(x)


def asCOO(x, name="asCOO", check=True):
    """Convert to COO; raise if the input is dense (would densify)."""
    if check and not isinstance(x, SparseArray | np.ndarray) and np.ndim(x) == 0:
        return x
    if isinstance(x, np.ndarray) and check:
        raise ValueError(f"Performing this operation would produce a dense result: {name}")
    if _is_scipy_sparse_obj(x):
        return COO.from_scipy_sparse(x)
    if not isinstance(x, SparseArray):
        if check:
            raise ValueError(f"Performing this operation would produce a dense result: {name}")
        return COO.from_numpy(np.asarray(x))
    if not isinstance(x, COO):
        return x.asformat("coo")
    return x


def _validate_coo_input(x):
    if _is_scipy_sparse_obj(x):
        return COO.from_scipy_sparse(x)
    if not isinstance(x, SparseArray):
        raise ValueError(f"Input must be an instance of SparseArray, but it's {type(x)}.")
    if not isinstance(x, COO):
        return x.asformat("coo")
    return x


def linear_loc(coords, shape):
    return np.ravel_multi_index(tuple(coords), shape)


# ---------------------------------------------------------------------------
# combining
# ---------------------------------------------------------------------------


def kron(a, b):
    """Kronecker product: cartesian product of the operands' stored entries
    (reference ``_coo/common.py:67``)."""
    check_zero_fill_value(a, b, func_name="kron")
    a_sparse = isinstance(a, SparseArray) or _is_scipy_sparse_obj(a)
    b_sparse = isinstance(b, SparseArray) or _is_scipy_sparse_obj(b)
    a_ndim = np.ndim(a)
    b_ndim = np.ndim(b)
    if not (a_sparse or b_sparse):
        raise ValueError("Performing this operation would produce a dense result: kron")

    if a_ndim == 0 or b_ndim == 0:
        # kron against a scalar is plain scaling (reference _coo/common.py:110)
        return a * b

    a = asCOO(a, check=False)
    b = asCOO(b, check=False)

    ndim = max(a.ndim, b.ndim)
    a = a.reshape((1,) * (ndim - a.ndim) + a.shape)
    b = b.reshape((1,) * (ndim - b.ndim) + b.shape)

    a_coords = np.asarray(a.coords)
    b_coords = np.asarray(b.coords)
    a_data = np.asarray(a.data)
    b_data = np.asarray(b.data)
    nnz_a = a_data.shape[0]
    nnz_b = b_data.shape[0]

    shape = tuple(a.shape[d] * b.shape[d] for d in range(ndim))
    coords = np.empty((ndim, nnz_a * nnz_b), dtype=np.int64)
    for d in range(ndim):
        coords[d] = (a_coords[d][:, None].astype(np.int64) * b.shape[d] + b_coords[d][None, :]).reshape(-1)
    data = (a_data[:, None] * b_data[None, :]).reshape(-1)
    return COO(coords, data, shape=shape, has_duplicates=False)


def concatenate(arrays, axis=0):
    """Concatenate sparse arrays along an axis (``_coo/common.py:132``)."""
    from ..core.gcxs import GCXS

    all_gcxs = all(isinstance(a, GCXS) for a in arrays)
    if all_gcxs and axis is not None and arrays and arrays[0].ndim >= 2:
        # native storage splice — no COO round-trip
        from ..core.gcxs import concatenate_gcxs

        return concatenate_gcxs(arrays, axis=axis)
    arrays = [_validate_coo_input(a) for a in arrays]
    check_consistent_fill_value(arrays)

    if axis is None:
        axis = 0
        arrays = [a.flatten() for a in arrays]

    arrays = [x if isinstance(x, COO) else COO(x) for x in arrays]
    axis = normalize_axis(axis, arrays[0].ndim)
    nnz = 0
    dim = sum(x.shape[axis] for x in arrays)
    shape = list(arrays[0].shape)
    shape[axis] = dim
    for i, x in enumerate(arrays):
        if len(x.shape) != len(shape):
            raise ValueError("all the input array dimensions must match exactly")
        for d in range(len(shape)):
            if d != axis and x.shape[d] != shape[d]:
                raise ValueError(
                    f"all the input array dimensions except for the concatenation axis must match exactly"
                )

    from .._utils import get_out_dtype

    data = np.concatenate([np.asarray(x.data) for x in arrays])
    # keep the inputs' index dtype when it can address the result
    # (minimal upcast otherwise, reference ``_coo/common.py:132``)
    in_idx = np.result_type(*[np.asarray(x.coords).dtype for x in arrays])
    idx_dtype = get_out_dtype(in_idx, max(max(shape), 1))
    coords = np.concatenate(
        [np.asarray(x.coords) for x in arrays], axis=1, dtype=idx_dtype, casting="unsafe"
    )

    dim = 0
    for x in arrays:
        if dim:
            coords[axis, nnz : x.nnz + nnz] += dim
        dim += x.shape[axis]
        nnz += x.nnz

    out = COO(coords, data, shape=shape, has_duplicates=False, sorted=(axis == 0), fill_value=arrays[0].fill_value)
    if all_gcxs:
        return out.asformat("gcxs")
    return out


concat = concatenate


def stack(arrays, axis=0):
    """Stack sparse arrays along a new axis (``_coo/common.py:195``)."""
    from ..core.gcxs import GCXS

    all_gcxs = all(isinstance(a, GCXS) for a in arrays)
    if all_gcxs and arrays and arrays[0].ndim >= 2:
        # native storage splice — no COO round-trip (1-D inputs take the
        # COO path, as in the reference)
        from ..core.gcxs import stack_gcxs

        return stack_gcxs(arrays, axis=axis)
    arrays = [_validate_coo_input(a) for a in arrays]
    check_consistent_fill_value(arrays)
    if len({x.shape for x in arrays}) > 1:
        raise ValueError("all input arrays must have the same shape")
    arrays = [x if isinstance(x, COO) else COO(x) for x in arrays]
    axis = normalize_axis(axis, arrays[0].ndim + 1)

    from .._utils import get_out_dtype

    data = np.concatenate([np.asarray(x.data) for x in arrays])
    coords = np.concatenate([np.asarray(x.coords) for x in arrays], axis=1)
    shape = list(arrays[0].shape)
    shape.insert(axis, len(arrays))

    in_idx = np.result_type(*[np.asarray(x.coords).dtype for x in arrays])
    idx_dtype = get_out_dtype(in_idx, max(max(shape), 1))
    new_row = np.concatenate([np.full(x.nnz, i, dtype=idx_dtype) for i, x in enumerate(arrays)])
    coords = np.insert(coords.astype(idx_dtype), axis, new_row, axis=0)

    out = COO(coords, data, shape=shape, has_duplicates=False, sorted=(axis == 0), fill_value=arrays[0].fill_value)
    if all_gcxs:
        return out.asformat("gcxs")
    return out


# ---------------------------------------------------------------------------
# triangles / diagonals
# ---------------------------------------------------------------------------


def triu(x, k=0):
    """Upper-triangular part (entries with ``j - i >= k``)."""
    check_zero_fill_value(x, func_name="triu")
    if not x.ndim >= 2:
        raise NotImplementedError("sparse.triu is not implemented for scalars or 1-D arrays.")
    x = _validate_coo_input(x)
    coords = np.asarray(x.coords)
    mask = coords[-2] + k <= coords[-1]
    return COO(coords[:, mask], np.asarray(x.data)[mask], shape=x.shape, sorted=True, has_duplicates=False)


def tril(x, k=0):
    """Lower-triangular part (entries with ``j - i <= k``)."""
    check_zero_fill_value(x, func_name="tril")
    if not x.ndim >= 2:
        raise NotImplementedError("sparse.tril is not implemented for scalars or 1-D arrays.")
    x = _validate_coo_input(x)
    coords = np.asarray(x.coords)
    mask = coords[-2] + k >= coords[-1]
    return COO(coords[:, mask], np.asarray(x.data)[mask], shape=x.shape, sorted=True, has_duplicates=False)


# ---------------------------------------------------------------------------
# nan-skipping reductions (reference _coo/common.py:334-533)
# ---------------------------------------------------------------------------


def nanreduce(x, method, identity=None, axis=None, keepdims=False, **kwargs):
    """Reduce skipping NaNs by replacing them with the identity element."""
    arr = _replace_nan(x, method.identity if identity is None else identity)
    return arr.reduce(method, axis, keepdims, **kwargs)


def _replace_nan(array, value):
    if not np.issubdtype(array.dtype, np.floating):
        return array
    return where(np.isnan(array), value, array)


def nansum(x, axis=None, keepdims=False, dtype=None, out=None):
    assert out is None
    x = asCOO(x, name="nansum")
    return nanreduce(x, np.add, None, axis, keepdims, dtype=dtype)


def nanmean(x, axis=None, keepdims=False, dtype=None, out=None):
    assert out is None
    x = asCOO(x, name="nanmean")
    if not (np.issubdtype(x.dtype, np.floating) or np.issubdtype(x.dtype, np.complexfloating)):
        return x.mean(axis=axis, keepdims=keepdims, dtype=dtype)
    mask = np.isnan(x)
    x2 = where(mask, 0, x)
    nancount = mask.sum(axis=axis, dtype="i8", keepdims=keepdims)
    if axis is None:
        axis = tuple(range(x.ndim))
    elif not isinstance(axis, tuple):
        axis = (axis,)
    den = _functools_reduce(operator.mul, (x.shape[i] for i in axis), 1)
    den -= nancount
    if bool((np.asarray(den.todense() if isinstance(den, SparseArray) else den) == 0).any()):
        warnings.warn("Mean of empty slice", RuntimeWarning, stacklevel=1)
    num = np.sum(x2, axis=axis, dtype=dtype, keepdims=keepdims)
    with np.errstate(invalid="ignore", divide="ignore"):
        if num.ndim:
            return np.true_divide(num, den, casting="unsafe")
        return (num / den).astype(dtype if dtype is not None else x.dtype)


def nanmax(x, axis=None, keepdims=False, dtype=None, out=None):
    """NaN-skipping max via an ``fmax`` reduce (fmax(NaN, v) == v); an
    all-NaN slice stays NaN, like numpy (reference ``_coo/common.py:431``)."""
    assert out is None
    x = asCOO(x, name="nanmax")
    ar = x.reduce(np.fmax, axis=axis, keepdims=keepdims, dtype=dtype)
    _warn_all_nan(ar)
    return ar


def nanmin(x, axis=None, keepdims=False, dtype=None, out=None):
    assert out is None
    x = asCOO(x, name="nanmin")
    ar = x.reduce(np.fmin, axis=axis, keepdims=keepdims, dtype=dtype)
    _warn_all_nan(ar)
    return ar


def _warn_all_nan(res):
    if isinstance(res, SparseArray):
        vals = np.asarray(res.data)
        has_nan = bool(np.isnan(vals).any()) if np.issubdtype(vals.dtype, np.floating) else False
        fv = np.asarray(res.fill_value)
        has_nan = has_nan or (np.issubdtype(fv.dtype, np.floating) and bool(np.isnan(fv)))
    else:
        vals = np.asarray(res)
        has_nan = np.issubdtype(vals.dtype, np.floating) and bool(np.isnan(vals).any())
    if has_nan:
        warnings.warn("All-NaN slice encountered", RuntimeWarning, stacklevel=2)


def nanprod(x, axis=None, keepdims=False, dtype=None, out=None):
    assert out is None
    x = asCOO(x)
    return nanreduce(x, np.multiply, None, axis, keepdims, dtype=dtype)


# ---------------------------------------------------------------------------
# where / nonzero / argwhere
# ---------------------------------------------------------------------------


def where(condition, x=None, y=None):
    """Ternary select (or coordinate query with one argument).

    Examples
    --------
    >>> import numpy as np
    >>> import sparse_tpu as sparse
    >>> s = sparse.COO.from_numpy(np.array([0.0, 1.0, 2.0]))
    >>> sparse.where(s > 1, s, 0.0).todense().tolist()
    [0.0, 0.0, 2.0]
    >>> [i.tolist() for i in sparse.where(s)]
    [[1, 2]]
    """
    from .elemwise import elemwise

    x_given = x is not None
    y_given = y is not None
    if not (x_given or y_given):
        check_zero_fill_value(condition)
        condition = asCOO(condition, name=str(np.where))
        return tuple(np.asarray(condition.coords))
    if x_given != y_given:
        raise ValueError("either both or neither of x and y should be given")
    return elemwise(np.where, condition, x, y)


def nonzero(x):
    check_zero_fill_value(x, func_name="nonzero")
    x = _validate_coo_input(x)
    coords = np.asarray(x.coords)
    data = np.asarray(x.data)
    mask = data != 0
    return tuple(coords[:, mask])


def argwhere(a):
    return np.transpose(a.nonzero())


# ---------------------------------------------------------------------------
# argmax / argmin (vectorized _compute_minmax_args)
# ---------------------------------------------------------------------------


def argmax(x, /, *, axis=None, keepdims=False):
    return _arg_minmax_common(x, axis=axis, keepdims=keepdims, mode="max")


def argmin(x, /, *, axis=None, keepdims=False):
    return _arg_minmax_common(x, axis=axis, keepdims=keepdims, mode="min")


def _arg_minmax_common(x, axis, keepdims, mode):
    """First-occurrence arg-extremum honoring implicit fill positions.

    Per 2-D group: combine the extremum over the stored entries, the first
    un-occupied column (where the fill value virtually sits), and NaN
    first-occurrence rules — all with grouped ``reduceat`` passes instead of
    the reference's per-row Numba walk (``_coo/common.py:1454``)."""
    assert mode in ("max", "min")
    is_max = mode == "max"
    if not isinstance(axis, int | type(None)):
        raise ValueError(f"axis must be int or None, but it's: {type(axis)}")
    x = _validate_coo_input(x)

    if axis is None:
        flat = x.reshape(-1)
        result = _arg_minmax_2d(flat.reshape((1, flat.shape[0])), is_max)[0]
        if keepdims:
            return COO.from_numpy(np.full((1,) * x.ndim, result))
        return COO.from_numpy(np.intp(result))

    if isinstance(axis, int) and not (-x.ndim <= axis < x.ndim):
        # wording matches reference ``_coo/common.py:1499``
        raise ValueError(f"`axis={axis}` is out of bounds for array of dimension {x.ndim}.")
    axis = normalize_axis(axis, x.ndim)
    # move target axis last, flatten others
    order = tuple(i for i in range(x.ndim) if i != axis) + (axis,)
    neg_shape = tuple(x.shape[i] for i in range(x.ndim) if i != axis)
    keep = int(np.prod(neg_shape, dtype=np.float64)) if neg_shape else 1
    x2 = x.transpose(order).reshape((keep, x.shape[axis]))
    res = _arg_minmax_2d(x2, is_max).reshape(neg_shape)
    if keepdims:
        res = np.expand_dims(res, axis)
    return COO.from_numpy(res)


def _arg_minmax_2d(x2, is_max):
    """np.arg{max,min} over axis 1 of a 2-D COO, returned dense (keep,)."""
    keep, n = x2.shape
    if n == 0:
        raise ValueError("attempt to get argmin/argmax of an empty sequence")
    rows = np.asarray(x2.coords[0])
    cols = np.asarray(x2.coords[1]).astype(np.int64)
    data = np.asarray(x2.data)
    fv = np.asarray(x2.fill_value, dtype=data.dtype)[()]

    out = np.zeros(keep, dtype=np.intp)
    if rows.size == 0:
        return out

    starts = np.flatnonzero(np.concatenate([[True], np.diff(rows) != 0]))
    grp_rows = rows[starts]
    counts = np.diff(np.concatenate([starts, [rows.size]]))

    # extremum of stored values per group
    red = np.maximum if is_max else np.minimum
    m = red.reduceat(data, starts)
    # first stored column achieving the extremum
    achieve = data == np.repeat(m, counts)
    fa = np.minimum.reduceat(np.where(achieve, cols, n), starts)

    # first unoccupied column per group (where fv virtually sits first)
    ranks = np.arange(rows.size, dtype=np.int64) - np.repeat(starts, counts)
    gap_key = np.where(cols != ranks, ranks, np.int64(n))
    g = np.minimum.reduceat(gap_key, starts)
    first_gap = np.minimum(g, counts)  # == counts when the prefix is dense
    has_gap = counts < n

    # default: index of stored extremum
    res = fa.astype(np.intp)
    if np.issubdtype(data.dtype, np.floating) or np.issubdtype(data.dtype, np.complexfloating):
        nan_mask = np.isnan(data)
        if nan_mask.any() or np.isnan(fv):
            first_nan = np.minimum.reduceat(np.where(nan_mask, cols, n), starts)
            if np.isnan(fv):
                first_nan = np.minimum(first_nan, np.where(has_gap, first_gap, n))
            rows_with_nan = first_nan < n
            res = np.where(rows_with_nan, first_nan.astype(np.intp), res)
            if np.isnan(fv):
                out[:] = 0  # rows with no stored entries: all-NaN -> first position
            m = np.where(rows_with_nan, np.nan, m)  # block fv comparison below
    with np.errstate(invalid="ignore"):
        if is_max:
            fv_better = has_gap & (fv > m)
            fv_tie = has_gap & (fv == m)
        else:
            fv_better = has_gap & (fv < m)
            fv_tie = has_gap & (fv == m)
    res = np.where(fv_better, first_gap.astype(np.intp), res)
    res = np.where(fv_tie, np.minimum(first_gap.astype(np.intp), res), res)

    out[grp_rows] = res
    # rows with no stored entries keep index 0 (all fill)
    return out


# ---------------------------------------------------------------------------
# structural ops
# ---------------------------------------------------------------------------


def roll(a, shift, axis=None):
    a = as_coo(a)
    if axis is None:
        return roll(a.reshape((-1,)), shift, 0).reshape(a.shape)
    axis = normalize_axis(axis, a.ndim)
    if not isinstance(axis, tuple):
        axis = (axis,)
    if not isinstance(shift, Iterable):
        shift = (shift,)
    elif np.ndim(shift) > 1:
        raise ValueError("'shift' and 'axis' must be integers or 1D sequences.")
    if len(shift) == 1:
        shift = np.full(len(axis), shift)
    if len(axis) != len(shift):
        raise ValueError("If 'shift' is a 1D sequence, 'axis' must have equal length.")

    # shifted extents must stay storable in the input index dtype (note:
    # shape + shift is elementwise here, matching reference _coo/common.py:789
    # — a +300 shift on a (5,5,5) uint8-indexed array overflows and raises)
    try:
        shifted_extent = int(np.max(np.asarray(a.shape) + np.asarray([int(s) for s in shift])))
    except ValueError:  # len(axis) not broadcastable against ndim
        shifted_extent = max(
            max(a.shape), max(int(a.shape[ax]) + int(s) for ax, s in zip(axis, shift))
        )
    if not can_store(a.coords.dtype, shifted_extent):
        raise ValueError(
            f"cannot roll with coords.dtype {a.coords.dtype} and shift {shift}. Try casting coords to a larger dtype."
        )
    if np.issubdtype(np.asarray(a.coords).dtype, np.unsignedinteger) and any(int(s) < 0 for s in shift):
        raise ValueError(
            f"rolling with coords.dtype as {np.asarray(a.coords).dtype} is not safe. Try using a signed dtype."
        )

    coords, data = np.copy(np.asarray(a.coords)), np.copy(np.asarray(a.data))
    for sh, ax in zip(shift, axis):
        coords[ax] = (coords[ax].astype(np.int64) + int(sh)) % a.shape[ax]
    return COO(coords, data=data, shape=a.shape, has_duplicates=False, fill_value=a.fill_value)


def diagonal(a, offset=0, axis1=0, axis2=1):
    """Extract a diagonal (``_coo/common.py:815``)."""
    a = _validate_coo_input(a)
    if a.shape[axis1] != a.shape[axis2]:
        raise ValueError("a.shape[axis1] != a.shape[axis2]")

    diag_axes = [axis for axis in range(a.ndim) if axis not in (axis1, axis2)] + [axis1]
    diag_shape = [a.shape[axis] for axis in diag_axes]
    diag_shape[-1] -= abs(offset)

    coords = np.asarray(a.coords)
    idx = np.flatnonzero(coords[axis1].astype(np.int64) + offset == coords[axis2])
    diag_coords = [coords[axis][idx] for axis in diag_axes[:-1]]
    pos = coords[axis1][idx] if offset >= 0 else coords[axis2][idx]
    diag_coords.append(pos)
    return COO(
        np.stack(diag_coords, axis=0) if diag_coords else np.empty((1, idx.size), dtype=np.intp),
        np.asarray(a.data)[idx],
        shape=tuple(diag_shape),
        fill_value=a.fill_value,
    )


def diagonalize(a, axis=0):
    """Append a new diagonal dimension (``_coo/common.py:881``)."""
    a = as_coo(a)
    diag_shape = a.shape + (a.shape[axis],)
    coords = np.asarray(a.coords)
    diag_coords = np.vstack([coords, coords[axis]])
    return COO(diag_coords, np.asarray(a.data), shape=diag_shape, fill_value=a.fill_value)


def isposinf(x, out=None):
    from .elemwise import elemwise

    return elemwise(lambda a: np.isposinf(a), x)


def isneginf(x, out=None):
    from .elemwise import elemwise

    return elemwise(lambda a: np.isneginf(a), x)


def result_type(*arrays_and_dtypes):
    return np.result_type(*(_as_result_type_arg(x) for x in arrays_and_dtypes))


def _as_result_type_arg(x):
    if not isinstance(x, SparseArray):
        return x
    if x.ndim > 0:
        return x.dtype
    return np.asarray(x.todense())


def expand_dims(x, /, *, axis=0):
    x = _validate_coo_input(x)
    axis = normalize_axis(axis, x.ndim + 1)
    coords = np.asarray(x.coords).astype(np.int64)
    new_coords = np.insert(coords, axis, np.zeros(x.nnz, dtype=np.int64), axis=0)
    shape = x.shape[:axis] + (1,) + x.shape[axis:]
    return COO(new_coords, np.asarray(x.data), shape=shape, sorted=True, has_duplicates=False, fill_value=x.fill_value)


def flip(x, /, *, axis=None):
    x = _validate_coo_input(x)
    if axis is None:
        axis = range(x.ndim)
    if not isinstance(axis, Iterable):
        axis = (axis,)
    axis = tuple(normalize_axis(ax, x.ndim) for ax in axis)
    new_coords = np.asarray(x.coords).copy()
    for ax in axis:
        new_coords[ax] = x.shape[ax] - 1 - new_coords[ax]
    return COO(new_coords, np.asarray(x.data), shape=x.shape, fill_value=x.fill_value)


UniqueCountsResult = namedtuple("UniqueCountsResult", ["values", "counts"])


def unique_counts(x, /):
    """Unique values + counts, accounting for the implicit fill-value count
    (NaN fill values are all-distinct per the Array API spec)."""
    x = _validate_coo_input(x)
    x = x.flatten()
    values, counts = np.unique(np.asarray(x.data), return_counts=True, equal_nan=False)
    fill_count = x.size - x.nnz
    fv = np.asarray(x.fill_value)[()]
    if fill_count > 0:
        if isinstance(fv, np.floating | float) and np.isnan(fv):
            values = np.concatenate([values, np.full(fill_count, fv)])
            counts = np.concatenate([counts, np.ones(fill_count, dtype=counts.dtype)])
        else:
            values = np.concatenate([[fv], values])
            counts = np.concatenate([[fill_count], counts])
            sorted_indices = np.argsort(values)
            values = values[sorted_indices]
            counts = counts[sorted_indices]
    return UniqueCountsResult(values, counts)


def unique_values(x, /):
    x = _validate_coo_input(x)
    x = x.flatten()
    values = np.unique(np.asarray(x.data), equal_nan=False)
    fill_count = x.size - x.nnz
    fv = np.asarray(x.fill_value)[()]
    if fill_count > 0:
        if isinstance(fv, np.floating | float) and np.isnan(fv):
            values = np.concatenate([values, np.full(fill_count, fv)])
        else:
            values = np.sort(np.concatenate([[fv], values]))
    return values


def sort(x, /, *, axis=-1, descending=False, stable=False):
    """Sorted copy along an axis, with the implicit fill-value block placed at
    its sorted position. Vectorized replacement for ``_sort_coo``
    (``_coo/common.py:1400``)."""
    x = _validate_coo_input(x)
    if stable:
        raise ValueError("`stable=True` isn't currently supported.")

    original_ndim = x.ndim
    if x.ndim == 1:
        x = x.reshape((1, x.shape[0]))
        axis = -1

    x = moveaxis(x, source=axis, destination=-1)
    x_shape = x.shape
    n = x_shape[-1]
    x2 = x.reshape((-1, n))

    rows = np.asarray(x2.coords[0])
    cols = np.asarray(x2.coords[1])
    data = np.asarray(x2.data)
    fv = np.asarray(x2.fill_value, dtype=data.dtype)[()]

    if rows.size:
        isfloat = np.issubdtype(data.dtype, np.floating)
        nan_mask = np.isnan(data) if isfloat else np.zeros_like(data, dtype=bool)
        if descending:
            val_key = np.where(nan_mask, np.inf, -data) if isfloat else -data.astype(np.int64) if np.issubdtype(
                data.dtype, np.signedinteger
            ) else -data.astype(np.float64)
            nan_first_key = ~nan_mask  # False (NaN) sorts first
            order = np.lexsort((val_key, nan_first_key, rows))
        else:
            order = np.lexsort((data, rows))  # argsort puts NaN last

        s_rows = rows[order]
        s_data = data[order]

        starts = np.flatnonzero(np.concatenate([[True], np.diff(s_rows) != 0]))
        counts = np.diff(np.concatenate([starts, [s_rows.size]]))
        k = np.repeat(counts, counts)  # stored count per entry's row
        m = n - k  # implicit fill count per entry's row
        ranks = np.arange(s_rows.size, dtype=np.int64) - np.repeat(starts, counts)

        fv_is_nan = bool(np.isnan(fv)) if np.issubdtype(data.dtype, np.floating) else False
        with np.errstate(invalid="ignore"):
            if descending:
                if fv_is_nan:
                    above = np.zeros(s_data.shape, dtype=bool)
                else:
                    below = (s_data > fv) | (np.isnan(s_data) if np.issubdtype(data.dtype, np.floating) else False)
                    above = ~below
            else:
                if fv_is_nan:
                    above = np.isnan(s_data)
                else:
                    below = s_data < fv
                    above = ~below
        new_cols = ranks + np.where(above, m, 0)
        new_coords = np.stack([s_rows.astype(np.int64), new_cols], axis=0)
        x2 = COO(new_coords, s_data, shape=x2.shape, has_duplicates=False, sorted=False, fill_value=fv)

    x = x2.reshape(x_shape)
    x = moveaxis(x, source=-1, destination=axis)
    if original_ndim == x.ndim:
        return x
    x = x.squeeze()
    if x.shape == ():
        return x.reshape((1,))
    return x


def take(x, indices, /, *, axis=None):
    x = _validate_coo_input(x)
    if axis is None:
        x = x.flatten()
        return x[np.asarray(indices)]
    axis = normalize_axis(axis, x.ndim)
    full_index = (slice(None),) * axis + (np.asarray(indices), Ellipsis)
    return x[full_index]


def matrix_transpose(x, /):
    if hasattr(x, "ndim") and x.ndim < 2:
        raise ValueError("`x.ndim >= 2` must hold.")
    return x.mT if isinstance(x, SparseArray) else np.swapaxes(x, -1, -2)


def broadcast_shapes(*shapes):
    return np.broadcast_shapes(*shapes)


def moveaxis(a, source, destination):
    if not hasattr(source, "__iter__"):
        source = (source,)
    if not hasattr(destination, "__iter__"):
        destination = (destination,)
    source = normalize_axis(tuple(source), a.ndim)
    destination = normalize_axis(tuple(destination), a.ndim)
    if len(source) != len(destination):
        raise ValueError("`source` and `destination` arguments must have the same number of elements")
    order = [n for n in range(a.ndim) if n not in source]
    for dest, src in sorted(zip(destination, source)):
        order.insert(dest, src)
    return a.transpose(tuple(order))


def swapaxes(a, axis1, axis2):
    return a.swapaxes(axis1, axis2)


def pad(array, pad_width, mode="constant", **kwargs):
    if not isinstance(array, SparseArray):
        raise NotImplementedError("Input array is not compatible.")
    if mode.lower() != "constant":
        raise NotImplementedError(f"Mode '{mode}' is not yet supported.")
    if not equivalent(kwargs.pop("constant_values", zero_of_dtype(array.dtype)), array.fill_value):
        raise ValueError("constant_values can only be equal to fill value.")
    if kwargs:
        raise NotImplementedError("Additional Unknown arguments present.")

    array = array.asformat("coo")
    pad_width = np.broadcast_to(pad_width, (len(array.shape), 2))
    new_coords = np.asarray(array.coords).astype(np.int64) + pad_width[:, 0:1]
    new_shape = tuple(array.shape[i] + pad_width[i, 0] + pad_width[i, 1] for i in range(array.ndim))
    return COO(new_coords, np.asarray(array.data), shape=new_shape, fill_value=array.fill_value)


def outer(a, b, out=None):
    """Outer product of flattened inputs (``_common.py:1895``)."""
    from .dot import tensordot

    assert out is None
    if isinstance(a, SparseArray):
        a = asCOO(a).flatten()
    else:
        a = np.asarray(a).reshape(-1)
    if isinstance(b, SparseArray):
        b = asCOO(b).flatten()
    else:
        b = np.asarray(b).reshape(-1)
    return tensordot(a, b, axes=0)


def asnumpy(a, dtype=None, order=None):
    if isinstance(a, SparseArray):
        a = a.todense()
    return np.asarray(a, dtype=dtype, order=order)


def can_cast(from_, to, /, *, casting="safe"):
    # Instances (SparseArray, ndarray) contribute their dtype; dtype-like
    # specs (np.int8 the *type*, strings, np.dtype) pass through to np.dtype.
    if not isinstance(from_, (np.dtype, str, type)) and hasattr(from_, "dtype"):
        from_ = from_.dtype
    return np.can_cast(np.dtype(from_), np.dtype(to), casting=casting)


def repeat(a, repeats, axis=None):
    """Repeat each element ``repeats`` times along ``axis``."""
    from .elemwise import broadcast_to as sp_broadcast_to

    if not isinstance(a, SparseArray):
        raise TypeError("`a` must be a SparseArray.")
    if not isinstance(repeats, int):
        raise ValueError("`repeats` must be an integer, uneven repeats are not yet Implemented.")
    new_shape = list(a.shape)
    axis_is_none = False
    if axis is None:
        a = a.reshape(-1)
        new_shape = [a.shape[0]]
        axis = 0
        axis_is_none = True
    if axis < 0:
        axis = a.ndim + axis
    new_shape[axis] *= repeats
    a = expand_dims(a, axis=axis + 1)
    shape_to_broadcast = a.shape[: axis + 1] + (repeats,) + a.shape[axis + 2 :]
    a = sp_broadcast_to(a, shape_to_broadcast)
    out = a.reshape(tuple(new_shape))
    if axis_is_none:
        return out.flatten()
    return out


def tile(a, reps):
    from .elemwise import broadcast_to as sp_broadcast_to

    if not isinstance(a, SparseArray):
        a = as_coo(a)
    if isinstance(reps, int):
        reps = (reps,)
    reps = tuple(reps)
    if a.ndim == 0:
        a = a.reshape((1,))
    if len(reps) < a.ndim:
        reps = (1,) * (a.ndim - len(reps)) + reps
    elif len(reps) > a.ndim:
        a = a.reshape((1,) * (len(reps) - a.ndim) + a.shape)
    shape = a.shape
    ndim = len(reps)
    a = a.reshape(tuple(np.column_stack(([1] * ndim, shape)).reshape(-1)))
    a = sp_broadcast_to(a, tuple(np.column_stack((reps, shape)).reshape(-1)))
    return a.reshape(tuple(int(r) * int(s) for r, s in zip(reps, shape)))


def unstack(x, axis=0):
    ndim = x.ndim
    if not (-ndim <= axis < ndim):
        raise ValueError(f"axis must be in range [-{ndim}, {ndim}), got {axis}")
    if not isinstance(x, SparseArray):
        raise TypeError("`x` must be a SparseArray.")
    if axis < 0:
        axis = ndim + axis
    new_order = (axis,) + tuple(i for i in range(ndim) if i != axis)
    x = x.transpose(new_order)
    return tuple(iter(x))


def diff(x, axis=-1, n=1, prepend=None, append=None):
    if not isinstance(x, SparseArray):
        raise TypeError("`x` must be a SparseArray.")
    if axis < 0:
        axis = x.ndim + axis
    if prepend is not None:
        x = concatenate([prepend, x], axis=axis)
    if append is not None:
        x = concatenate([x, append], axis=axis)
    result = x
    for _ in range(n):
        result = (
            result[(slice(None),) * axis + (slice(1, None),)] - result[(slice(None),) * axis + (slice(None, -1),)]
        )
    return result


def interp(x, xp, fp, left=None, right=None, period=None):
    """np.interp applied to the data and fill value (result re-pruned)."""
    from .elemwise import elemwise

    if isinstance(xp, SparseArray):
        xp = xp.todense()
    if isinstance(fp, SparseArray):
        fp = fp.todense()

    def interp_func(xx):
        return np.interp(xx, xp, fp, left=left, right=right, period=period)

    if not isinstance(x, SparseArray):
        return interp_func(np.asarray(x))
    fmt = x.format if hasattr(x, "format") else "coo"
    out = elemwise(interp_func, asCOO(x))
    return out.asformat(fmt) if fmt != "coo" else out


def as_coo(x, shape=None, fill_value=None, idx_dtype=None):
    """Convert any supported input to COO."""
    if hasattr(x, "shape") and shape is not None:
        raise ValueError("Cannot provide a shape in combination with something that already has a shape.")
    if hasattr(x, "fill_value") and fill_value is not None:
        raise ValueError("Cannot provide a fill-value in combination with something that already has a fill-value.")
    if isinstance(x, SparseArray):
        return x.asformat("coo")
    if isinstance(x, np.ndarray):
        return COO.from_numpy(x, fill_value=fill_value, idx_dtype=idx_dtype)
    if _is_scipy_sparse_obj(x):
        return COO.from_scipy_sparse(x)
    if np.isscalar(x):
        return COO.from_numpy(np.asarray(x), fill_value=fill_value, idx_dtype=idx_dtype)
    if isinstance(x, Iterable | dict):
        return COO.from_iter(x, shape=shape, fill_value=fill_value)
    raise NotImplementedError(
        f"Format not supported for conversion. Supplied type is {type(x)}, see help(sparse.as_coo) for supported formats."
    )


def isinf(x, /):
    from .elemwise import elemwise

    return elemwise(np.isinf, x)


def isnan(x, /):
    from .elemwise import elemwise

    return elemwise(np.isnan, x)


def isfinite(x, /):
    from .elemwise import elemwise

    return elemwise(np.isfinite, x)


def equal(x1, x2, /):
    from .elemwise import elemwise

    return elemwise(np.equal, x1, x2)
