"""Index canonicalization: turn anything accepted by ``x[...]`` into a flat
tuple of ``slice`` / ``int`` / integer ``ndarray`` / ``None`` entries, one per
dimension (plus ``None`` entries for new axes).

Fresh implementation of the semantics the reference vendors from dask
(``/root/reference/sparse/numba_backend/_slicing.py``): ellipsis expansion,
``None`` insertion, negative-index posification, bool→int conversion, bounds
checking, and slice clamping.
"""

from __future__ import annotations

from collections.abc import Iterable
from numbers import Integral, Number

import numpy as np


def normalize_index(idx, shape):
    """Canonicalize ``idx`` against ``shape``.

    Returns a tuple with one entry per dimension of ``shape`` (interleaved
    with any ``None`` new-axis markers): each entry is a positive ``int``, a
    ``slice`` with concrete non-negative ``start``/``stop`` and ``step``
    (negative-step slices keep their normalized form), or a 1-D ``ndarray``
    of non-negative integers.
    """
    if not isinstance(idx, tuple):
        idx = (idx,)

    # N-D boolean mask: expands into integer arrays covering its ndim dims.
    expanded = []
    for i in idx:
        if isinstance(i, np.ndarray) and i.dtype == np.bool_ and i.ndim > 1:
            expanded.extend(i.nonzero())
        else:
            expanded.append(i)
    idx = tuple(expanded)

    idx = _replace_ellipsis(idx, len(shape))

    n_dims_consumed = sum(1 for i in idx if i is not None)
    if n_dims_consumed > len(shape):
        raise IndexError(f"Too many indices for array with shape {shape}")
    # Pad missing trailing dimensions with full slices.
    idx = idx + (slice(None),) * (len(shape) - n_dims_consumed)

    out = []
    dim = 0
    for i in idx:
        if i is None:
            out.append(None)
            continue
        d = shape[dim]
        out.append(_normalize_one(i, d))
        dim += 1
    return tuple(out)


def _replace_ellipsis(idx, ndim):
    n_ellipsis = sum(1 for i in idx if i is Ellipsis)
    if n_ellipsis > 1:
        raise IndexError("an index can only have a single ellipsis ('...')")
    if n_ellipsis == 0:
        return idx
    loc = next(pos for pos, i in enumerate(idx) if i is Ellipsis)
    n_dims_consumed = sum(1 for i in idx if i is not None and i is not Ellipsis)
    fill = (slice(None),) * (ndim - n_dims_consumed)
    return idx[:loc] + fill + idx[loc + 1 :]


def _normalize_one(i, d):
    if isinstance(i, slice):
        start, stop, step = i.indices(d)
        return slice(start, stop, step)
    if isinstance(i, Integral) or (isinstance(i, np.ndarray) and i.ndim == 0 and i.dtype != np.bool_):
        i = int(i)
        if i < -d or i >= d:
            raise IndexError(f"Index {i} is out of bounds for axis with size {d}")
        return i + d if i < 0 else i
    if isinstance(i, np.ndarray) and i.ndim == 0 and i.dtype == np.bool_:
        raise IndexError("0-d boolean index is not supported")
    if isinstance(i, (np.ndarray, list, tuple, range)) or (
        isinstance(i, Iterable) and not isinstance(i, (str, bytes))
    ):
        arr = np.asarray(i)
        if arr.dtype == np.bool_:
            if arr.ndim != 1:
                raise IndexError("multi-dimensional boolean masks are expanded before this point")
            if arr.shape[0] != d:
                raise IndexError(
                    f"Boolean array of length {arr.shape[0]} does not match axis of size {d}"
                )
            return np.flatnonzero(arr)
        if not np.issubdtype(arr.dtype, np.integer):
            if arr.size == 0:
                return arr.astype(np.intp).reshape(arr.shape)
            raise IndexError(f"Invalid index dtype {arr.dtype}")
        if arr.ndim > 1:
            raise IndexError(">1-d integer array indices are not supported")
        if arr.size and (int(arr.min()) < -d or int(arr.max()) >= d):
            raise IndexError(f"Index array out of bounds for axis with size {d}")
        return np.where(arr < 0, arr + d, arr).astype(np.intp)
    if isinstance(i, Number):
        # non-integral scalars (0.5, 1+2j, ...) are invalid indices
        raise IndexError(f"Invalid index: {i!r} (only integers, slices, arrays, and Ellipsis are valid)")
    raise IndexError(f"Invalid index type: {type(i)}")
