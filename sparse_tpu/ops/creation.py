"""Creation functions and Array-API namespace wrappers.

Mirrors reference ``_common.py``: ``eye:1561``, ``full:1629``, ``zeros:1727``,
``ones:1788``, ``empty:1849``, ``asarray:2077`` and the Array-API wrapper
family (``all:2162`` … ``var:2585``).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

from ..core.base import SparseArray
from ..core.coo import COO

_FORMATS = ("coo", "dok", "gcxs", "csc", "csr")


def format_to_string(format):
    if isinstance(format, type):
        if not issubclass(format, SparseArray):
            raise ValueError(f"invalid format: {format}")
        format = format.__name__.lower()
    if isinstance(format, str):
        if format not in _FORMATS:
            raise ValueError(f"invalid format: {format}")
        return format
    raise ValueError(f"invalid format: {format}")


def _check_device(device):
    """Accept None, "cpu", or a JAX device; reject anything else (reference
    ``_common.py:33-38`` raises for non-cpu devices)."""
    if device is not None and device != "cpu" and not hasattr(device, "platform"):
        raise ValueError("Device must be `'cpu'`, a JAX device, or `None`.")


def eye(N, M=None, k=0, dtype=float, format="coo", *, device=None, **kwargs):
    """2-D array with ones on the k-th diagonal."""
    import builtins

    _check_device(device)

    if M is None:
        M = N
    N = int(N)
    M = int(M)
    if k > 0:
        n_coords = builtins.min(N, M - k)
    else:
        n_coords = builtins.min(N + k, M)
    n_coords = builtins.max(n_coords, 0)
    if k > 0:
        rows = np.arange(n_coords, dtype=np.intp)
        cols = rows + k
    else:
        cols = np.arange(n_coords, dtype=np.intp)
        rows = cols - k
    data = np.ones(n_coords, dtype=dtype)
    return COO(
        np.stack([rows, cols], axis=0),
        data,
        shape=(N, M),
        has_duplicates=False,
        sorted=True,
    ).asformat(format, **kwargs)


def full(shape, fill_value, dtype=None, format="coo", order="C", *, device=None, **kwargs):
    """Array of ``shape`` filled with ``fill_value`` (stored as the sparse
    fill value — zero stored entries)."""
    _check_device(device)
    if dtype is None:
        dtype = np.array(fill_value).dtype
    if not isinstance(shape, tuple):
        shape = (shape,) if not isinstance(shape, Iterable) else tuple(shape)
    if order not in {"C", None}:
        raise NotImplementedError("Currently, only 'C' and None are supported.")
    shape = tuple(int(s) for s in shape)
    data = np.empty(0, dtype=dtype)
    coords = np.empty((len(shape), 0), dtype=np.intp)
    return COO(
        coords,
        data=data,
        shape=shape,
        fill_value=np.asarray(fill_value, dtype=dtype)[()],
        has_duplicates=False,
        sorted=True,
    ).asformat(format, **kwargs)


def full_like(a, fill_value, dtype=None, shape=None, format=None, **kwargs):
    if format is None and not isinstance(a, np.ndarray):
        format = type(a).__name__.lower()
    elif format is None:
        format = "coo"
    if format == "_compressed2d":
        format = "gcxs"
    compressed_axes = kwargs.pop("compressed_axes", None)
    if compressed_axes is None and hasattr(a, "compressed_axes") and format == "gcxs":
        kwargs["compressed_axes"] = a.compressed_axes
    elif compressed_axes is not None:
        kwargs["compressed_axes"] = compressed_axes
    return full(
        a.shape if shape is None else shape,
        fill_value,
        dtype=(a.dtype if dtype is None else dtype),
        format=format,
        **kwargs,
    )


def zeros(shape, dtype=float, format="coo", *, device=None, **kwargs):
    return full(shape, fill_value=0, dtype=np.dtype(dtype), format=format, device=device, **kwargs)


def zeros_like(a, dtype=None, shape=None, format=None, **kwargs):
    return full_like(a, fill_value=0, dtype=(np.dtype(dtype) if dtype is not None else None), shape=shape, format=format, **kwargs)


def ones(shape, dtype=float, format="coo", *, device=None, **kwargs):
    return full(shape, fill_value=1, dtype=np.dtype(dtype), format=format, device=device, **kwargs)


def ones_like(a, dtype=None, shape=None, format=None, **kwargs):
    return full_like(a, fill_value=1, dtype=(np.dtype(dtype) if dtype is not None else None), shape=shape, format=format, **kwargs)


def empty(shape, dtype=float, format="coo", *, device=None, **kwargs):
    return full(shape, fill_value=0, dtype=np.dtype(dtype), format=format, device=device, **kwargs)


def empty_like(a, dtype=None, shape=None, format=None, **kwargs):
    return full_like(a, fill_value=0, dtype=(np.dtype(dtype) if dtype is not None else None), shape=shape, format=format, **kwargs)


def asarray(obj, /, *, dtype=None, format=None, backend=None, copy=False, device=None):
    """Convert any supported input to the requested sparse format
    (reference ``_common.py:2077``)."""
    from .common import as_coo

    if device not in {"cpu", None} and not hasattr(device, "platform"):
        raise ValueError("Device must be 'cpu' or a jax Device if specified.")
    if format is None:
        format = obj.format if isinstance(obj, SparseArray) else "coo"
    format = format_to_string(format)

    if isinstance(obj, SparseArray | np.ndarray) or np.isscalar(obj) or _is_scipy(obj):
        if np.isscalar(obj):
            obj = np.asarray(obj)
        if isinstance(obj, np.ndarray):
            if dtype is not None:
                obj = obj.astype(dtype, copy=False)
            if obj.ndim == 0:
                return COO.from_numpy(obj)
            return COO.from_numpy(obj).asformat(format)
        res = as_coo(obj) if not isinstance(obj, SparseArray) else obj.asformat("coo")
        if dtype is not None and res.dtype != dtype:
            res = res.astype(dtype)
        res = res.asformat(format)
        if copy and res is obj:
            res = res.copy()
        return res
    # generic array-likes (lists, jax arrays, torch tensors via __array__)
    arr = np.asarray(obj, dtype=dtype)
    return COO.from_numpy(arr).asformat(format)


def _is_scipy(x):
    import scipy.sparse

    return scipy.sparse.issparse(x)


# ---------------------------------------------------------------------------
# Array-API reduction / manipulation wrappers
# ---------------------------------------------------------------------------


def _arrayapi_reduction(name):
    def fn(x, /, *, axis=None, keepdims=False, **kwargs):
        return getattr(x, name)(axis=axis, keepdims=keepdims, **kwargs)

    fn.__name__ = name
    return fn


def all(x, /, *, axis=None, keepdims=False):  # noqa: A001
    return x.all(axis=axis, keepdims=keepdims)


def any(x, /, *, axis=None, keepdims=False):  # noqa: A001
    return x.any(axis=axis, keepdims=keepdims)


def max(x, /, *, axis=None, keepdims=False, out=None):  # noqa: A001
    return x.max(axis=axis, keepdims=keepdims, out=out)


def min(x, /, *, axis=None, keepdims=False, out=None):  # noqa: A001
    return x.min(axis=axis, keepdims=keepdims, out=out)


def mean(x, /, *, axis=None, keepdims=False, dtype=None, out=None):
    return x.mean(axis=axis, keepdims=keepdims, dtype=dtype, out=out)


def prod(x, /, *, axis=None, keepdims=False, dtype=None, out=None):
    return x.prod(axis=axis, keepdims=keepdims, dtype=dtype, out=out)


def sum(x, /, *, axis=None, keepdims=False, dtype=None, out=None):  # noqa: A001
    return x.sum(axis=axis, keepdims=keepdims, dtype=dtype, out=out)


def std(x, /, *, axis=None, correction=0.0, keepdims=False, out=None):
    return x.std(axis=axis, ddof=correction, keepdims=keepdims, out=out)


def var(x, /, *, axis=None, correction=0.0, keepdims=False, out=None):
    return x.var(axis=axis, ddof=correction, keepdims=keepdims, out=out)


def abs(x, /):  # noqa: A001
    from .elemwise import elemwise

    return elemwise(np.abs, x)


def reshape(x, /, shape, *, copy=None, order="C"):
    return x.reshape(shape=shape, order=order) if not isinstance(x, np.ndarray) else np.reshape(x, shape)


def astype(x, dtype, /, *, copy=True):
    return x.astype(dtype, copy=copy)


def squeeze(x, /, axis=None):
    return x.squeeze(axis=axis)


def permute_dims(x, /, axes=None):
    return x.transpose(axes=axes)


def transpose(a, axes=None):
    return a.transpose(axes=axes)


def round(x, /, decimals=0, out=None):  # noqa: A001
    return x.round(decimals=decimals, out=out)


def imag(x, /):
    return x.imag


def real(x, /):
    return x.real


def broadcast_arrays(*arrays):
    from .elemwise import broadcast_to as sp_broadcast_to

    shape = np.broadcast_shapes(*(a.shape for a in arrays))
    return [
        np.broadcast_to(a, shape) if isinstance(a, np.ndarray) else sp_broadcast_to(a, shape) for a in arrays
    ]
