"""DOK — dict-of-keys format, the mutable builder format.

Host-side by design: mutation does not trace/jit, so DOK lives on the host
as ``{coord_tuple: value}`` and lowers to COO for compute — the same role it
plays in the reference (``_dok.py``): ``__setitem__`` supports scalars,
slices (expanded recursively), and 1-D/N-D fancy indices; ``__getitem__``
falls back to COO for anything but a single element.
"""

from __future__ import annotations

from numbers import Integral

import numpy as np

from .._utils import equivalent
from .base import SparseArray
from .coo import COO


class DOK(SparseArray):
    """Dict-of-keys mutable sparse array.

    Examples
    --------
    >>> import sparse_tpu as sparse
    >>> d = sparse.DOK((2, 3))
    >>> d[0, 1] = 4.0
    >>> d[1, :] = 1.0
    >>> d.nnz
    4
    >>> d.todense().tolist()
    [[0.0, 4.0, 0.0], [1.0, 1.0, 1.0]]
    """

    def __init__(self, shape, data=None, dtype=None, fill_value=None):
        import scipy.sparse

        if isinstance(shape, COO):
            arr = DOK.from_coo(shape)
            self._make_shallow_copy_of(arr)
            return
        if isinstance(shape, np.ndarray):
            arr = DOK.from_numpy(shape)
            self._make_shallow_copy_of(arr)
            return
        if isinstance(shape, SparseArray) and not isinstance(shape, DOK):
            arr = DOK.from_coo(shape.tocoo())
            self._make_shallow_copy_of(arr)
            return
        if isinstance(shape, DOK):
            arr = shape
            self.data = dict(arr.data)
            self.dtype_ = arr.dtype
            SparseArray.__init__(self, arr.shape, fill_value=arr.fill_value if fill_value is None else fill_value)
            return
        if scipy.sparse.issparse(shape):
            arr = DOK.from_coo(COO.from_scipy_sparse(shape))
            self._make_shallow_copy_of(arr)
            return

        if isinstance(shape, Integral):
            shape = (int(shape),)
        self.data = {}
        self.dtype_ = np.dtype(dtype) if dtype is not None else None
        SparseArray.__init__(self, shape, fill_value=fill_value)

        if data is None:
            data = {}
        if isinstance(data, dict):
            if self.dtype_ is None and data:
                # result dtype spans ALL initial values (reference _dok.py:
                # {uint8, uint16} -> uint16, {uint8, float32} -> float32)
                self.dtype_ = np.result_type(*[np.asarray(v) for v in data.values()])
            for c, d in data.items():
                self[c] = d
        else:
            raise ValueError("data must be a dict.")

    # fill_value/dtype interplay: dtype may be unknown until first write
    @property
    def dtype(self):
        if self.dtype_ is not None:
            return self.dtype_
        return np.dtype(np.float64)

    @property
    def nnz(self):
        return len(self.data)

    @property
    def format(self):
        return "dok"

    @property
    def nbytes(self):
        return self.nnz * (self.dtype.itemsize + self.ndim * np.dtype(np.intp).itemsize)

    @classmethod
    def from_coo(cls, x):
        ar = cls(x.shape, dtype=x.dtype, fill_value=x.fill_value)
        coords = np.asarray(x.coords)
        data = np.asarray(x.data)
        # vectorized bulk build: tuple keys from one transpose+tolist pass
        keys = map(tuple, coords.T.tolist())
        ar.data = dict(zip(keys, list(data)))
        return ar

    @classmethod
    def from_numpy(cls, x, fill_value=None):
        return cls.from_coo(COO.from_numpy(x, fill_value=fill_value))

    @classmethod
    def from_scipy_sparse(cls, x, /, *, fill_value=None):
        return cls.from_coo(COO.from_scipy_sparse(x, fill_value=fill_value))

    def to_coo(self):
        if not self.data:
            return COO(
                np.empty((self.ndim, 0), dtype=np.intp),
                np.empty((0,), dtype=self.dtype),
                shape=self.shape,
                fill_value=self.fill_value,
            )
        coords = np.array(list(self.data.keys()), dtype=np.intp).T.reshape(self.ndim, -1)
        data = np.array(list(self.data.values()), dtype=self.dtype)
        return COO(coords, data, shape=self.shape, fill_value=self.fill_value)

    tocoo = to_coo

    def todense(self):
        out = np.full(self.shape, np.asarray(self.fill_value, dtype=self.dtype))
        for c, d in self.data.items():
            out[c] = d
        return out

    def asformat(self, format, **kwargs):
        from .._utils import convert_format

        format = convert_format(format)
        if format == "dok":
            return self
        return self.to_coo().asformat(format, **kwargs)

    def __str__(self):
        return f"<DOK: shape={self.shape}, dtype={self.dtype}, nnz={self.nnz}, fill_value={self.fill_value}>"

    __repr__ = __str__

    # -- get --------------------------------------------------------------------------
    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)

        if all(isinstance(k, Integral) for k in key) and len(key) == self.ndim:
            key = tuple(int(k) + self.shape[i] if int(k) < 0 else int(k) for i, k in enumerate(key))
            for i, k in enumerate(key):
                if k < 0 or k >= self.shape[i]:
                    raise IndexError(f"index {k} is out of bounds for axis {i} with size {self.shape[i]}")
            if key in self.data:
                return self.data[key]
            return np.asarray(self.fill_value, dtype=self.dtype)[()]

        if all(isinstance(k, Integral) for k in key) and len(key) != self.ndim:
            raise IndexError(f"too many indices for array with {self.ndim} dimensions")

        if any(isinstance(k, (list, np.ndarray)) for k in key):
            arrs = [np.asarray(k) for k in key]
            if not all(a.ndim == 1 and np.issubdtype(a.dtype, np.integer) for a in arrs):
                raise IndexError("DOK fancy indices must be 1-D integer arrays.")
            if len(key) != self.ndim:
                raise NotImplementedError(
                    "DOK fancy indexing requires one index array per dimension."
                )
            if len({len(a) for a in arrs}) != 1:
                raise IndexError("DOK fancy index arrays must have equal lengths.")
            return self._fancy_getitem(tuple(arrs))

        return self.to_coo()[key]

    def _fancy_getitem(self, key):
        n = len(key[0])
        out = np.empty(n, dtype=self.dtype)
        for i in range(n):
            out[i] = self[tuple(int(k[i]) for k in key)]
        return COO.from_numpy(out, fill_value=self.fill_value)

    # -- set --------------------------------------------------------------------------
    def __setitem__(self, key, value):
        value = np.asarray(value, dtype=self.dtype_ if self.dtype_ is not None else None)
        if self.dtype_ is None:
            self.dtype_ = value.dtype
            self.fill_value = np.asarray(self.fill_value, dtype=value.dtype)[()]

        if not isinstance(key, tuple):
            key = (key,)

        # fast path: full scalar coordinate
        if len(key) == self.ndim and all(isinstance(k, Integral) for k in key) and value.ndim == 0:
            self._setone(tuple(int(k) for k in key), value[()])
            return

        # fancy: tuple of per-dimension index sequences (reference
        # ``_dok.py:362-394``)
        if all(isinstance(k, (np.ndarray, list, tuple)) for k in key) and key:
            if len(key) != self.ndim:
                raise NotImplementedError(f"Index sequences for all {self.ndim} array dimensions needed!")
            if len({len(k) for k in key}) != 1:
                raise IndexError("Unequal length of index sequences!")
            arrs = [np.asarray(k) for k in key]
            if not all(np.issubdtype(a.dtype, np.integer) for a in arrs):
                raise IndexError("Indices must be sequences of integer types!")
            if arrs[0].ndim != 1:
                raise IndexError("Indices are not 1d sequences!")
            if value.ndim > 1:
                raise ValueError(f"Dimension of values ({value.ndim}) must be 0 or 1!")
            if value.ndim == 1 and value.shape != arrs[0].shape:
                raise ValueError(f"Shape mismatch of indices ({arrs[0].shape}) and values ({value.shape})!")
            vals = np.broadcast_to(value, (len(arrs[0]),))
            for i in range(len(arrs[0])):
                self._setone(tuple(int(a[i]) for a in arrs), vals[i])
            return

        # general: expand slices/ints recursively over an index grid
        self._setitem_general(key, value)

    def _setone(self, coord, value):
        coord = tuple(int(c) + self.shape[i] if int(c) < 0 else int(c) for i, c in enumerate(coord))
        for i, c in enumerate(coord):
            if c < 0 or c >= self.shape[i]:
                raise IndexError(f"index {c} is out of bounds for axis {i} with size {self.shape[i]}")
        if equivalent(np.asarray(value, dtype=self.dtype), np.asarray(self.fill_value, dtype=self.dtype)):
            self.data.pop(coord, None)
        else:
            self.data[coord] = np.asarray(value, dtype=self.dtype)[()]

    def _setitem_general(self, key, value):
        from ..ops.slicing import normalize_index

        key = normalize_index(key, self.shape)
        if any(k is None for k in key):
            raise IndexError("newaxis is not supported in DOK assignment")
        ranges = []
        out_dims = []
        for i, k in enumerate(key):
            if isinstance(k, Integral):
                ranges.append(np.array([int(k)]))
            elif isinstance(k, slice):
                ranges.append(np.arange(k.start, k.stop, k.step))
                out_dims.append(len(ranges[-1]))
            else:
                ranges.append(np.asarray(k))
                out_dims.append(len(ranges[-1]))
        value = np.broadcast_to(value, tuple(out_dims)).reshape(tuple(out_dims))
        grids = np.meshgrid(*ranges, indexing="ij")
        # value shape corresponds to non-integer dims; expand to full grid
        full_value = value.reshape(tuple(len(r) if not isinstance(k, Integral) else 1 for r, k in zip(ranges, key)))
        full_value = np.broadcast_to(full_value, grids[0].shape)

        # vectorized bulk update: one pass building keys + one dict merge
        flat_vals = np.ascontiguousarray(full_value).reshape(-1).astype(self.dtype)
        keys = list(zip(*[g.reshape(-1).tolist() for g in grids]))
        keep = ~equivalent(flat_vals, np.asarray(self.fill_value, dtype=self.dtype))
        if bool(keep.all()):
            self.data.update(zip(keys, list(flat_vals)))
        else:
            vals_list = list(flat_vals)
            for i, k_ in enumerate(keys):
                if keep[i]:
                    self.data[k_] = vals_list[i]
                else:
                    self.data.pop(k_, None)

    def __len__(self):
        if self.ndim == 0:
            raise TypeError("len() of unsized object")
        return self.shape[0]

    def reshape(self, shape, order="C"):
        return self.to_coo().reshape(shape, order=order).asformat("dok")

    def transpose(self, axes=None):
        return self.to_coo().transpose(axes).asformat("dok")

    def _reduce_calc(self, method, axis, keepdims=False, **kwargs):
        return self.to_coo()._reduce_calc(method, axis, keepdims, **kwargs)

    def _reduce_return(self, data, arr_attrs, result_fill_value):
        return COO._reduce_return(self.to_coo(), data, arr_attrs, result_fill_value)

    def copy(self, deep=True):
        out = DOK(self.shape, dtype=self.dtype_, fill_value=self.fill_value)
        out.data = dict(self.data)
        return out
