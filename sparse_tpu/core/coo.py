"""COO — the N-D coordinate sparse format and computational hub.

Storage: ``coords`` with shape ``(ndim, nnz)`` and ``data`` with shape
``(nnz,)``, always kept **canonical**: coordinates sorted in row-major
(C) order, duplicates summed, and (optionally) entries equal to the fill
value pruned. Mirrors the semantics of reference ``_coo/core.py`` (ctor
``:198-291``, ``from_numpy:340``, ``transpose:725``, ``reshape:1034``,
``_sort_indices:1294``, ``_sum_duplicates:1319``) with a TPU-native twist:

- the array is a registered JAX **pytree** (leaves: ``coords``, ``data``,
  ``fill_value``), so COO values flow through ``jit`` / ``pjit`` /
  ``shard_map`` directly;
- canonicalization is vectorized (argsort + segment combine), not a
  sequential Numba loop;
- hot compute paths (matmul, reductions) dispatch to XLA/Pallas kernels in
  ``sparse_tpu.kernels``.
"""

from __future__ import annotations

import warnings
from collections import OrderedDict
from collections.abc import Iterable, Iterator
from numbers import Integral

import numpy as np

import jax

from .. import _settings
from .._utils import can_store, equivalent, index_dtype_for, normalize_axis, zero_of_dtype
from .base import SparseArray


class _LayoutEntry:
    """Entry type for ``COO._cached_layout``: a built kernel layout guarded
    by the identities of the buffers it was derived from.  A dedicated type
    (rather than a bare list) so ``peek_layout`` can recognize entries
    without structural duck-typing."""

    __slots__ = ("bufs", "value")

    def __init__(self, bufs, value):
        self.bufs = bufs
        self.value = value


class _ShapeOnly:
    """Stand-in for the transposed 2-D array in ``_reduce_calc``'s fast path
    (``_reduce_return`` only reads ``.shape``)."""

    def __init__(self, shape):
        self.shape = shape


class COO(SparseArray):
    """N-dimensional coordinate-format sparse array.

    Parameters
    ----------
    coords : array-like (ndim, nnz) or constructor input
        Coordinates, or any of: ndarray, another COO/SparseArray, scipy
        sparse matrix, iterable of ``(coord_tuple, value)``, dict
        ``{coord_tuple: value}``, or scipy-style ``(data, (row, col))``.
    data : array-like (nnz,), optional
    shape : tuple of int, optional (inferred from coords when omitted)
    fill_value : scalar, default 0

    Examples
    --------
    >>> import numpy as np
    >>> import sparse_tpu as sparse
    >>> x = np.array([[0.0, 1.0, 0.0], [2.0, 0.0, 3.0]])
    >>> s = sparse.COO.from_numpy(x)
    >>> s.nnz
    3
    >>> s.todense().tolist()
    [[0.0, 1.0, 0.0], [2.0, 0.0, 3.0]]
    >>> (s * 2).data.tolist()
    [2.0, 4.0, 6.0]
    >>> s.sum(axis=0).todense().tolist()
    [2.0, 1.0, 3.0]
    """

    def __init__(
        self,
        coords,
        data=None,
        shape=None,
        has_duplicates=True,
        sorted=False,
        prune=False,
        cache=False,
        fill_value=None,
        idx_dtype=None,
    ):
        if data is None:
            arr = _interpret_single_arg(coords, shape=shape, fill_value=fill_value)
            if arr is not None:
                self._make_shallow_copy_of(arr)
                if cache:
                    self.enable_caching()
                return
            # (data, (row, col, ...)) scipy-style tuple
            if isinstance(coords, tuple) and len(coords) == 2 and isinstance(coords[1], (tuple, list)):
                data, coords = coords[0], np.stack([np.asarray(c) for c in coords[1]], axis=0)
            else:
                raise ValueError("Cannot interpret input as COO array.")

        self._cache = None
        if cache:
            self.enable_caching()

        coords = np.asarray(coords)
        data = np.asarray(data)
        if coords.ndim == 1:
            if (shape == () or (isinstance(shape, Iterable) and tuple(shape) == ())) and coords.size == 0:
                # 0-d array: COO([], [v], ()) stores v at the empty coordinate
                coords = np.empty((0, data.size), dtype=np.intp)
            else:
                coords = coords[None, :]
        if data.ndim == 0:
            data = np.broadcast_to(data, coords.shape[1]).copy()
        if data.ndim != 1:
            raise ValueError("data must be a scalar or 1-dimensional.")
        if coords.ndim != 2:
            raise ValueError("coords must be 2-dimensional (ndim, nnz)")
        if data.shape[0] != coords.shape[1]:
            raise ValueError(f"data length {data.shape[0]} does not match coords nnz {coords.shape[1]}")

        if shape is None:
            if coords.size:
                shape = tuple(int(m) + 1 for m in coords.max(axis=1))
            else:
                shape = (coords.shape[0]) * (0,) if coords.shape[0] else ()
        if isinstance(shape, Integral):
            shape = (int(shape),)
        shape = tuple(int(s) for s in shape)

        if len(shape) != coords.shape[0]:
            raise ValueError(
                f"The shape of `coords` {coords.shape} does not match ndim of the shape {shape}."
            )

        if coords.size:
            cmax = coords.max(initial=0)
            cmin = coords.min(initial=0)
            if cmin < 0 or any(coords[d].max(initial=0) >= shape[d] for d in range(len(shape))):
                raise IndexError(f"coords out of bounds for shape {shape}")
            del cmax

        max_extent = max(shape) if shape else 0
        if idx_dtype is not None:
            if not can_store(idx_dtype, max_extent):
                raise ValueError(f"cannot cast array with shape {shape} to dtype {idx_dtype}.")
        else:
            idx_dtype = index_dtype_for(max_extent)
            # sub-default input index dtypes are preserved with minimal
            # upcast (uint8 -> uint16), reference idx-dtype minimization
            cur = coords.dtype
            if np.issubdtype(cur, np.integer) and cur.itemsize < np.dtype(idx_dtype).itemsize:
                from .._utils import get_out_dtype

                small = get_out_dtype(cur, max_extent)
                if small.itemsize < np.dtype(idx_dtype).itemsize:
                    idx_dtype = small
        coords = coords.astype(idx_dtype, copy=False)

        self.coords = coords
        self.data = data
        super().__init__(shape, fill_value=fill_value)

        if not sorted or has_duplicates:
            if not self._canonicalize2d_native(sorted):
                lin = np.asarray(self.linear_loc())
                if not sorted:
                    lin = self._sort_indices(lin)
                if has_duplicates:
                    self._sum_duplicates(lin)
        if prune:
            self._prune()

        if _settings.WARN_ON_TOO_DENSE and self.nbytes >= self.size * self.data.dtype.itemsize:
            warnings.warn(
                "Attempting to create a sparse array that takes no less memory than a dense array.",
                RuntimeWarning,
                stacklevel=2,
            )

    # -- fast internal constructor (no canonicalization, tracer-safe) --------------
    @classmethod
    def _make(cls, coords, data, shape, fill_value):
        self = object.__new__(cls)
        self._cache = None
        self.coords = coords
        self.data = data
        self.shape = tuple(int(s) for s in shape)
        self.fill_value = fill_value
        return self

    # -- pickling (caches hold unpicklable deques/closures; dropped) ---------------
    def __getstate__(self):
        return (self.coords, self.data, self.shape, self.fill_value)

    def __setstate__(self, state):
        self.coords, self.data, self.shape, self.fill_value = state
        self._cache = None

    # -- pytree protocol -----------------------------------------------------------
    def tree_flatten(self):
        return (self.coords, self.data, self.fill_value), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        coords, data, fill_value = children
        return cls._make(coords, data, aux, fill_value)

    # -- caching -------------------------------------------------------------------
    def enable_caching(self):
        """Memoize reshape/transpose/tocsr/getitem results (3-deep per op,
        like reference ``_coo/core.py:317-338``)."""
        from collections import defaultdict, deque

        self._cache = defaultdict(lambda: deque(maxlen=3))
        return self

    def _cached(self, op, key, compute):
        if self._cache is None:
            return compute()
        for k, v in self._cache[op]:
            if k == key:
                return v
        value = compute()
        # caching propagates to derived arrays so chains like
        # x[:].reshape(...).transpose().tocsr() return identical objects
        # (reference passes cache=self._cache is not None to every result)
        if isinstance(value, COO) and value._cache is None and value is not self:
            value.enable_caching()
        self._cache[op].append((key, value))
        return value

    def _cached_layout(self, op, key, compute):
        """Layout memo hardened against buffer REPLACEMENT (a.data = new):
        the entry records buffer identities and rebuilds on mismatch.
        In-place element mutation stays outside the contract (same caveat
        as the reference's enable_caching)."""
        if self._cache is None:
            self.enable_caching()
        bufs = (self.coords, self.data)
        entry = self._cached(op, key, lambda: _LayoutEntry(bufs, compute()))
        if any(a is not b for a, b in zip(entry.bufs, bufs)):
            entry.bufs = bufs
            entry.value = compute()
        return entry.value

    def peek_layout(self, op, key):
        """Read an existing layout memo without computing (trace-safe):
        returns the cached layout or ``None``; refuses entries whose
        buffers were replaced.  Used by ``linalg`` to reuse a pre-built
        row-ELL/DIA layout under an outer trace, where building one would
        cache tracers."""
        cache = getattr(self, "_cache", None)
        if not cache or op not in cache:
            return None
        for k, v in cache[op]:
            if k == key and isinstance(v, _LayoutEntry):
                if any(a is not b for a, b in zip(v.bufs, (self.coords, self.data))):
                    return None
                return v.value
        return None

    # -- canonicalization ----------------------------------------------------------
    def linear_loc(self, signed=False):
        """Row-major linearized coordinates, shape ``(nnz,)``."""
        if self.ndim == 0:
            return np.zeros(self.coords.shape[1], dtype=np.intp)
        if self.size > np.iinfo(np.int64).max:
            raise ValueError("Cannot linearize an array with more than 2**63 elements.")
        coords = np.asarray(self.coords)
        out = None
        stride = 1
        for d in range(self.ndim - 1, -1, -1):
            if stride == 1:
                term = coords[d].astype(np.int64)
            else:
                term = np.multiply(coords[d], stride, dtype=np.int64)
            out = term if out is None else np.add(out, term, out=out)
            stride *= self.shape[d]
        return out

    def _canonicalize2d_native(self, already_sorted):
        """Fused sort+dedup via the C++ two-phase kernel (counting-sort by
        row, threaded per-row column sorts — scipy's coo→csr strategy, ~2×
        over the global packed sort at 3M entries). Returns True when it
        handled canonicalization."""
        from ..native import NATIVE_MIN_SIZE
        from ..native import eager as _eager

        if (
            self.ndim != 2
            or already_sorted
            or self.data.dtype not in (np.float64, np.float32)
            or self.coords.shape[1] < NATIVE_MIN_SIZE
            # counting sort allocates O(n_rows); skip hyper-tall matrices
            or self.shape[0] > max(4 * self.coords.shape[1], 1 << 22)
        ):
            return False
        res = _eager.canonicalize2d(self.coords[0], self.coords[1], np.asarray(self.data), self.shape[0])
        if res is None:
            return False
        rows, cols, vals = res
        self.coords = np.stack([rows, cols]).astype(self.coords.dtype, copy=False)
        self.data = vals
        return True

    def _sort_indices(self, lin=None):
        """Sort entries into canonical row-major order. Returns the (possibly
        updated) linearized coordinates so callers can reuse them."""
        from ..native import sort_with_perm

        if lin is None:
            lin = np.asarray(self.linear_loc())
        if lin.size and not _nondecreasing(lin):
            order, lin_sorted = sort_with_perm(lin, max_key=self.size - 1)
            self.coords = self.coords[:, order]
            self.data = self.data[order]
            lin = lin_sorted if lin_sorted is not None else lin[order]
        return lin

    def _sum_duplicates(self, lin=None):
        from ..native import dedup_sum_sorted

        if lin is None:
            lin = np.asarray(self.linear_loc())
        if lin.size == 0:
            return
        unique_mask = np.diff(lin) != 0
        if bool(unique_mask.all()):
            return
        starts, sums = dedup_sum_sorted(lin, np.asarray(self.data))
        self.data = sums
        self.coords = self.coords[:, starts]

    def _prune(self):
        mask = ~equivalent(self.data, np.asarray(self.fill_value, dtype=self.data.dtype))
        if not mask.all():
            self.coords = self.coords[:, mask]
            self.data = self.data[mask]

    # -- constructors ----------------------------------------------------------------
    @classmethod
    def from_numpy(cls, x, fill_value=None, idx_dtype=None):
        x = np.asarray(x)
        if fill_value is None:
            # a 0-d input IS its own fill value (reference _coo/core.py:372):
            # COO.from_numpy(np.int64(5)) has nnz == 0 and fill_value == 5
            fill_value = zero_of_dtype(x.dtype) if x.shape else x[()]
        mask = ~equivalent(x, np.asarray(fill_value, dtype=x.dtype))
        coords = np.stack(np.nonzero(mask), axis=0) if x.ndim else np.empty((0, 1 if mask else 0), dtype=np.intp)
        data = x[mask] if x.ndim else (x[None][mask.reshape(1)] if mask else np.empty(0, dtype=x.dtype))
        if x.ndim == 0:
            data = x.reshape(1)[mask.reshape(1)]
        return cls(
            coords,
            data,
            shape=x.shape,
            fill_value=fill_value,
            has_duplicates=False,
            sorted=True,
            idx_dtype=idx_dtype,
        )

    @classmethod
    def from_scipy_sparse(cls, x, /, *, fill_value=None):
        x = x.tocoo()
        if hasattr(x, "coords"):  # n-D coo_array (scipy >= 1.14)
            coords = np.stack(x.coords, axis=0)
        else:
            coords = np.stack([x.row, x.col], axis=0)
        return cls(
            coords,
            np.asarray(x.data),
            shape=x.shape,
            has_duplicates=not x.has_canonical_format,
            sorted=False,
            fill_value=fill_value,
        )

    @classmethod
    def from_iter(cls, x, shape, fill_value=None, dtype=None):
        if isinstance(x, dict):
            x = list(x.items())
        x = list(x)
        if len(x) == 0:
            ndim = len(shape)
            return cls(
                np.empty((ndim, 0), dtype=np.intp),
                np.empty((0,), dtype=dtype if dtype is not None else np.float64),
                shape=shape,
                fill_value=fill_value,
            )
        if all(isinstance(item, tuple) and len(item) == 2 for item in x):
            coords_list = [np.atleast_1d(np.asarray(c)) for c, _ in x]
            coords = np.stack(coords_list, axis=1)
            data = np.asarray([v for _, v in x], dtype=dtype)
        else:
            raise ValueError("Invalid iterable to convert to COO.")
        return cls(coords, data, shape=shape, fill_value=fill_value)

    @classmethod
    def from_jax(cls, coords, data, shape, fill_value=None, **kwargs):
        """Construct from device arrays without leaving the device; eager
        canonicalization still runs on host copies of the coords."""
        return cls(np.asarray(coords), np.asarray(data), shape=shape, fill_value=fill_value, **kwargs)

    # -- properties ------------------------------------------------------------------
    @property
    def dtype(self):
        return np.asarray(self.data).dtype if not hasattr(self.data, "dtype") else self.data.dtype

    @property
    def nnz(self):
        return int(self.coords.shape[1])

    @property
    def nbytes(self):
        return self.data.nbytes + self.coords.nbytes

    @property
    def format(self):
        return "coo"

    @property
    def T(self):
        return self.transpose()

    @property
    def mT(self):
        if self.ndim < 2:
            raise ValueError("Cannot compute matrix transpose if `ndim < 2`.")
        axes = list(range(self.ndim))
        axes[-1], axes[-2] = axes[-2], axes[-1]
        return self.transpose(tuple(axes))

    def __len__(self):
        if self.ndim == 0:
            raise TypeError("len() of unsized object")
        return self.shape[0]

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self[i]

    def __str__(self):
        summary = (
            f"<COO: shape={self.shape}, dtype={self.dtype}, nnz={self.nnz}, fill_value={self.fill_value}>"
        )
        return summary

    __repr__ = __str__

    def __getitem__(self, index):
        from ..ops.indexing import getitem

        if self._cache is not None:
            try:
                hash(index)
                hashable = True
            except TypeError:
                hashable = False
            if hashable:
                return self._cached("getitem", index, lambda: getitem(self, index))
        return getitem(self, index)

    # -- densify ---------------------------------------------------------------------
    def todense(self):
        out = np.full(self.shape, np.asarray(self.fill_value), dtype=self.dtype)
        coords = np.asarray(self.coords)
        data = np.asarray(self.data)
        if self.ndim:
            out[tuple(coords)] = data
        elif data.size:
            # data[-1] may be a bare Python object for object-dtype arrays
            out = np.asarray(data[-1], dtype=self.dtype).reshape(())
        return out


    # -- conversions -------------------------------------------------------------------
    def asformat(self, format, **kwargs):
        from .._utils import convert_format
        from .gcxs import GCXS

        format = convert_format(format)
        if format == "coo":
            return self
        if format == "gcxs":
            return GCXS.from_coo(self, **kwargs)
        if format in ("csr", "csc"):
            from .gcxs import CSC, CSR

            if self.ndim != 2:
                raise ValueError(f"{format} is only valid for 2-D arrays")
            return (CSR if format == "csr" else CSC)(GCXS.from_coo(self, compressed_axes=(0 if format == "csr" else 1,)))
        if format == "dok":
            from .dok import DOK

            return DOK.from_coo(self, **kwargs)
        raise NotImplementedError(f"The given format {format} is not supported.")

    def tocoo(self):
        return self

    def to_scipy_sparse(self, /, *, accept_fv=None):
        import scipy.sparse

        from .._utils import check_fill_value

        if accept_fv is None:
            accept_fv = [0]
        check_fill_value(self, accept_fv, func_name="to_scipy_sparse")
        coords = np.asarray(self.coords)
        # scipy.sparse.coo_array supports n-D arrays (scipy >= 1.14)
        return scipy.sparse.coo_array((np.asarray(self.data), tuple(coords)), shape=self.shape)

    def _tocsr_csc(self, kind):
        import scipy.sparse

        from .._utils import check_fill_value

        check_fill_value(self, [0], func_name="tocsr" if kind == "csr" else "tocsc")
        if self.ndim != 2:
            raise ValueError("Can only convert a 2-dimensional array to a Scipy sparse matrix.")
        coords = np.asarray(self.coords)
        data = np.asarray(self.data)
        if kind == "csr":
            # canonical row-major order IS csr order: indptr is one bincount
            from ..native import build_indptr

            memo = getattr(self, "_indptr_memo", None)
            if memo is not None and memo[0] is self.coords:
                indptr = memo[1]
            else:
                indptr = build_indptr(coords[0], self.shape[0])
                self._indptr_memo = (self.coords, indptr)
            indices = coords[1]
            if indices.dtype.itemsize < 4:
                indices = indices.astype(np.int32)
            m = scipy.sparse.csr_array((data, indices, indptr), shape=self.shape, copy=False)
            m.has_canonical_format = True
            return m
        from ..native import eager as _eager

        res = (
            _eager.transpose2d(coords[0], coords[1], data, self.shape[1], want_rows=False)
            if self.nnz
            else None
        )
        if res is not None:
            indptr, _, row_ids, vals = res
            m = scipy.sparse.csc_array((vals, row_ids, indptr), shape=self.shape, copy=False)
            m.has_canonical_format = True
            return m
        return self.to_scipy_sparse().tocsc()

    def tocsr(self):
        return self._cached("tocsr", None, lambda: self._tocsr_csc("csr"))

    def tocsc(self):
        return self._cached("tocsc", None, lambda: self._tocsr_csc("csc"))

    def _csc_buffers(self):
        """``(indptr, row_ids, vals)`` — the CSC of a canonical 2-D COO,
        equivalently the CSR buffers of its transpose (native counting
        scatter, no sort). None when the native library is unavailable or
        the dtype isn't f32/f64. Memoized on the instance (buffers are
        immutable after construction; the memo costs one extra
        indices+data copy, the price scipy users pay for holding a
        csr/csc pair)."""
        memo = getattr(self, "_csc_memo", None)
        if memo is not None and memo[0] is self.coords:
            return memo[1]
        from ..native import eager as _eager

        coords = np.asarray(self.coords)
        res = _eager.transpose2d(coords[0], coords[1], np.asarray(self.data), self.shape[1], want_rows=False)
        if res is None:
            out = None
        else:
            indptr, _, row_ids, vals = res
            out = (indptr, row_ids, vals)
        self._csc_memo = (self.coords, out)
        return out

    # -- structural ops -----------------------------------------------------------------
    def transpose(self, axes=None):
        if axes is None:
            axes = tuple(reversed(range(self.ndim)))
        axes = normalize_axis(axes, self.ndim)
        if not isinstance(axes, tuple):
            axes = (axes,)
        if len(np.unique(axes)) != len(axes) or len(axes) != self.ndim:
            raise ValueError("repeated or incomplete axis in transpose")
        if axes == tuple(range(self.ndim)):
            return self

        def compute():
            from ..native import eager as _eager

            shape = tuple(self.shape[ax] for ax in axes)
            # canonical order sorts ties by row within each column, so the
            # 2-D transpose is one stable counting scatter — no sort at all
            if (
                axes == (1, 0)
                and not self.data.dtype.hasobject
                and self.nnz >= 4096
                and self.shape[1] <= max(4 * self.nnz, 1 << 22)
            ):
                src = np.asarray(self.coords)
                res = _eager.transpose2d(src[0], src[1], np.asarray(self.data), self.shape[1])
                if res is not None:
                    indptr_t, rows_t, cols_t, vals = res
                    new_coords = np.stack([rows_t, cols_t]).astype(src.dtype, copy=False)
                    out = COO._make(new_coords, vals, shape, self.fill_value)
                    # the counting scatter computed the result's row indptr
                    # as a byproduct — seed the memo so tocsr()/matmul skip
                    # rebuilding it
                    out._indptr_memo = (out.coords, indptr_t)
                    return out
            coords = np.asarray(self.coords)[list(axes), :]
            # coords are known in-bounds and dedup'd; only the re-sort is
            # needed — skip the ctor's validation passes via the native
            # two-phase kernel when available
            if (
                len(shape) == 2
                and self.data.dtype in (np.float64, np.float32)
                and coords.shape[1] >= 4096
                and shape[0] <= max(4 * coords.shape[1], 1 << 22)
            ):
                res = _eager.canonicalize2d(coords[0], coords[1], np.asarray(self.data), shape[0])
                if res is not None:
                    rows, cols_, vals = res
                    new_coords = np.stack([rows, cols_]).astype(coords.dtype, copy=False)
                    return COO._make(new_coords, vals, shape, self.fill_value)
            return COO(
                coords,
                self.data,
                shape=shape,
                has_duplicates=False,
                fill_value=self.fill_value,
            )

        return self._cached("transpose", axes, compute)

    def swapaxes(self, axis1, axis2):
        axis1 = normalize_axis(axis1, self.ndim)
        axis2 = normalize_axis(axis2, self.ndim)
        axes = list(range(self.ndim))
        axes[axis1], axes[axis2] = axes[axis2], axes[axis1]
        return self.transpose(tuple(axes))

    def reshape(self, shape, order="C"):
        shape = tuple(shape) if isinstance(shape, Iterable) else (shape,)
        if order not in ("C", None):
            raise NotImplementedError("The `order` parameter is not supported")
        if any(d == -1 for d in shape):
            extra = int(self.size / np.prod([d for d in shape if d != -1], dtype=np.float64)) if self.size else 0
            shape = tuple([d if d != -1 else extra for d in shape])
        if self.shape == shape:
            return self
        if self.size != np.prod(shape, dtype=np.float64):
            raise ValueError(f"cannot reshape array of size {self.size} into shape {shape}")

        def compute():
            from ..native import eager as _eager

            from .._utils import get_out_dtype

            # keep small input index dtypes, minimal upcast (uint8 -> uint16)
            idx_dtype = get_out_dtype(np.asarray(self.coords).dtype, max(shape) if shape else 0)
            # 2-D -> 2-D with one column count dividing the other: the new
            # coordinates are direct digit arithmetic on the old (no 64-bit
            # linearization round trip) — the common matrix split/merge case
            if self.ndim == 2 and len(shape) == 2 and self.nnz and all(shape):
                k_old, k_new = self.shape[1], shape[1]
                r = np.asarray(self.coords[0])
                c = np.asarray(self.coords[1])
                coords2 = None
                if k_old % k_new == 0:
                    q = k_old // k_new
                    coords2 = np.empty((2, self.nnz), dtype=idx_dtype)
                    np.floor_divide(c, k_new, out=coords2[1], casting="unsafe")
                    # NEP 50: r * q would evaluate in the (possibly narrow)
                    # input coords dtype and wrap before the cast to out —
                    # promote r to idx_dtype first so the product is exact.
                    np.multiply(r.astype(idx_dtype, copy=False), q, out=coords2[0], casting="unsafe")
                    coords2[0] += coords2[1]
                    np.mod(c, k_new, out=coords2[1], casting="unsafe")
                elif k_new % k_old == 0:
                    q = k_new // k_old
                    coords2 = np.empty((2, self.nnz), dtype=idx_dtype)
                    np.floor_divide(r, q, out=coords2[0], casting="unsafe")
                    np.mod(r, q, out=coords2[1], casting="unsafe")
                    coords2[1] *= k_old
                    coords2[1] += c.astype(idx_dtype, copy=False)
                if coords2 is not None:
                    # provably canonical: the digit arithmetic preserves the
                    # linearization (r*k_old + c == r2*k_new + c2), so order,
                    # uniqueness, and bounds all carry over — skip the ctor's
                    # validation scans (_make), they were ~25% of reshape
                    return COO._make(coords2, self.data, shape, self.fill_value)

            lin = self.linear_loc()
            native = (
                _eager.unravel(lin, shape)
                if self.nnz >= _eager.NATIVE_MIN_NNZ and all(shape)
                else None
            )
            if native is not None:
                coords = native.astype(idx_dtype, copy=False)
            else:
                coords = np.empty((len(shape), self.nnz), dtype=idx_dtype)
                strides = 1
                for d in range(len(shape) - 1, -1, -1):
                    coords[d] = (lin // strides) % shape[d]
                    strides *= shape[d]
            return COO(
                coords,
                self.data,
                shape=shape,
                has_duplicates=False,
                sorted=True,
                fill_value=self.fill_value,
            )

        return self._cached("reshape", shape, compute)

    def squeeze(self, axis=None):
        if axis is None:
            axis = tuple(i for i, d in enumerate(self.shape) if d == 1)
        else:
            if isinstance(axis, Integral):
                axis = (int(axis),)
            elif not isinstance(axis, Iterable):
                raise ValueError(f"Invalid axis parameter: `{axis}`.")
            axis = normalize_axis(axis, self.ndim)
            for ax in axis:
                if self.shape[ax] != 1:
                    raise ValueError(f"Specified axis `{ax}` has a size greater than one: {self.shape[ax]}")
        new_shape = tuple(d for i, d in enumerate(self.shape) if i not in axis)
        return self.reshape(new_shape)

    def flatten(self, order="C"):
        return self.reshape(-1, order=order)

    def broadcast_to(self, shape):
        from ..ops.elemwise import broadcast_to

        return broadcast_to(self, shape)

    def resize(self, *args, refcheck=True, coords_dtype=np.intp):
        # in-place resize, mirrors np.ndarray.resize truncation semantics
        if len(args) == 1 and isinstance(args[0], tuple):
            shape = args[0]
        else:
            shape = args
        new_size = int(np.prod(shape, dtype=np.float64))
        lin = self.linear_loc()
        mask = lin < new_size
        lin = lin[mask]
        idx_dtype = index_dtype_for(max(shape) if shape else 0)
        coords = np.empty((len(shape), lin.size), dtype=idx_dtype)
        strides = 1
        for d in range(len(shape) - 1, -1, -1):
            coords[d] = (lin // strides) % shape[d]
            strides *= shape[d]
        self.coords = coords
        self.data = self.data[mask]
        self.shape = tuple(int(s) for s in shape)

    # -- reduce plumbing ---------------------------------------------------------------
    def _reduce_calc(self, method, axis, keepdims=False, **kwargs):
        if set(axis) == set(range(self.ndim)):
            result = method.reduce(np.asarray(self.data), **kwargs) if self.nnz else self.fill_value
            if self.nnz != self.size:
                if method in (np.add, np.multiply) or equivalent(
                    method(self.fill_value, self.fill_value), self.fill_value
                ):
                    from .base import _reduce_super_ufunc

                    sup = _reduce_super_ufunc.get(method)
                    if sup is not None:
                        result = method(result, sup(self.fill_value, self.size - self.nnz)) if self.nnz else sup(
                            self.fill_value, self.size
                        )
                    elif self.nnz:
                        result = method(result, self.fill_value, **kwargs)
                    else:
                        result = self.fill_value
            if kwargs.get("dtype") is not None:
                result = np.asarray(result).astype(kwargs["dtype"])
            return (np.asarray(result)[()],)

        neg_axis = tuple(ax for ax in range(self.ndim) if ax not in set(axis))
        neg_shape = tuple(self.shape[ax] for ax in neg_axis)
        keep = int(np.prod(neg_shape, dtype=np.float64))
        red = int(np.prod([self.shape[ax] for ax in axis], dtype=np.float64))

        # add-reduction needs no grouping order: accumulate over the kept-axes
        # key directly (bincount/add.at) instead of re-sorting via transpose —
        # ~15x on sum(axis=0) at 20k^2 (scipy does the same)
        _zero_fill = bool(np.all(np.asarray(self.fill_value) == 0))
        if (
            method is np.add
            and all(k == "dtype" and v is None for k, v in kwargs.items())
            and self.nnz
            and keep <= max(16 * self.nnz, 1 << 22)
            and self.data.dtype.kind in "fiu"
            # leading kept axes mean the transpose below is a no-op and the
            # exactly-ordered reduceat path wins — EXCEPT when the fused
            # counts-free compact kernel applies (zero fill, float data):
            # sorted keys stream through it sequentially and it also fuses
            # the output compaction/prune
            and (
                neg_axis != tuple(range(len(neg_axis)))
                or (_zero_fill and self.data.dtype in (np.float64, np.float32))
            )
        ):
            if len(neg_axis) == 1:
                # keep the raw coordinate dtype: the native kernels take
                # int32 keys directly (saves the cast copy on the hot path)
                keys = np.asarray(self.coords[neg_axis[0]])
            else:
                keys = np.zeros(self.nnz, dtype=np.int64)
                stride = 1
                for ax in reversed(neg_axis):
                    keys += np.asarray(self.coords[ax]).astype(np.int64) * stride
                    stride *= self.shape[ax]
            data_np = np.asarray(self.data)
            # np.add.reduce promotes small ints (uint8 sums to uint64 etc.)
            acc_dtype = np.add.reduce(np.empty(0, dtype=data_np.dtype)).dtype
            if _zero_fill and data_np.dtype in (np.float64, np.float32):
                # counts-free: with zero fill the reduce driver never reads
                # counts (missing positions contribute the add identity),
                # and bins summing to (+/-)0 are exactly what the pruned
                # result drops — one fused pass replaces bincounts,
                # flatnonzero, the gather, AND the output COO's prune
                from ..native import eager as _eager

                if neg_axis == tuple(range(len(neg_axis))):
                    # leading kept axes => keys ascending (canonical row-major
                    # order): the run-unrolled one-pass kernel beats the
                    # bincount form, which is FP-add-latency-bound on
                    # consecutive same-bin adds
                    compact = _eager.sorted_reduce_compact(keys, data_np, max_runs=keep)
                else:
                    compact = _eager.bincount_sum_compact(keys, data_np, keep)
                if compact is not None:
                    inv_idx, result = compact
                    arr_attrs = (_ShapeOnly((keep, red)), neg_shape, inv_idx, True)
                    return result, None, axis, red, arr_attrs
            native = None
            if data_np.dtype in (np.float64, np.float32):
                from ..native import eager as _eager

                native = _eager.bincount_sum(keys, data_np, keep)
            if native is not None:
                sums, counts_full = native
            else:
                counts_full = np.bincount(keys, minlength=keep)
                if data_np.dtype == np.float64:
                    sums = np.bincount(keys, weights=data_np, minlength=keep)
                else:
                    sums = np.zeros(keep, dtype=acc_dtype)
                    np.add.at(sums, keys, data_np)
            inv_idx = np.flatnonzero(counts_full)
            result = sums[inv_idx].astype(acc_dtype, copy=False)
            counts = counts_full[inv_idx]
            arr_attrs = (_ShapeOnly((keep, red)), neg_shape, inv_idx)
            return result, counts, axis, red, arr_attrs

        a = self.transpose(neg_axis + tuple(axis))
        a = a.reshape((keep, red))

        rows = np.asarray(a.coords[0])
        data = np.asarray(a.data)
        if (
            rows.size
            and method is np.add
            and all(k == "dtype" and v is None for k, v in kwargs.items())
            and data.dtype in (np.float64, np.float32)
        ):
            from ..native import eager as _eager

            native = _eager.row_reduce_sorted(rows, data)
            if native is not None:
                inv_idx, result, counts = native
                return result, counts, axis, a.shape[1], (a, neg_shape, inv_idx.astype(rows.dtype, copy=False))
        if rows.size:
            starts = np.flatnonzero(np.concatenate([[True], np.diff(rows) != 0]))
            inv_idx = rows[starts]
            counts = np.diff(np.concatenate([starts, [rows.size]]))
            result = method.reduceat(data, starts, **{k: v for k, v in kwargs.items() if k != "keepdims"})
            if "dtype" in kwargs and kwargs["dtype"] is not None:
                result = result.astype(kwargs["dtype"])
        else:
            inv_idx = np.empty(0, dtype=rows.dtype)
            counts = np.empty(0, dtype=np.intp)
            dtype = kwargs.get("dtype") or method.reduce(np.ones(1, dtype=data.dtype)).dtype
            result = np.empty(0, dtype=dtype)
        arr_attrs = (a, neg_shape, inv_idx)
        n_cols = a.shape[1]
        return result, counts, axis, n_cols, arr_attrs

    def _reduce_return(self, data, arr_attrs, result_fill_value):
        a, neg_shape, inv_idx = arr_attrs[:3]
        if len(arr_attrs) > 3 and arr_attrs[3]:
            # already canonical AND pruned (the fused compact path):
            # skip construction-time validation and the prune pass
            idx_dtype = index_dtype_for(a.shape[0])
            out = COO._make(
                np.ascontiguousarray(inv_idx[None, :].astype(idx_dtype, copy=False)),
                data,
                (a.shape[0],),
                result_fill_value,
            )
        else:
            out = COO(
                inv_idx[None, :],
                data,
                shape=(a.shape[0],),
                has_duplicates=False,
                sorted=True,
                prune=True,
                fill_value=result_fill_value,
            )
        return out.reshape(neg_shape)

    def nonzero(self):
        """Indices of stored non-zero elements (requires zero fill)."""
        from ..ops.common import nonzero

        return nonzero(self)

    def to_block_ell(self, block_rows=128):
        """Cached block-ELL layout for the TPU SpMM fast path
        (``kernels.ell_spmm``); requires a 2-D zero-fill matrix."""
        from .._utils import check_zero_fill_value
        from ..kernels.ell import build_block_ell

        if self.ndim != 2:
            raise ValueError("block-ELL requires a 2-D matrix")
        check_zero_fill_value(self, func_name="to_block_ell")

        def compute():
            coords = np.asarray(self.coords)
            return build_block_ell(
                coords[0], coords[1], np.asarray(self.data), self.shape[0], self.shape[1], block_rows=block_rows
            )

        return self._cached_layout("block_ell", block_rows, compute)

    def to_row_ell(self, min_pad=8, max_tiers=None, group=16):
        """Cached degree-sorted per-row ELL layout — the TPU unstructured
        SpMM/SpMV fast path (``kernels.row_ell_spmm``); requires a 2-D
        zero-fill matrix.  ``group=16`` (default) builds the exact-width
        grouped ``(r/G, w, G)`` layout; ``group=0`` the legacy ``(r, w)``."""
        from .._utils import check_zero_fill_value
        from ..kernels.row_ell import build_row_ell

        if self.ndim != 2:
            raise ValueError("row-ELL requires a 2-D matrix")
        check_zero_fill_value(self, func_name="to_row_ell")

        def compute():
            coords = np.asarray(self.coords)
            return build_row_ell(
                coords[0],
                coords[1],
                np.asarray(self.data),
                self.shape[0],
                self.shape[1],
                min_pad=min_pad,
                max_tiers=max_tiers,
                group=group,
            )

        from ..kernels.row_ell import row_ell_cache_key

        return self._cached_layout("row_ell", row_ell_cache_key(min_pad, max_tiers, group), compute)

    def to_dia(self, max_bands=64, max_fill=8.0):
        """Cached DIA (banded) layout, or ``None`` when the matrix isn't
        usefully banded. The TPU-optimal layout for stencil matrices: the
        matvec becomes static shifts + multiply-adds (``kernels.dia_spmv``),
        no gathers."""
        from .._utils import check_zero_fill_value
        from ..kernels.dia import build_dia

        if self.ndim != 2 or self.shape[0] != self.shape[1]:
            return None
        check_zero_fill_value(self, func_name="to_dia")

        def compute():
            coords = np.asarray(self.coords)
            return build_dia(
                coords[0], coords[1], np.asarray(self.data), self.shape[0], max_bands=max_bands, max_fill=max_fill
            )

        return self._cached_layout("dia", (max_bands, max_fill), compute)

    # -- jax.experimental.sparse interop ------------------------------------------------
    def to_bcoo(self):
        """Convert to a ``jax.experimental.sparse.BCOO`` (zero fill only) —
        for interop with jax's builtin sparse ops and sparsify transform."""
        from jax.experimental import sparse as jsparse

        from .._utils import check_zero_fill_value

        check_zero_fill_value(self, func_name="to_bcoo")
        import jax.numpy as jnp

        return jsparse.BCOO(
            (jnp.asarray(self.data), jnp.asarray(np.asarray(self.coords).T)),
            shape=self.shape,
            indices_sorted=True,
            unique_indices=True,
        )

    @classmethod
    def from_bcoo(cls, b, fill_value=None):
        """Construct from a ``jax.experimental.sparse.BCOO``."""
        return cls(
            np.asarray(b.indices).T,
            np.asarray(b.data),
            shape=b.shape,
            fill_value=fill_value,
            has_duplicates=not b.unique_indices,
            sorted=b.indices_sorted,
        )

    # -- linalg ------------------------------------------------------------------------
    def dot(self, other):
        from ..ops.dot import dot

        return dot(self, other)

    def __dask_tokenize__(self):
        from dask.base import normalize_token

        return normalize_token((type(self), np.asarray(self.coords), np.asarray(self.data), self.shape, self.fill_value))

    def copy(self, deep=True):
        if deep:
            return COO._make(
                np.array(self.coords, copy=True), np.array(self.data, copy=True), self.shape, self.fill_value
            )
        return COO._make(self.coords, self.data, self.shape, self.fill_value)



def _nondecreasing(lin):
    return bool((np.diff(lin) >= 0).all()) if lin.size > 1 else True


def _interpret_single_arg(coords, shape, fill_value):
    """Handle COO(x) for x: COO / SparseArray / ndarray / scipy / iterable."""
    import scipy.sparse

    from .base import SparseArray as _SA

    if isinstance(coords, COO):
        arr = coords
        if shape is not None and tuple(shape) != arr.shape:
            raise ValueError("Cannot change shape when converting to COO; use reshape")
        if fill_value is not None and not np.all(equivalent(np.asarray(fill_value), np.asarray(arr.fill_value))):
            arr = COO._make(arr.coords, arr.data, arr.shape, np.asarray(fill_value, dtype=arr.dtype)[()])
        return arr
    if isinstance(coords, _SA):
        return _interpret_single_arg(coords.tocoo() if hasattr(coords, "tocoo") else COO.from_numpy(coords.todense()), shape, fill_value)
    if isinstance(coords, np.ndarray) and coords.ndim != 2:
        return COO.from_numpy(coords, fill_value=fill_value)
    if isinstance(coords, np.ndarray) and shape is not None and len(shape) != 2:
        # explicitly shaped: treat 2-D array as dense values only if shape says so
        if coords.shape == tuple(shape):
            return COO.from_numpy(coords, fill_value=fill_value)
        return None
    if isinstance(coords, np.ndarray) and shape is None and coords.ndim == 2:
        # ambiguous: reference treats a bare 2-D ndarray as dense input
        return COO.from_numpy(coords, fill_value=fill_value)
    if scipy.sparse.issparse(coords):
        return COO.from_scipy_sparse(coords, fill_value=fill_value)
    if isinstance(coords, (dict, list)) and shape is not None and not (
        isinstance(coords, list) and coords and isinstance(coords[0], (int, float, np.generic))
    ):
        if isinstance(coords, list) and coords and not isinstance(coords[0], tuple):
            return None
        return COO.from_iter(coords, shape=shape, fill_value=fill_value)
    if isinstance(coords, Iterable) and not isinstance(coords, (tuple, np.ndarray)):
        coords = list(coords)
        if coords and isinstance(coords[0], tuple):
            if shape is None:
                raise ValueError("shape must be provided when constructing from an iterable")
            return COO.from_iter(coords, shape=shape, fill_value=fill_value)
        return None
    return None


jax.tree_util.register_pytree_node(
    COO, lambda x: x.tree_flatten(), lambda aux, children: COO.tree_unflatten(aux, children)
)

# jax.export serving artifacts: make exported functions over COO pytrees
# serializable (aux data = the static shape tuple)
try:
    import json

    from jax import export as _jax_export

    _jax_export.register_pytree_node_serialization(
        COO,
        serialized_name="sparse_tpu.COO",
        serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda b: tuple(json.loads(b.decode())),
    )
except (ImportError, AttributeError):  # pragma: no cover - older jax
    pass
