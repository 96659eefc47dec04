"""GCXS — generalized compressed sparse format for N dimensions, with 2-D
specializations CSR and CSC.

Layout (mirroring reference ``_compressed/compressed.py:25-77``): choose a
subset ``compressed_axes`` of the dimensions; logically transpose the array
so those axes lead; flatten to a 2-D matrix of shape ``(row_size, col_size)``
where ``row_size = prod(shape[a] for a in compressed_axes)``; store that
matrix as CSR (``data`` / ``indices`` / ``indptr``).

All conversions are vectorized linearize → argsort → bincount/cumsum passes
(the TPU-friendly form of ``_compressed/convert.py``'s Numba kernels). Like
COO, GCXS is a registered JAX pytree.
"""

from __future__ import annotations

from collections.abc import Iterable
from numbers import Integral

import numpy as np

import jax

from .._utils import equivalent, index_dtype_for, normalize_axis, zero_of_dtype
from .base import SparseArray
from .coo import COO


_NATIVE_REDUCE = object()  # sentinel marking the indptr-native reduce path


def _validate_compressed_axes(shape, compressed_axes):
    ndim = len(shape)
    if ndim == 0:
        if compressed_axes is not None and tuple(compressed_axes) != ():
            raise ValueError("no axes to compress for 0d array")
        return ()
    if ndim == 1:
        if compressed_axes is not None and tuple(compressed_axes) not in ((), (0,)):
            raise ValueError("compressed_axes must be None for 1-D arrays")
        return ()
    if compressed_axes is None:
        return (int(np.argmin(shape)),)
    compressed_axes = normalize_axis(tuple(compressed_axes), ndim)
    if len(compressed_axes) == 0 or len(compressed_axes) >= ndim:
        raise ValueError("compressed_axes must be a proper non-empty subset of the axes")
    if len(set(compressed_axes)) != len(compressed_axes):
        raise ValueError("repeated axis in compressed_axes")
    return tuple(sorted(compressed_axes))


class GCXS(SparseArray):
    """Generalized CSR/CSC sparse array.

    Construct from a COO/ndarray/scipy matrix, or from the raw
    ``(data, indices, indptr)`` triple.

    Examples
    --------
    >>> import numpy as np
    >>> import sparse_tpu as sparse
    >>> x = np.array([[0.0, 1.0], [2.0, 0.0], [0.0, 3.0]])
    >>> g = sparse.GCXS.from_numpy(x, compressed_axes=(0,))
    >>> g.indptr.tolist()
    [0, 1, 2, 3]
    >>> g.indices.tolist()
    [1, 0, 1]
    >>> g.sum(axis=1).todense().tolist()
    [1.0, 2.0, 3.0]
    """

    def __init__(self, arg, shape=None, compressed_axes=None, prune=False, fill_value=None, idx_dtype=None):
        import scipy.sparse

        if isinstance(arg, GCXS):
            if compressed_axes is not None and tuple(compressed_axes) != arg.compressed_axes:
                arg = arg.change_compressed_axes(compressed_axes)
            self._make_shallow_copy_of(arg)
            if fill_value is not None and not np.all(equivalent(np.asarray(fill_value), np.asarray(self.fill_value))):
                self.fill_value = np.asarray(fill_value, dtype=self.dtype)[()]
            return
        if isinstance(arg, np.ndarray):
            coo = COO.from_numpy(arg, fill_value=fill_value)
            self._make_shallow_copy_of(GCXS.from_coo(coo, compressed_axes=compressed_axes, idx_dtype=idx_dtype))
            return
        if scipy.sparse.issparse(arg):
            coo = COO.from_scipy_sparse(arg, fill_value=fill_value)
            self._make_shallow_copy_of(GCXS.from_coo(coo, compressed_axes=compressed_axes, idx_dtype=idx_dtype))
            return
        if isinstance(arg, SparseArray):
            coo = arg.tocoo() if hasattr(arg, "tocoo") else COO.from_numpy(arg.todense(), fill_value=arg.fill_value)
            self._make_shallow_copy_of(GCXS.from_coo(coo, compressed_axes=compressed_axes, idx_dtype=idx_dtype))
            return
        if isinstance(arg, tuple) and len(arg) == 3:
            data, indices, indptr = arg
            if shape is None:
                raise ValueError("shape must be provided when constructing from (data, indices, indptr)")
            compressed_axes = _validate_compressed_axes(shape, compressed_axes)
            self.data = np.asarray(data)
            self.indices = np.asarray(indices)
            self.indptr = np.asarray(indptr)
            self.compressed_axes = compressed_axes
            super().__init__(shape, fill_value=fill_value)
            if prune:
                self._prune()
            return
        raise ValueError(f"Invalid inputs to GCXS: {type(arg)}")

    # -- fast internal constructor -------------------------------------------------
    @classmethod
    def _make(cls, data, indices, indptr, shape, compressed_axes, fill_value):
        self = object.__new__(cls)
        self.data = data
        self.indices = indices
        self.indptr = indptr
        self.shape = tuple(int(s) for s in shape)
        self.compressed_axes = tuple(compressed_axes)
        self.fill_value = fill_value
        return self

    # -- memoization (same shape as COO's: layouts + solver programs) ---------------
    def enable_caching(self):
        from collections import defaultdict, deque

        self._cache = defaultdict(lambda: deque(maxlen=3))
        return self

    def _cached(self, op, key, compute):
        cache = getattr(self, "_cache", None)
        if cache is None:
            return compute()
        for k, v in cache[op]:
            if k == key:
                return v
        value = compute()
        cache[op].append((key, value))
        return value

    # caches hold unpicklable deques/closures; dropped on pickle
    def __getstate__(self):
        return (self.data, self.indices, self.indptr, self.shape, self.compressed_axes, self.fill_value)

    def __setstate__(self, state):
        self.data, self.indices, self.indptr, self.shape, self.compressed_axes, self.fill_value = state

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr, self.fill_value), (self.shape, self.compressed_axes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, indices, indptr, fill_value = children
        shape, compressed_axes = aux
        return cls._make(data, indices, indptr, shape, compressed_axes, fill_value)

    # -- axis bookkeeping ------------------------------------------------------------
    @property
    def _axis_order(self):
        """(compressed axes..., uncompressed axes...) permutation."""
        comp = self.compressed_axes
        uncomp = tuple(a for a in range(self.ndim) if a not in comp)
        return comp + uncomp

    @property
    def _compressed_shape(self):
        comp = self.compressed_axes
        row_size = int(np.prod([self.shape[a] for a in comp], dtype=np.float64)) if comp else 1
        col_size = int(np.prod([self.shape[a] for a in range(self.ndim) if a not in comp], dtype=np.float64))
        return (row_size, col_size)

    # -- constructors ------------------------------------------------------------------
    @classmethod
    def from_coo(cls, x, compressed_axes=None, idx_dtype=None):
        compressed_axes = _validate_compressed_axes(x.shape, compressed_axes)
        coords = np.asarray(x.coords)
        data = np.asarray(x.data)

        comp = compressed_axes
        uncomp = tuple(a for a in range(x.ndim) if a not in comp)
        comp_shape = tuple(x.shape[a] for a in comp)
        uncomp_shape = tuple(x.shape[a] for a in uncomp)
        row_size = int(np.prod(comp_shape, dtype=np.float64)) if comp else 1
        col_size = int(np.prod(uncomp_shape, dtype=np.float64)) if uncomp else 1

        if x.ndim == 0:
            rows = np.zeros(x.nnz, dtype=np.int64)
            cols = np.zeros(x.nnz, dtype=np.int64)
        else:
            # single-axis groups skip the ravel (plain view/astype)
            if len(comp) == 1:
                rows = coords[comp[0]].astype(np.int64, copy=False)
            elif comp:
                rows = np.ravel_multi_index(tuple(coords[list(comp)]), comp_shape).astype(np.int64)
            else:
                rows = np.zeros(coords.shape[1], dtype=np.int64)
            if len(uncomp) == 1:
                cols = coords[uncomp[0]].astype(np.int64, copy=False)
            elif uncomp:
                cols = np.ravel_multi_index(tuple(coords[list(uncomp)]), uncomp_shape).astype(np.int64)
            else:
                cols = np.zeros(coords.shape[1], dtype=np.int64)

        limit = max(row_size, col_size, x.nnz)
        if idx_dtype is not None:
            from .._utils import can_store

            if not can_store(idx_dtype, limit):
                raise ValueError(
                    f"cannot store array with the compressed shape {(row_size, col_size)} "
                    f"and nnz {x.nnz} with dtype {idx_dtype}."
                )
        else:
            # keep the COO's index dtype when it can address the compressed
            # layout; minimal upcast otherwise (reference
            # ``_compressed/compressed.py:53-61``)
            from .._utils import get_out_dtype

            idx_dtype = get_out_dtype(coords.dtype, limit)

        # a canonical COO is already sorted by (comp, uncomp) when the
        # compressed axes are the leading dims — skip the re-sort
        if comp != tuple(range(len(comp))):
            # canonical lex order restricted to one comp-coordinate is
            # already uncomp-lex order, so a STABLE counting scatter by the
            # comp key alone replaces the full (comp, uncomp) argsort
            res = None
            if data.dtype in (np.float64, np.float32) and row_size <= max(4 * x.nnz, 1 << 22):
                from ..native import eager as _eager

                if len(comp) == 1 and len(uncomp) == 1:
                    # hand the raw (possibly int32) coordinate rows to the
                    # kernel — halves the scatter traffic vs the i64 casts
                    res = _eager.transpose2d(
                        coords[uncomp[0]], coords[comp[0]], data, row_size, want_rows=False
                    )
                else:
                    res = _eager.transpose2d(cols, rows, data, row_size, want_rows=False)
            if res is not None:
                indptr, _, cols, data = res
                return cls._make(
                    data,
                    cols.astype(idx_dtype),
                    indptr.astype(idx_dtype, copy=False),
                    x.shape,
                    compressed_axes,
                    x.fill_value,
                )
            from ..native import argsort_i64

            order = argsort_i64(rows * col_size + cols)
            rows = rows[order]
            cols = cols[order]
            data = data[order]

        from ..native import build_indptr

        indptr = build_indptr(rows, row_size).astype(idx_dtype, copy=False)
        return cls._make(
            data,
            cols.astype(idx_dtype),
            indptr,
            x.shape,
            compressed_axes,
            x.fill_value,
        )

    @classmethod
    def from_numpy(cls, x, compressed_axes=None, fill_value=None, idx_dtype=None):
        return cls.from_coo(COO.from_numpy(x, fill_value=fill_value), compressed_axes=compressed_axes, idx_dtype=idx_dtype)

    @classmethod
    def from_scipy_sparse(cls, x, /, *, fill_value=None):
        x = x.tocsr()
        x.sum_duplicates()
        return cls._make(
            np.asarray(x.data),
            np.asarray(x.indices),
            np.asarray(x.indptr),
            x.shape,
            (0,),
            zero_of_dtype(x.dtype) if fill_value is None else np.asarray(fill_value, dtype=x.dtype)[()],
        )

    @classmethod
    def from_iter(cls, x, shape, fill_value=None, compressed_axes=None, dtype=None):
        return cls.from_coo(COO.from_iter(x, shape=shape, fill_value=fill_value, dtype=dtype), compressed_axes=compressed_axes)

    # -- properties ---------------------------------------------------------------------
    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return int(self.data.shape[0])

    @property
    def nbytes(self):
        return self.data.nbytes + self.indices.nbytes + self.indptr.nbytes

    @property
    def format(self):
        return "gcxs"

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

    def __str__(self):
        return (
            f"<GCXS: shape={self.shape}, dtype={self.dtype}, nnz={self.nnz}, fill_value={self.fill_value}, "
            f"compressed_axes={self.compressed_axes}>"
        )

    __repr__ = __str__

    def _prune(self):
        mask = ~equivalent(self.data, np.asarray(self.fill_value, dtype=self.data.dtype))
        if mask.all():
            return
        coo = self.tocoo()
        coo._prune()
        self._make_shallow_copy_of(GCXS.from_coo(coo, compressed_axes=self.compressed_axes))

    # -- conversions ----------------------------------------------------------------------
    def tocoo(self):
        rows = _uncompress_indptr_np(np.asarray(self.indptr))
        cols = np.asarray(self.indices).astype(np.int64)
        comp = self.compressed_axes
        uncomp = tuple(a for a in range(self.ndim) if a not in comp)
        comp_shape = tuple(self.shape[a] for a in comp)
        uncomp_shape = tuple(self.shape[a] for a in uncomp)
        from .._utils import get_out_dtype

        # keep the stored index dtype (minimal upcast) so conversions round-
        # trip small dtypes, e.g. uint8-indexed GCXS -> COO -> concat
        coords = np.empty(
            (self.ndim, self.nnz),
            dtype=get_out_dtype(np.asarray(self.indices).dtype, max(self.shape) if self.shape else 0),
        )
        if comp:
            for a, c in zip(comp, np.unravel_index(rows, comp_shape)):
                coords[a] = c
        if uncomp:
            for a, c in zip(uncomp, np.unravel_index(cols, uncomp_shape)):
                coords[a] = c
        return COO(
            coords,
            np.asarray(self.data),
            shape=self.shape,
            has_duplicates=False,
            sorted=(comp + uncomp) == tuple(range(self.ndim)),
            fill_value=self.fill_value,
        )

    def todense(self):
        return self.tocoo().todense()

    def to_scipy_sparse(self, /, *, accept_fv=None):
        import scipy.sparse

        from .._utils import check_fill_value

        if accept_fv is None:
            accept_fv = [0]
        check_fill_value(self, accept_fv, func_name="to_scipy_sparse")
        if self.ndim != 2:
            raise ValueError("Can only convert a 2-dimensional array to a Scipy sparse matrix.")
        if self.compressed_axes == (0,):
            return scipy.sparse.csr_array((np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)), shape=self.shape)
        return scipy.sparse.csc_array((np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)), shape=self.shape)

    def asformat(self, format, **kwargs):
        from .._utils import convert_format

        format = convert_format(format)
        if format == "gcxs":
            if "compressed_axes" in kwargs and kwargs["compressed_axes"] is not None and tuple(
                kwargs["compressed_axes"]
            ) != self.compressed_axes:
                return self.change_compressed_axes(kwargs["compressed_axes"])
            return self
        if format == "coo":
            return self.tocoo()
        if format == "dok":
            from .dok import DOK

            return DOK.from_coo(self.tocoo())
        if format == "csr":
            return CSR(self.change_compressed_axes((0,))) if self.compressed_axes != (0,) else CSR(self)
        if format == "csc":
            return CSC(self.change_compressed_axes((1,))) if self.compressed_axes != (1,) else CSC(self)
        raise NotImplementedError(f"The given format {format} is not supported.")

    def change_compressed_axes(self, new_compressed_axes):
        """Re-compress along different axes (relinearize + sort + rebuild)."""
        new_compressed_axes = _validate_compressed_axes(self.shape, new_compressed_axes)
        if new_compressed_axes == self.compressed_axes:
            return self
        return self._restructure(self.shape, compressed_axes=new_compressed_axes)

    def _restructure(self, new_shape, axes=None, compressed_axes=None):
        """Fused uncompress → relinearize → sort → rebuild — the direct
        N-D restructuring path (the role of reference
        ``_compressed/convert.py:210-273``), never materializing a COO.

        Applies an optional axis permutation ``axes`` (transpose), then —
        when ``new_shape`` differs from the permuted shape — a C-order
        relinearization (reshape), and recompresses along
        ``compressed_axes`` of the target shape.  Per-entry target keys are
        computed with a handful of vectorized mixed-radix int ops directly
        from ``(indptr-expanded row ids, indices)``; the reorder is the
        same threaded counting-sort + per-row-sort kernel COO
        canonicalization uses."""
        comp = self.compressed_axes
        uncomp = tuple(a for a in range(self.ndim) if a not in comp)
        comp_shape = tuple(self.shape[a] for a in comp)
        uncomp_shape = tuple(self.shape[a] for a in uncomp)
        new_shape = tuple(int(d) for d in new_shape)
        new_comp = _validate_compressed_axes(new_shape, compressed_axes)
        new_uncomp = tuple(a for a in range(len(new_shape)) if a not in new_comp)
        new_row_size = int(np.prod([new_shape[a] for a in new_comp], dtype=np.float64)) if new_comp else 1
        new_col_size = int(np.prod([new_shape[a] for a in new_uncomp], dtype=np.float64)) if new_uncomp else 1

        data = np.asarray(self.data)
        nnz = data.shape[0]
        from .._utils import get_out_dtype

        if nnz == 0:
            idx_dtype = get_out_dtype(np.asarray(self.indices).dtype, max(new_row_size, new_col_size))
            return GCXS._make(
                data,
                np.zeros(0, dtype=idx_dtype),
                np.zeros(new_row_size + 1, dtype=idx_dtype),
                new_shape,
                new_comp,
                self.fill_value,
            )

        # 1. describe each entry's target (row, col) keys as mixed-radix
        # term lists  key = Σ ((src // div) % mod) * mul  over the
        # compressed-row id (src 0), the stored index (src 1), or — for
        # reshape — an intermediate C-order linear index (src 2) with its
        # own term list.  The lists are evaluated by a fused threaded C++
        # kernel (``native.eager.relinearize``) or a generic numpy loop.
        def base_term(a):
            """(src, div, mod) extracting original axis ``a``'s digit."""
            if a in comp:
                i = comp.index(a)
                div = int(np.prod(comp_shape[i + 1 :], dtype=np.float64)) if i + 1 < len(comp) else 1
                return (0, div, 0 if i == 0 else self.shape[a])
            i = uncomp.index(a)
            div = int(np.prod(uncomp_shape[i + 1 :], dtype=np.float64)) if i + 1 < len(uncomp) else 1
            return (1, div, 0 if i == 0 else self.shape[a])

        # axis permutation (transpose); ``sig`` tracks the significance
        # sequence (in TARGET axis labels) the entries are currently lex-
        # sorted by — it decides how much reordering step 5 really needs
        if axes is not None:
            shapeP = tuple(self.shape[a] for a in axes)
            pos = {a: p for p, a in enumerate(axes)}
            sig = tuple(pos[a] for a in comp + uncomp)
            src_axis = list(axes)
        else:
            shapeP = self.shape
            sig = comp + uncomp
            src_axis = list(range(self.ndim))

        if new_shape != shapeP:
            # C-order relinearization (reshape): the linear order survives
            # the re-split only when the entries were in C order already
            if int(np.prod(new_shape, dtype=np.float64)) != self.size:
                raise ValueError(f"cannot reshape array of size {self.size} into shape {new_shape}")
            sig = tuple(range(len(new_shape))) if sig == tuple(range(self.ndim)) else None
            lin_terms = []
            for i, a in enumerate(src_axis):
                s, d, m = base_term(a)
                stride = int(np.prod(shapeP[i + 1 :], dtype=np.float64)) if i + 1 < len(shapeP) else 1
                lin_terms.append((s, d, m, stride))

            def key_terms(axs):
                terms = []
                for i, a in enumerate(axs):
                    div = int(np.prod(new_shape[a + 1 :], dtype=np.float64)) if a + 1 < len(new_shape) else 1
                    mod = 0 if a == 0 else new_shape[a]
                    mul = (
                        int(np.prod([new_shape[b] for b in axs[i + 1 :]], dtype=np.float64))
                        if i + 1 < len(axs)
                        else 1
                    )
                    terms.append((2, div, mod, mul))
                return terms

        else:
            lin_terms = []

            def key_terms(axs):
                terms = []
                for i, a in enumerate(axs):
                    s, d, m = base_term(src_axis[a])
                    mul = (
                        int(np.prod([new_shape[b] for b in axs[i + 1 :]], dtype=np.float64))
                        if i + 1 < len(axs)
                        else 1
                    )
                    terms.append((s, d, m, mul))
                return terms

        row_terms = key_terms(new_comp)
        col_terms = key_terms(new_uncomp)

        from ..native import eager as _eager

        res = _eager.relinearize(np.asarray(self.indptr), np.asarray(self.indices), lin_terms, row_terms, col_terms)
        if res is not None:
            new_row, new_col = res
        else:
            crow = _uncompress_indptr_np(np.asarray(self.indptr))
            idx = np.asarray(self.indices).astype(np.int64, copy=False)

            def eval_terms(terms, lin):
                key = np.zeros(nnz, dtype=np.int64)
                for s, d, m, u in terms:
                    v = (crow, idx, lin)[s]
                    if d != 1:
                        v = v // d
                    if m:
                        v = v % m
                    key += v * u if u != 1 else v
                return key

            lin = eval_terms(lin_terms, None) if lin_terms else None
            new_row = eval_terms(row_terms, lin)
            new_col = eval_terms(col_terms, lin)

        # 5. reorder — cheapest sufficient strategy, judged from ``sig``:
        #    - sig == new_comp+new_uncomp: already sorted, just build indptr;
        #    - sig minus new_comp == new_uncomp: one STABLE counting scatter
        #      by new_row (ties are already col-ascending);
        #    - else: threaded counting-sort + per-row sorts (canonicalize2d),
        #      argsort of the packed key as the last fallback.
        from ..native import build_indptr

        idx_dtype = get_out_dtype(np.asarray(self.indices).dtype, max(new_row_size, new_col_size, nnz))
        if sig is not None and sig == new_comp + new_uncomp:
            indptr = build_indptr(new_row, new_row_size).astype(idx_dtype, copy=False)
            return GCXS._make(
                data.copy(), new_col.astype(idx_dtype, copy=False), indptr, new_shape, new_comp, self.fill_value
            )
        if (
            sig is not None
            and tuple(a for a in sig if a not in new_comp) == new_uncomp
            and new_row_size <= max(4 * nnz, 1 << 22)
        ):
            from ..native import eager as _eager

            res = _eager.transpose2d(new_col, new_row, data, new_row_size, want_rows=False)
            if res is not None:
                indptr, _, new_col, data = res
                return GCXS._make(
                    data,
                    new_col.astype(idx_dtype, copy=False),
                    indptr.astype(idx_dtype, copy=False),
                    new_shape,
                    new_comp,
                    self.fill_value,
                )
        res = None
        if data.dtype in (np.float64, np.float32):
            from ..native import eager as _eager

            res = _eager.canonicalize2d(new_row, new_col, data, new_row_size)
        if res is not None:
            new_row, new_col, data = res
        else:
            from ..native import argsort_i64

            order = argsort_i64(new_row * new_col_size + new_col)
            new_row = new_row[order]
            new_col = new_col[order]
            data = data[order]

        indptr = build_indptr(new_row, new_row_size).astype(idx_dtype, copy=False)
        return GCXS._make(
            data,
            new_col.astype(idx_dtype, copy=False),
            indptr,
            new_shape,
            new_comp,
            self.fill_value,
        )

    # -- structural ops ---------------------------------------------------------------------
    def reshape(self, shape, order="C", compressed_axes=None):
        shape = tuple(shape) if isinstance(shape, Iterable) else (shape,)
        if order not in ("C", None):
            raise NotImplementedError("The `order` parameter is not supported.")
        if any(d == -1 for d in shape):
            extra = int(self.size / np.prod([d for d in shape if d != -1], dtype=np.float64))
            shape = tuple([d if d != -1 else extra for d in shape])
        if self.shape == shape:
            return self
        if len(shape) >= 2 and self.ndim >= 1:
            return self._restructure(shape, compressed_axes=compressed_axes)
        coo = self.tocoo().reshape(shape)
        if len(shape) == 1:
            return GCXS.from_coo(coo)
        return GCXS.from_coo(coo, compressed_axes=compressed_axes)

    def transpose(self, axes=None, compressed_axes=None):
        if axes is None:
            axes = tuple(reversed(range(self.ndim)))
        axes = normalize_axis(axes, self.ndim)
        if not isinstance(axes, tuple):
            axes = (axes,)
        if axes == tuple(range(self.ndim)):
            return self
        if self.ndim == 2 and compressed_axes is None:
            # O(1): CSR of A == CSC of Aᵀ (reference `_2d_transpose:743`)
            return GCXS._make(
                self.data,
                self.indices,
                self.indptr,
                (self.shape[1], self.shape[0]),
                (1 - self.compressed_axes[0],),
                self.fill_value,
            )
        return self._restructure(
            tuple(self.shape[a] for a in axes), axes=axes, compressed_axes=compressed_axes
        )

    def __getitem__(self, index):
        from ..ops.indexing import getitem

        fast = self._getitem_fast(index)
        if fast is not NotImplemented:
            return fast

        out = getitem(self.tocoo(), index)
        if isinstance(out, COO) and out.ndim >= 1:
            try:
                return GCXS.from_coo(out, compressed_axes=self.compressed_axes if out.ndim > max(self.compressed_axes, default=0) and out.ndim >= 2 else None)
            except ValueError:
                return GCXS.from_coo(out)
        return out

    def flatten(self, order="C"):
        return self.reshape(-1, order=order)

    @staticmethod
    def _classify_axis_sel(sel, n):
        """Normalize one 2-D index component into ``(kind, payload)``:
        ``("full", None)``, ``("int", i)``, ``("range", (c0, c1))`` for
        contiguous step-1 slices, or ``("fancy", arr)`` for strictly
        increasing int arrays; None when unsupported here."""
        from numbers import Integral

        if isinstance(sel, Integral):
            i = int(sel)
            i += n if i < 0 else 0
            if not (0 <= i < n):
                raise IndexError(f"index {sel} out of bounds for axis with size {n}")
            return ("int", i)
        if isinstance(sel, slice):
            if sel == slice(None):
                return ("full", None)
            start, stop, step = sel.indices(n)
            if step != 1:
                return None
            return ("range", (start, max(start, stop)))
        arr = np.asarray(sel)
        if arr.ndim == 1 and arr.dtype.kind == "b":
            if arr.size != n:
                raise IndexError(f"boolean index of size {arr.size} for axis with size {n}")
            return ("fancy", np.flatnonzero(arr))
        if arr.ndim == 1 and arr.dtype.kind in "iu":
            if arr.size and (arr.min() < -n or arr.max() >= n):
                raise IndexError(f"index out of bounds for axis with size {n}")
            pos = np.where(arr < 0, arr + n, arr).astype(np.int64)
            return ("fancy", pos)
        return None

    def _getitem_fast(self, index):
        """O(rows + touched nnz) native selection for the 2-D patterns
        (reference ``_compressed/indexing.py`` role): any combination of an
        int / step-1 slice / int-array pick along the compressed axis with
        an int / step-1 slice / strictly-increasing int-array filter along
        the uncompressed axis — indptr splicing plus one masked pass, no
        COO round trip."""
        if self.ndim != 2 or self.compressed_axes not in ((0,), (1,)):
            return NotImplemented
        if not isinstance(index, tuple):
            index = (index,)
        if len(index) > 2 or any(i is None or i is Ellipsis for i in index):
            return NotImplemented
        index = index + (slice(None),) * (2 - len(index))
        comp_ax = self.compressed_axes[0]
        n_comp = self.shape[comp_ax]
        n_unc = self.shape[1 - comp_ax]
        comp_sel = self._classify_axis_sel(index[comp_ax], n_comp)
        unc_sel = self._classify_axis_sel(index[1 - comp_ax], n_unc)
        if comp_sel is None or unc_sel is None:
            return NotImplemented
        if comp_sel[0] == "fancy" and unc_sel[0] == "fancy":
            # two advanced indices select POINTWISE (numpy semantics), not
            # the outer product this splice-then-filter path computes
            return NotImplemented
        if unc_sel[0] == "fancy" and (
            unc_sel[1].size > 1 and not np.all(np.diff(unc_sel[1]) > 0)
        ):
            # repeated / unordered uncompressed picks would need a per-row
            # re-sort — leave to the COO path
            return NotImplemented
        indptr = np.asarray(self.indptr)
        indices = np.asarray(self.indices)
        data = np.asarray(self.data)

        # -- phase 1: compressed-axis selection (indptr splicing) ---------------
        kind, payload = comp_sel
        if kind == "int":
            lo, hi = int(indptr[payload]), int(indptr[payload + 1])
            sub_data = data[lo:hi]
            sub_ind = indices[lo:hi]
            rel_indptr = np.array([0, hi - lo], dtype=np.int64)
            n_sel = 1
        elif kind == "full" or kind == "range":
            start, stop = (0, n_comp) if kind == "full" else payload
            lo, hi = int(indptr[start]), int(indptr[stop])
            sub_data = data[lo:hi]
            sub_ind = indices[lo:hi]
            rel_indptr = (indptr[start : stop + 1] - indptr[start]).astype(np.int64)
            n_sel = stop - start
        else:  # fancy: splice segments in pick order (duplicates allowed)
            sel_pos = payload
            from ..native import eager as _eager

            res = _eager.csr_row_splice(indptr, indices, data, sel_pos)
            if res is not None:
                rel_indptr, sub_ind, sub_data = res
            else:
                lo = indptr[sel_pos]
                hi = indptr[sel_pos + 1]
                counts = (hi - lo).astype(np.int64)
                total = int(counts.sum())
                if total:
                    ends = np.cumsum(counts)
                    within = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
                    src = np.repeat(lo.astype(np.int64), counts) + within
                    sub_data = data[src]
                    sub_ind = indices[src]
                else:
                    sub_data = data[:0]
                    sub_ind = indices[:0]
                rel_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            n_sel = sel_pos.size
        comp_is_scalar = kind == "int"

        # -- phase 2: uncompressed-axis filter (one masked pass) ----------------
        ukind, upayload = unc_sel
        if ukind == "full":
            new_ind = sub_ind
            new_data = sub_data
            new_width = n_unc
            mask = None
        else:
            if ukind == "int":
                mask = sub_ind == upayload
                new_ind = np.zeros(int(mask.sum()), dtype=sub_ind.dtype)
                new_width = 1
            elif ukind == "range":
                c0, c1 = upayload
                mask = (sub_ind >= c0) & (sub_ind < c1)
                new_ind = sub_ind[mask] - c0
                new_width = c1 - c0
            else:
                remap = np.full(n_unc, -1, dtype=np.int64)
                remap[upayload] = np.arange(upayload.size, dtype=np.int64)
                mapped = remap[sub_ind]
                mask = mapped >= 0
                new_ind = mapped[mask].astype(sub_ind.dtype, copy=False)
                new_width = upayload.size
            new_data = sub_data[mask]

        from .coo import COO

        if comp_is_scalar and ukind == "int":
            return new_data[0] if new_data.size else np.asarray(self.fill_value)[()]
        if comp_is_scalar:
            # 1-D row result: build the GCXS directly (compressed_axes=(),
            # indptr=[0, nnz]) — the COO round trip re-ran ctor validation
            # on a provably canonical slice (~2x on single-row getitem)
            return GCXS._make(
                new_data,
                new_ind,
                np.array([0, new_ind.size], dtype=np.asarray(self.indptr).dtype),
                (new_width,),
                (),
                self.fill_value,
            )
        if ukind == "int":
            # 1-D result along the compressed axis: recover each hit's
            # segment from the spliced indptr
            hit_pos = np.flatnonzero(mask)
            rows = (np.searchsorted(rel_indptr, hit_pos, side="right") - 1).astype(np.int64)
            return COO(
                rows[None, :],
                new_data,
                shape=(n_sel,),
                has_duplicates=False,
                sorted=True,
                fill_value=self.fill_value,
            ).asformat("gcxs")
        if mask is None:
            new_indptr = rel_indptr.astype(indptr.dtype)
        else:
            kept_rows = (np.searchsorted(rel_indptr, np.flatnonzero(mask), side="right") - 1).astype(np.int64)
            new_indptr = np.zeros(n_sel + 1, dtype=indptr.dtype)
            np.cumsum(np.bincount(kept_rows, minlength=n_sel), out=new_indptr[1:])
        new_shape = (n_sel, new_width) if comp_ax == 0 else (new_width, n_sel)
        return GCXS._make(
            new_data, new_ind, new_indptr, new_shape, self.compressed_axes, self.fill_value
        )

    # -- reduce plumbing ---------------------------------------------------------------------
    def _reduce_calc(self, method, axis, keepdims=False, **kwargs):
        # native path: reducing exactly the uncompressed axes == reducing
        # each compressed row's segment — reduceat over indptr, no COO
        # round-trip (the reference's GCXS reduce strategy,
        # ``_compressed/compressed.py:354-372``)
        uncomp = tuple(a for a in range(self.ndim) if a not in self.compressed_axes)
        if self.ndim >= 2 and set(axis) == set(uncomp) and self.nnz:
            indptr = np.asarray(self.indptr).astype(np.int64)
            data = np.asarray(self.data)
            counts_all = np.diff(indptr)
            nonempty = np.flatnonzero(counts_all)
            starts = indptr[nonempty]
            result = method.reduceat(data, starts, **{k: v for k, v in kwargs.items() if k != "keepdims"})
            if kwargs.get("dtype") is not None:
                result = result.astype(kwargs["dtype"])
            counts = counts_all[nonempty]
            comp_shape = tuple(self.shape[a] for a in self.compressed_axes)
            n_cols = int(np.prod([self.shape[a] for a in uncomp], dtype=np.float64))
            arr_attrs = (_NATIVE_REDUCE, nonempty, comp_shape)
            return result, counts, axis, n_cols, (arr_attrs, self.compressed_axes)

        # native path #2: add-reducing exactly the compressed axes keeps the
        # uncompressed coordinate, which IS `indices` — one bincount pass,
        # no COO round-trip (CSR ``sum(axis=0)`` / CSC ``sum(axis=1)``)
        uncomp_shape = tuple(self.shape[a] for a in uncomp)
        keep = int(np.prod(uncomp_shape, dtype=np.float64)) if uncomp else 1
        if (
            method is np.add
            and all(k == "dtype" and v is None for k, v in kwargs.items())
            and set(axis) == set(self.compressed_axes)
            and uncomp
            and self.nnz
            and self.data.dtype.kind in "fiu"
            and keep <= max(16 * self.nnz, 1 << 22)
        ):
            from .coo import _ShapeOnly

            red = int(np.prod([self.shape[a] for a in axis], dtype=np.float64))
            keys = np.asarray(self.indices).astype(np.int64, copy=False)
            data = np.asarray(self.data)
            acc_dtype = np.add.reduce(np.empty(0, dtype=data.dtype)).dtype
            native = None
            if data.dtype in (np.float64, np.float32):
                from ..native import eager as _eager

                native = _eager.bincount_sum(keys, data, keep)
            if native is not None:
                sums, counts_full = native
            else:
                counts_full = np.bincount(keys, minlength=keep)
                if data.dtype == np.float64:
                    sums = np.bincount(keys, weights=data, minlength=keep)
                else:
                    sums = np.zeros(keep, dtype=acc_dtype)
                    np.add.at(sums, keys, data)
            inv_idx = np.flatnonzero(counts_full)
            result = sums[inv_idx].astype(acc_dtype, copy=False)
            counts = counts_full[inv_idx]
            arr_attrs = (_ShapeOnly((keep, red)), uncomp_shape, inv_idx)
            return result, counts, axis, red, (arr_attrs, self.compressed_axes)

        out = self.tocoo()._reduce_calc(method, axis, keepdims, **kwargs)
        if len(out) == 1:
            return out
        data, counts, axis, n_cols, arr_attrs = out
        return data, counts, axis, n_cols, (arr_attrs, self.compressed_axes)

    def _reduce_return(self, data, arr_attrs, result_fill_value):
        coo_attrs, compressed_axes = arr_attrs
        if isinstance(coo_attrs, tuple) and len(coo_attrs) == 3 and coo_attrs[0] is _NATIVE_REDUCE:
            _, nonempty, comp_shape = coo_attrs
            out = COO(
                nonempty[None, :],
                data,
                shape=(int(np.prod(comp_shape, dtype=np.float64)),),
                has_duplicates=False,
                sorted=True,
                prune=True,
                fill_value=result_fill_value,
            ).reshape(comp_shape)
            if out.ndim < 2:
                return GCXS.from_coo(out)
            return GCXS.from_coo(out)

        a, neg_shape, inv_idx = coo_attrs[:3]
        if len(coo_attrs) > 3 and coo_attrs[3]:
            # canonical AND pruned already (COO fused compact path)
            idx_dtype = index_dtype_for(a.shape[0])
            out = COO._make(
                np.ascontiguousarray(inv_idx[None, :].astype(idx_dtype, copy=False)),
                data,
                (a.shape[0],),
                result_fill_value,
            ).reshape(neg_shape)
        else:
            out = COO(
                inv_idx[None, :],
                data,
                shape=(a.shape[0],),
                has_duplicates=False,
                sorted=True,
                prune=True,
                fill_value=result_fill_value,
            ).reshape(neg_shape)
        if out.ndim < 2:
            return GCXS.from_coo(out)
        try:
            return GCXS.from_coo(out, compressed_axes=tuple(a for a in compressed_axes if a < out.ndim) or None)
        except ValueError:
            return GCXS.from_coo(out)

    def dot(self, other):
        from ..ops.dot import dot

        return dot(self, other)

    def __dask_tokenize__(self):
        from dask.base import normalize_token

        return normalize_token(
            (type(self), np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr), self.shape, self.fill_value)
        )

    def copy(self, deep=True):
        if deep:
            return GCXS._make(
                np.array(self.data, copy=True),
                np.array(self.indices, copy=True),
                np.array(self.indptr, copy=True),
                self.shape,
                self.compressed_axes,
                self.fill_value,
            )
        return GCXS._make(self.data, self.indices, self.indptr, self.shape, self.compressed_axes, self.fill_value)



def _uncompress_indptr_np(indptr):
    """Row id per stored entry from indptr (native threaded expand, or the
    vectorized ``repeat`` fallback)."""
    n_rows = len(indptr) - 1
    if int(indptr[-1]) >= 65536:
        from ..native import eager as _eager

        native = _eager.uncompress_indptr(indptr, n_rows)
        if native is not None:
            return native
    counts = np.diff(indptr)
    return np.repeat(np.arange(n_rows, dtype=np.int64), counts)


class _Compressed2d(GCXS):
    def __init__(self, arg, shape=None, prune=False, fill_value=None, **kwargs):
        cls_axis = self._cls_compressed_axes
        import scipy.sparse

        # argument validation wording matches reference
        # ``_compressed/compressed.py:855-861``
        ca = kwargs.pop("compressed_axes", None)
        if ca is not None and tuple(ca) != cls_axis:
            raise ValueError(f"{type(self).__name__} only accepts compressed_axes={cls_axis} but got: {ca}")
        if kwargs:
            raise TypeError(f"unexpected keyword arguments: {sorted(kwargs)}")
        if not hasattr(arg, "shape") and shape is None and not (isinstance(arg, tuple) and len(arg) == 3):
            raise ValueError("missing `shape` argument")
        probe_shape = shape if shape is not None else getattr(arg, "shape", None)
        if probe_shape is not None and len(probe_shape) != 2:
            raise ValueError(f"{type(self).__name__} must be 2-d, passed {len(probe_shape)}-d shape.")

        if isinstance(arg, tuple) and len(arg) == 3:
            super().__init__(arg, shape=shape, compressed_axes=cls_axis, prune=prune, fill_value=fill_value)
        elif isinstance(arg, GCXS) and arg.ndim == 2:
            converted = arg.change_compressed_axes(cls_axis)
            self._make_shallow_copy_of(converted)
            if fill_value is not None:
                self.fill_value = np.asarray(fill_value, dtype=self.dtype)[()]
        elif isinstance(arg, np.ndarray) or scipy.sparse.issparse(arg) or isinstance(arg, SparseArray):
            super().__init__(arg, shape=shape, compressed_axes=cls_axis, prune=prune, fill_value=fill_value)
        else:
            super().__init__(arg, shape=shape, compressed_axes=cls_axis, prune=prune, fill_value=fill_value)
        if self.ndim != 2:
            raise ValueError(f"{type(self).__name__} is a 2-dimensional format")

    @classmethod
    def from_numpy(cls, x, fill_value=None, idx_dtype=None):
        coo = COO.from_numpy(x, fill_value=fill_value)
        return cls(GCXS.from_coo(coo, compressed_axes=cls._cls_compressed_axes, idx_dtype=idx_dtype))

    def __str__(self):
        return (
            f"<{type(self).__name__}: shape={self.shape}, dtype={self.dtype}, nnz={self.nnz}, "
            f"fill_value={self.fill_value}>"
        )

    __repr__ = __str__

    def transpose(self, axes=None, copy=False, compressed_axes=None):
        if axes is not None:
            ax = tuple(axes) if isinstance(axes, Iterable) else (axes,)
            if tuple(normalize_axis(ax, 2)) not in ((0, 1), (1, 0)):
                raise ValueError(f"Invalid transpose axes: {axes}")
            if tuple(normalize_axis(ax, 2)) == (0, 1):
                return self.copy() if copy else self
        data, indices, indptr = self.data, self.indices, self.indptr
        if copy:
            data, indices, indptr = data.copy(), indices.copy(), indptr.copy()
        other = CSC if isinstance(self, CSR) else CSR
        return other._make(
            data,
            indices,
            indptr,
            (self.shape[1], self.shape[0]),
            other._cls_compressed_axes,
            self.fill_value,
        )


class CSR(_Compressed2d):
    """2-D compressed-sparse-row matrix (GCXS with compressed_axes=(0,))."""

    _cls_compressed_axes = (0,)

    @property
    def format(self):
        return "csr"

    @classmethod
    def from_scipy_sparse(cls, x, /, *, fill_value=None):
        x = x.tocsr()
        x.sum_duplicates()
        return cls._make(
            np.asarray(x.data),
            np.asarray(x.indices),
            np.asarray(x.indptr),
            x.shape,
            (0,),
            zero_of_dtype(x.dtype) if fill_value is None else np.asarray(fill_value, dtype=x.dtype)[()],
        )


class CSC(_Compressed2d):
    """2-D compressed-sparse-column matrix (GCXS with compressed_axes=(1,))."""

    _cls_compressed_axes = (1,)

    @property
    def format(self):
        return "csc"

    @classmethod
    def from_scipy_sparse(cls, x, /, *, fill_value=None):
        x = x.tocsc()
        x.sum_duplicates()
        return cls._make(
            np.asarray(x.data),
            np.asarray(x.indices),
            np.asarray(x.indptr),
            x.shape,
            (1,),
            zero_of_dtype(x.dtype) if fill_value is None else np.asarray(fill_value, dtype=x.dtype)[()],
        )


for _cls in (GCXS, CSR, CSC):
    jax.tree_util.register_pytree_node(
        _cls,
        lambda x: x.tree_flatten(),
        (lambda c: (lambda aux, children: c.tree_unflatten(aux, children)))(_cls),
    )

def concatenate_gcxs(arrays, axis=0):
    """Concatenate GCXS arrays by splicing their compressed storage directly
    (no COO round-trip — the role of reference ``_compressed/common.py:6-56``,
    redesigned as vectorized numpy splices).

    With every input compressed along exactly ``(axis,)``, the flattened
    CSR matrices stack vertically: ``indices``/``data`` concatenate as-is
    and each later ``indptr`` is shifted by the accumulated nnz.  Inputs
    compressed along other axes are re-compressed first (same cost the
    reference pays in ``change_compressed_axes``).
    """
    from .._utils import check_consistent_fill_value, get_out_dtype

    check_consistent_fill_value(arrays)
    ndim = arrays[0].ndim
    axis = normalize_axis(axis, ndim)
    shape = list(arrays[0].shape)
    shape[axis] = sum(int(x.shape[axis]) for x in arrays)
    for x in arrays:
        if x.ndim != ndim:
            raise ValueError("all the input array dimensions must match exactly")
        for d in range(ndim):
            if d != axis and x.shape[d] != shape[d]:
                raise ValueError(
                    "all the input array dimensions except for the concatenation axis must match exactly"
                )

    arrays = [x.change_compressed_axes((axis,)) for x in arrays]
    total_nnz = sum(x.nnz for x in arrays)
    row_size = shape[axis]
    col_size = arrays[0]._compressed_shape[1]
    in_idx = np.result_type(*[x.indices.dtype for x in arrays])
    idx_dtype = get_out_dtype(in_idx, max(row_size, col_size, total_nnz, 1))

    indptr = np.empty(row_size + 1, dtype=idx_dtype)
    indptr[0] = 0
    pos, nnz_off = 1, 0
    for x in arrays:
        n = x.indptr.shape[0] - 1
        indptr[pos : pos + n] = x.indptr[1:]
        indptr[pos : pos + n] += nnz_off
        pos += n
        nnz_off += x.nnz
    indices = np.concatenate([np.asarray(x.indices) for x in arrays]).astype(idx_dtype, copy=False)
    data = np.concatenate([np.asarray(x.data) for x in arrays])
    return GCXS._make(data, indices, indptr, tuple(shape), (axis,), arrays[0].fill_value)


def stack_gcxs(arrays, axis=0):
    """Stack GCXS arrays along a new axis by direct storage splice.

    Compressed along the new ``(axis,)``, the flattened result matrix has
    one row per input whose column indices are that input's C-order linear
    locations — recoverable without any sort when the input's compressed
    axes are a leading prefix (its storage order IS C order); other layouts
    take the canonical-COO path per input (one sort, what the reference's
    reshape + ``change_compressed_axes`` pays anyway:
    ``_compressed/common.py:58-96``).
    """
    from .._utils import check_consistent_fill_value, get_out_dtype

    check_consistent_fill_value(arrays)
    if len({x.shape for x in arrays}) > 1:
        raise ValueError("all input arrays must have the same shape")
    ndim = arrays[0].ndim
    axis = normalize_axis(axis, ndim + 1)
    in_shape = arrays[0].shape
    col_size = int(np.prod(in_shape, dtype=np.float64))
    total_nnz = sum(x.nnz for x in arrays)
    in_idx = np.result_type(*[x.indices.dtype for x in arrays])
    idx_dtype = get_out_dtype(in_idx, max(len(arrays), col_size, total_nnz, 1))

    locs, datas = [], []
    for x in arrays:
        ca = x.compressed_axes
        if ca == tuple(range(len(ca))):
            # storage order is C order: expand indptr to row ids, linearize
            counts = np.diff(x.indptr)
            rows = np.repeat(np.arange(x.indptr.shape[0] - 1, dtype=np.int64), counts)
            locs.append(rows * x._compressed_shape[1] + np.asarray(x.indices, dtype=np.int64))
            datas.append(np.asarray(x.data))
        else:
            # canonical COO order = C order (data must be re-ordered with it)
            coo = x.tocoo()
            locs.append(np.asarray(coo.linear_loc(), dtype=np.int64))
            datas.append(np.asarray(coo.data))
    indices = np.concatenate(locs).astype(idx_dtype, copy=False)
    data = np.concatenate(datas)
    indptr = np.zeros(len(arrays) + 1, dtype=idx_dtype)
    indptr[1:] = np.cumsum([x.nnz for x in arrays])

    shape = list(in_shape)
    shape.insert(axis, len(arrays))
    return GCXS._make(data, indices, indptr, tuple(shape), (axis,), arrays[0].fill_value)


# jax.export serialization (aux = (shape, compressed_axes))
try:
    import json as _json

    from jax import export as _jax_export

    for _cls in (GCXS, CSR, CSC):
        _jax_export.register_pytree_node_serialization(
            _cls,
            serialized_name=f"sparse_tpu.{_cls.__name__}",
            serialize_auxdata=lambda aux: _json.dumps([list(aux[0]), list(aux[1])]).encode(),
            deserialize_auxdata=lambda b: tuple(tuple(x) for x in _json.loads(b.decode())),
        )
except (ImportError, AttributeError):  # pragma: no cover - older jax
    pass
del _cls
