"""Element-wise ops with N-ary broadcasting and fill-value algebra.

Reference algorithm (``_umath.py:392-654``) loops over all 2^k match/unmatch
combinations of the k sparse operands, matching coordinates pairwise with a
sequential two-pointer Numba kernel. This implementation replaces that with a
fully vectorized **union + gather** formulation:

1. expand each sparse operand's coordinates through broadcasting into the
   result index space,
2. take the sorted union of all expanded coordinate sets,
3. evaluate every operand at each union coordinate (its stored value when
   present — found by ``searchsorted`` on its sorted linearized coordinates —
   else its fill value; dense operands are gathered directly),
4. apply ``func`` once over the whole union, prune entries equal to the
   result fill value.

This is mathematically identical to the 2^k mask algebra but is one
data-parallel pass (sorts, searches, gathers) — the shape that XLA/TPU runs
well — instead of an exponential loop of sequential joins.

Fill-value semantics match the reference exactly (``_get_fill_value``
``_umath.py:505-555``): the result fill value is ``func(*fill_values)``; for
mixed sparse–dense inputs the candidate fill array must be constant
(loose-equivalent) or the result densifies (allowed only when the dense
operands alone span the broadcast shape).
"""

from __future__ import annotations

from numbers import Number

import numpy as np

from .._utils import equivalent, zero_of_dtype
from ..core.base import SparseArray
from ..core.coo import COO
from ..native import eager as _native

__all__ = ["elemwise", "broadcast_to"]

_FUSED_UFUNCS = {np.add: "add", np.subtract: "subtract", np.multiply: "multiply"}


def _is_pos_zero_scalar(v):
    """Bitwise +0.0 for floats; plain 0 for (sign-free) integers."""
    v = np.asarray(v)
    if v.dtype.kind in "iu":
        return v == 0
    return v.dtype.kind == "f" and v == 0 and not np.signbit(v)


def elemwise(func, *args, **kwargs):
    """Apply ``func`` element-wise over sparse/dense/scalar operands."""
    import scipy.sparse

    fast = _gcxs_fused_fast(func, args, kwargs)
    if fast is not None:
        return fast

    out_format, out_kwargs = _choose_output_format(args)

    if not any(isinstance(arg, SparseArray) or scipy.sparse.issparse(arg) for arg in args):
        raise ValueError(f"None of the args is sparse: {args}")

    processed = []
    # Python scalars (NOT np.generic) are "weak" under NEP 50: f4 + 2 stays
    # f4. They're converted to 0-d arrays for the structural machinery, but
    # the fill-value computation below — which determines the output dtype —
    # must see the raw scalar to preserve weak promotion.
    weak_scalars = {}
    for i, arg in enumerate(args):
        if not isinstance(arg, (SparseArray, np.ndarray, np.generic, bool, int, float, complex, list, tuple)) and not scipy.sparse.issparse(arg):
            # unsupported operand type: binary-op protocol turns this into
            # the standard TypeError (reference ``_umath.py:429-443``)
            return NotImplemented
        if scipy.sparse.issparse(arg):
            arg = COO.from_scipy_sparse(arg)
        if isinstance(arg, SparseArray) and not isinstance(arg, COO):
            arg = arg.tocoo() if hasattr(arg, "tocoo") else COO.from_numpy(arg.todense())
        if not isinstance(arg, (SparseArray, np.ndarray, np.generic)) and isinstance(arg, (bool, int, float, complex)):
            weak_scalars[i] = arg
            arg = np.asarray(arg)
        elif isinstance(arg, (np.generic, Number, bool)) and not isinstance(arg, np.ndarray):
            arg = np.asarray(arg)
        elif not isinstance(arg, (SparseArray, np.ndarray)):
            arg = np.asarray(arg)
        processed.append(arg)
    args = processed

    sparse_args = [a for a in args if isinstance(a, COO)]
    if not sparse_args:
        return func(*args, **kwargs)

    # --- broadcast shapes --------------------------------------------------
    full_shape = np.broadcast_shapes(*[a.shape for a in args])
    ndarray_shape = np.broadcast_shapes(*[a.shape for a in args if isinstance(a, np.ndarray)]) if any(
        isinstance(a, np.ndarray) for a in args
    ) else ()

    # --- result fill value -------------------------------------------------
    def fv_arg(a):
        if isinstance(a, COO):
            return np.atleast_1d(np.asarray(a.fill_value))
        return np.atleast_1d(a) if a.ndim == 0 else a

    fv_args = tuple(weak_scalars.get(i, fv_arg(a)) for i, a in enumerate(args))
    dtype = kwargs.pop("dtype", None)
    try:
        fill_value_array = func(*fv_args, dtype=dtype, **kwargs) if dtype is not None else func(*fv_args, **kwargs)
    except TypeError:
        fill_value_array = func(*fv_args, **kwargs)
    fill_value_array = np.asarray(fill_value_array)

    try:
        fill_value = fill_value_array[(0,) * fill_value_array.ndim]
    except IndexError:
        scalar_fvs = tuple(
            np.asarray(a.fill_value)
            if isinstance(a, COO)
            else weak_scalars.get(i, zero_of_dtype(a.dtype))
            for i, a in enumerate(args)
        )
        fill_value = np.asarray(func(*scalar_fvs, **kwargs))[()]

    equivalent_fv = bool(np.all(equivalent(fill_value, fill_value_array, loose=True)))
    if not equivalent_fv and full_shape != ndarray_shape:
        raise ValueError(
            "Performing a mixed sparse-dense operation that would result in a dense array. "
            "Please make sure that func(sparse_fill_values, ndarrays) is a constant array."
        )
    if dtype is not None:
        fill_value = np.asarray(fill_value).astype(dtype)[()]
    out_dtype = np.asarray(fill_value).dtype

    if not equivalent_fv:
        # Dense result: evaluate densely over the full shape.
        dense_args = tuple(a.todense() if isinstance(a, COO) else a for a in args)
        result = func(*dense_args, dtype=dtype, **kwargs) if dtype is not None else func(*dense_args, **kwargs)
        return np.broadcast_to(np.asarray(result), full_shape).astype(out_dtype, copy=False)

    # --- union of expanded coordinates --------------------------------------
    full_size = int(np.prod(full_shape, dtype=np.float64)) if full_shape else 1
    if full_size > np.iinfo(np.int64).max:
        raise ValueError("array too large for element-wise operation")

    # fast path: all sparse operands share one coordinate pattern at the
    # full shape (x + x, chains over one mask) — skip the union/searches
    if (
        all(a.shape == full_shape for a in sparse_args)
        and len({a.nnz for a in sparse_args}) == 1
        and (
            len(sparse_args) == 1
            or all(
                a.coords is sparse_args[0].coords or np.array_equal(np.asarray(a.coords), np.asarray(sparse_args[0].coords))
                for a in sparse_args[1:]
            )
        )
    ):
        union_coords = np.asarray(sparse_args[0].coords)
        values = [
            np.asarray(a.data) if isinstance(a, COO) else _gather_dense(a, union_coords, full_shape) for a in args
        ]
        return _finish_elemwise(
            func, values, union_coords, full_shape, fill_value, out_dtype, dtype, kwargs, out_format, out_kwargs
        )

    k_sp = len(sparse_args)

    # native merge fast path: 2 distinct same-shape sparse operands hit the
    # C++ single-pass sorted-union join (role of the reference's Numba
    # two-pointer `_match_arrays`, `_umath.py:53`); {+,-,*} on float data
    # with +0.0 fills additionally fuse evaluate+prune into the same pass.
    if (
        k_sp == 2
        and sparse_args[0] is not sparse_args[1]
        and all(a.shape == full_shape for a in sparse_args)
        and sparse_args[0].nnz + sparse_args[1].nnz >= _native.NATIVE_MIN_NNZ
        and _native.get_lib() is not None
    ):
        a0, a1 = sparse_args
        d0 = np.asarray(a0.data)
        d1 = np.asarray(a1.data)
        name = _FUSED_UFUNCS.get(func)
        fusable = (
            name is not None
            and len(args) == 2
            and args[0] is a0
            and args[1] is a1
            and not kwargs
            and dtype is None
            and d0.dtype == d1.dtype
            and d0.dtype in (np.float64, np.float32, np.int64)
            and out_dtype == d0.dtype
            and _is_pos_zero_scalar(a0.fill_value)
            and _is_pos_zero_scalar(a1.fill_value)
            and _is_pos_zero_scalar(fill_value)
        )
        if fusable and a0.ndim == 2:
            # 2-D: merge the coordinate pairs directly (no linearize/unravel)
            c0 = np.asarray(a0.coords)
            c1 = np.asarray(a1.coords)
            fused2 = _native.fused_join_2d(name, c0[0], c0[1], d0, c1[0], c1[1], d1, full_shape[1])
            if fused2 is not None:
                r_out, c_out, vals = fused2
                out = COO._make(
                    np.stack([r_out, c_out]),
                    vals,
                    full_shape,
                    np.asarray(fill_value, dtype=out_dtype)[()],
                )
                return _to_output_format(out, out_format, out_kwargs)
        lin0 = np.asarray(a0.linear_loc()).astype(np.int64, copy=False)
        lin1 = np.asarray(a1.linear_loc()).astype(np.int64, copy=False)
        if fusable:
            fused = _native.fused_join(name, lin0, d0, lin1, d1)
            if fused is not None:
                keys, vals = fused
                out = COO._make(
                    _unravel(keys, full_shape),
                    vals,
                    full_shape,
                    np.asarray(fill_value, dtype=out_dtype)[()],
                )
                return _to_output_format(out, out_format, out_kwargs)
        # one-pass variant: values materialized during the merge itself
        v0 = v1 = None
        if d0.dtype == d1.dtype and d0.dtype in (np.float64, np.float32):
            jv = _native.union_join_values(lin0, d0, a0.fill_value, lin1, d1, a1.fill_value)
            if jv is not None:
                keys, v0, v1 = jv
        if v0 is None:
            joined = _native.union_join(lin0, lin1)
            if joined is None:
                keys = None
            else:
                keys, ia, ib = joined
        if keys is not None:
            union_coords = _unravel(keys, full_shape)
            values = []
            for a in args:
                if a is a0 or a is a1:
                    if v0 is not None:
                        values.append(v0 if a is a0 else v1)
                        continue
                    idx, d, fv = (ia, d0, a0.fill_value) if a is a0 else (ib, d1, a1.fill_value)
                    if d.size == 0:
                        vals = np.full(idx.shape, np.asarray(fv, dtype=d.dtype))
                    else:
                        vals = d[np.maximum(idx, 0)]
                        np.copyto(vals, np.asarray(fv, dtype=d.dtype), where=idx < 0)
                    values.append(vals)
                elif isinstance(a, COO):  # pragma: no cover - defensive
                    values.append(_lookup_coo(a, union_coords, full_shape))
                else:
                    values.append(_gather_dense(a, union_coords, full_shape))
            return _finish_elemwise(
                func, values, union_coords, full_shape, fill_value, out_dtype, dtype, kwargs, out_format, out_kwargs
            )

    # merge fast path: 2-4 same-shape sparse operands — one packed sort of
    # the owner-tagged concatenated streams instead of
    # expand/unique/searchsorted per operand
    owner_bits = 2 if k_sp > 2 else 1
    if (
        2 <= k_sp <= 4
        and len({id(a) for a in sparse_args}) == k_sp
        and all(a.shape == full_shape for a in sparse_args)
        and full_size < (1 << (62 - owner_bits))
    ):
        lins = [np.asarray(a.linear_loc()) for a in sparse_args]
        packed = np.concatenate(
            [(lin << owner_bits) | i for i, lin in enumerate(lins)]
        )
        packed.sort(kind="stable")
        lin_s = packed >> owner_bits
        owner_s = packed & ((1 << owner_bits) - 1)
        is_new = np.empty(lin_s.shape, dtype=bool)
        is_new[0:1] = True
        np.not_equal(lin_s[1:], lin_s[:-1], out=is_new[1:])
        u_id = np.cumsum(is_new) - 1
        n_union = int(u_id[-1]) + 1 if lin_s.size else 0

        union = lin_s[is_new]
        union_coords = _unravel(union, full_shape)

        id_to_pos = {id(a): i for i, a in enumerate(sparse_args)}
        values = []
        for a in args:
            pos = id_to_pos.get(id(a)) if isinstance(a, COO) else None
            if pos is not None:
                sel = owner_s == pos
                vals = np.full(n_union, np.asarray(a.fill_value, dtype=np.asarray(a.data).dtype))
                vals[u_id[sel]] = np.asarray(a.data)
                values.append(vals)
            elif isinstance(a, COO):  # pragma: no cover - defensive
                values.append(_lookup_coo(a, union_coords, full_shape))
            else:
                values.append(_gather_dense(a, union_coords, full_shape))
        return _finish_elemwise(
            func, values, union_coords, full_shape, fill_value, out_dtype, dtype, kwargs, out_format, out_kwargs
        )

    expanded = [
        _expand_linear_coords(a, full_shape) for a in args if isinstance(a, COO)
    ]
    if expanded:
        union = np.unique(np.concatenate(expanded)) if len(expanded) > 1 else expanded[0]
    else:
        union = np.empty(0, dtype=np.int64)

    union_coords = _unravel(union, full_shape)

    # --- evaluate each operand at the union ----------------------------------
    values = []
    for a in args:
        if isinstance(a, COO):
            values.append(_lookup_coo(a, union_coords, full_shape))
        else:
            values.append(_gather_dense(a, union_coords, full_shape))
    return _finish_elemwise(
        func, values, union_coords, full_shape, fill_value, out_dtype, dtype, kwargs, out_format, out_kwargs
    )


def _finish_elemwise(func, values, union_coords, full_shape, fill_value, out_dtype, dtype, kwargs, out_format, out_kwargs):
    if dtype is not None:
        try:
            result_data = func(*values, dtype=dtype, **kwargs)
        except TypeError:
            # plain functions (np.round, …) take no dtype kwarg; the
            # out_dtype cast below enforces it instead
            result_data = func(*values, **kwargs)
    else:
        result_data = func(*values, **kwargs)
    result_data = np.asarray(result_data)
    if result_data.dtype != out_dtype:
        result_data = result_data.astype(out_dtype)
    if result_data.ndim == 0:
        result_data = np.broadcast_to(result_data, (union_coords.shape[1],)).copy()
    elif result_data.ndim == 2 and result_data.shape[0] == 1:
        result_data = result_data[0]

    # --- prune + build --------------------------------------------------------
    keep = ~equivalent(result_data, np.asarray(fill_value, dtype=out_dtype))
    if not keep.all():
        union_coords = union_coords[:, keep]
        result_data = result_data[keep]

    out = COO._make(
        union_coords,
        result_data,
        full_shape,
        np.asarray(fill_value, dtype=out_dtype)[()],
    )
    return _to_output_format(out, out_format, out_kwargs)


def _choose_output_format(args):
    """all-DOK → DOK; all-GCXS → GCXS with common compressed_axes; else COO.

    Mirrors reference ``_umath.py:416-427``.
    """
    from ..core.dok import DOK
    from ..core.gcxs import GCXS

    sparse_args = [a for a in args if isinstance(a, SparseArray)]
    if sparse_args and all(isinstance(a, DOK) for a in sparse_args):
        return "dok", {}
    if sparse_args and all(isinstance(a, GCXS) for a in sparse_args):
        axes = {a.compressed_axes for a in sparse_args}
        if len(axes) == 1:
            return "gcxs", {"compressed_axes": sparse_args[0].compressed_axes}
        return "gcxs", {}
    return "coo", {}


def _to_output_format(out, fmt, fmt_kwargs):
    if fmt == "coo":
        return out
    return out.asformat(fmt, **fmt_kwargs)


def _align_shape(shape, full_shape):
    """Prepend 1s so ``shape`` has the same rank as ``full_shape``."""
    return (1,) * (len(full_shape) - len(shape)) + tuple(shape)


def _expand_linear_coords(a, full_shape):
    """Linearized (row-major, in ``full_shape`` space) coordinates of all
    result positions covered by ``a``'s stored entries under broadcasting.

    A stored entry at an extent-1 dim that broadcasts to extent ``e``
    covers all ``e`` indices — a cartesian expansion (reference
    ``_get_expanded_coords_data`` ``_umath.py:220-277``). Returned sorted.
    """
    ashape = _align_shape(a.shape, full_shape)
    coords = np.asarray(a.coords)
    nnz = coords.shape[1]

    # base linear contribution of non-broadcast dims
    base = np.zeros(nnz, dtype=np.int64)
    strides = _strides(full_shape)
    bcast_extents = []
    bcast_strides = []
    for d_full in range(len(full_shape)):
        d_a = d_full - (len(full_shape) - len(a.shape))
        if ashape[d_full] == full_shape[d_full]:
            if d_a >= 0 and a.shape[d_a] != 1:
                base += coords[d_a].astype(np.int64) * strides[d_full]
            # extent-1 matching extent-1: index 0, contributes nothing
        else:
            # broadcast dim: covers every index
            bcast_extents.append(full_shape[d_full])
            bcast_strides.append(strides[d_full])

    if not bcast_extents:
        return np.sort(base) if nnz else base

    # cartesian product of broadcast offsets
    offsets = np.zeros(1, dtype=np.int64)
    for e, s in zip(bcast_extents, bcast_strides):
        offsets = (offsets[:, None] + (np.arange(e, dtype=np.int64) * s)[None, :]).reshape(-1)
    out = (base[:, None] + offsets[None, :]).reshape(-1)
    out.sort()
    return out


def _gcxs_fused_fast(func, args, kwargs):
    """{+,-,×} of two same-layout zero-fill GCXS operands directly on the
    compressed buffers — uncompress indptr, fused 2-D merge in internal
    (row, col) space, rebuild indptr. No COO round-trip (the reference
    always converts, ``_umath.py:436``). Returns None when not applicable."""
    from ..core.gcxs import GCXS, _uncompress_indptr_np
    from ..native import build_indptr

    name = _FUSED_UFUNCS.get(func)
    if (
        name is None
        or kwargs
        or len(args) != 2
        or not all(type(a) is GCXS or isinstance(a, GCXS) for a in args)
    ):
        return None
    a0, a1 = args
    if (
        a0 is a1
        or a0.shape != a1.shape
        or a0.compressed_axes != a1.compressed_axes
        or a0.dtype != a1.dtype
        or a0.dtype not in (np.float64, np.float32, np.int64)
        or not _is_pos_zero_scalar(a0.fill_value)
        or not _is_pos_zero_scalar(a1.fill_value)
        or a0.nnz + a1.nnz < _native.NATIVE_MIN_NNZ
        or _native.get_lib() is None
    ):
        return None
    row_size, col_size = a0._compressed_shape
    r0 = _uncompress_indptr_np(np.asarray(a0.indptr))
    r1 = _uncompress_indptr_np(np.asarray(a1.indptr))
    c0 = np.asarray(a0.indices).astype(r0.dtype, copy=False)
    c1 = np.asarray(a1.indices).astype(r1.dtype, copy=False)
    fused = _native.fused_join_2d(name, r0, c0, np.asarray(a0.data), r1, c1, np.asarray(a1.data), col_size)
    if fused is None:
        return None
    r_out, c_out, v_out = fused
    indptr = build_indptr(r_out, row_size)
    idx_dtype = np.asarray(a0.indices).dtype
    return GCXS._make(
        v_out,
        c_out.astype(idx_dtype, copy=False),
        indptr.astype(np.asarray(a0.indptr).dtype, copy=False),
        a0.shape,
        a0.compressed_axes,
        np.asarray(func(a0.fill_value, a1.fill_value), dtype=v_out.dtype)[()],
    )


def _strides(shape):
    strides = [0] * len(shape)
    s = 1
    for d in range(len(shape) - 1, -1, -1):
        strides[d] = s
        s *= shape[d]
    return strides


def _unravel(linear, shape):
    ndim = len(shape)
    out = np.empty((ndim, linear.size), dtype=np.int64)
    if ndim == 0:
        return out
    if linear.size >= _native.NATIVE_MIN_NNZ and all(shape):
        native = _native.unravel(linear, shape)
        if native is not None:
            return native
    # divmod chain (one divide per dim, reusing the running quotient) —
    # ~2x fewer integer divides than the stride form
    rem = np.asarray(linear, dtype=np.int64)
    for d in range(ndim - 1, 0, -1):
        if shape[d]:
            rem, out[d] = np.divmod(rem, shape[d])
        else:
            out[d] = 0
    out[0] = rem
    return out


def _lookup_coo(a, union_coords, full_shape):
    """Value of operand ``a`` at each union coordinate: stored value when the
    (broadcast-mapped) coordinate is present, else ``a.fill_value``."""
    offset = len(full_shape) - a.ndim
    # map union coords into a's index space (extent-1 dims -> 0)
    if a.ndim:
        strides = _strides(a.shape)
        lin = np.zeros(union_coords.shape[1], dtype=np.int64)
        for d_a in range(a.ndim):
            if a.shape[d_a] == 1:
                continue
            lin += union_coords[offset + d_a].astype(np.int64) * strides[d_a]
    else:
        lin = np.zeros(union_coords.shape[1], dtype=np.int64)

    a_lin = np.asarray(a.linear_loc())
    data = np.asarray(a.data)
    fv = np.asarray(a.fill_value)
    if a_lin.size == 0:
        return np.broadcast_to(fv, lin.shape).astype(data.dtype, copy=True)
    pos = np.searchsorted(a_lin, lin)
    pos_c = np.minimum(pos, a_lin.size - 1)
    found = a_lin[pos_c] == lin
    vals = data[pos_c]
    return np.where(found, vals, fv.astype(data.dtype))


def _gather_dense(a, union_coords, full_shape):
    a = np.asarray(a)
    if a.ndim == 0:
        return a
    offset = len(full_shape) - a.ndim
    idx = tuple(
        np.zeros(union_coords.shape[1], dtype=np.int64) if a.shape[d] == 1 else union_coords[offset + d]
        for d in range(a.ndim)
    )
    return a[idx]


def broadcast_to(x, shape):
    """Broadcast a COO array to ``shape`` (reference ``_umath.py:344``)."""
    if not isinstance(x, COO):
        if isinstance(x, SparseArray):
            x = x.tocoo()
        else:
            return np.broadcast_to(x, shape)
    shape = tuple(int(s) for s in shape)
    if x.shape == shape:
        return x
    # validate
    np.broadcast_shapes(x.shape, shape)

    lin = _expand_linear_coords(x, shape)
    coords = _unravel(lin, shape)
    # replicate data in the same cartesian order used by _expand_linear_coords
    ashape = _align_shape(x.shape, shape)
    n_bcast = 1
    for d in range(len(shape)):
        if ashape[d] != shape[d]:
            n_bcast *= shape[d]
    data = np.repeat(np.asarray(x.data), n_bcast)
    # _expand_linear_coords sorts its output; rebuild pairing via canonical ctor
    base_lin = _expand_linear_coords_unsorted(x, shape)
    order = np.argsort(base_lin, kind="stable")
    coords = _unravel(base_lin[order], shape)
    data = data[order]
    return COO._make(coords, data, shape, x.fill_value)


def _expand_linear_coords_unsorted(a, full_shape):
    ashape = _align_shape(a.shape, full_shape)
    coords = np.asarray(a.coords)
    nnz = coords.shape[1]
    base = np.zeros(nnz, dtype=np.int64)
    strides = _strides(full_shape)
    bcast_extents = []
    bcast_strides = []
    for d_full in range(len(full_shape)):
        d_a = d_full - (len(full_shape) - len(a.shape))
        if ashape[d_full] == full_shape[d_full]:
            if d_a >= 0 and a.shape[d_a] != 1:
                base += coords[d_a].astype(np.int64) * strides[d_full]
        else:
            bcast_extents.append(full_shape[d_full])
            bcast_strides.append(strides[d_full])
    offsets = np.zeros(1, dtype=np.int64)
    for e, s in zip(bcast_extents, bcast_strides):
        offsets = (offsets[:, None] + (np.arange(e, dtype=np.int64) * s)[None, :]).reshape(-1)
    return (base[:, None] + offsets[None, :]).reshape(-1)
