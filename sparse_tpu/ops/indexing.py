"""COO ``__getitem__``: basic (int/slice/newaxis) and advanced (1-D integer
array, incl. multiple broadcast arrays) indexing.

The reference computes per-entry masks with sequential binary-search
pair-walking Numba kernels (``_coo/indexing.py:291-663``). Here the mask is
one vectorized boolean reduction over nnz (fully data-parallel — the form a
VPU likes), and advanced indices are resolved with a sort-join
(``argsort`` + ``searchsorted`` + ``repeat``) instead of per-entry loops.

Numpy semantics notes (same as the reference):

- advanced indices must be 1-D; they broadcast together; if the advanced
  positions are non-contiguous the advanced result dimension moves to the
  front.
"""

from __future__ import annotations

from numbers import Integral

import numpy as np

from .slicing import normalize_index

__all__ = ["getitem"]


def _getitem_leading_fast(x, index, coords, data, last_ellipsis=False):
    """O(log nnz + output) selection on the leading axis of a canonical COO
    (rows sorted): single row, step-1 row range, or 1-D integer row list,
    with all trailing dims taken whole — the role of the reference's
    binary-search "pairs" kernels (``_coo/indexing.py:494``)."""
    from ..core.coo import COO

    if x.ndim == 0 or len(index) != x.ndim or any(k is None for k in index):
        return NotImplemented
    for k, dim in zip(index[1:], x.shape[1:]):
        if not (isinstance(k, slice) and k == slice(0, dim, 1)):
            return NotImplemented
    k0 = index[0]
    rows = coords[0]

    if isinstance(k0, Integral):
        k0 = int(k0)
        lo, hi = np.searchsorted(rows, [k0, k0 + 1])
        if x.ndim == 1:
            if last_ellipsis:
                return COO(
                    np.empty((0, hi - lo), dtype=np.intp),
                    data[lo:hi],
                    shape=(),
                    has_duplicates=False,
                    sorted=True,
                    fill_value=x.fill_value,
                )
            return data[lo][()] if hi > lo else np.asarray(x.fill_value, dtype=x.dtype)[()]
        return COO._make(coords[1:, lo:hi], data[lo:hi], x.shape[1:], x.fill_value)

    if isinstance(k0, slice):
        start, stop, step = k0.start, k0.stop, k0.step
        if step != 1 or stop <= start:
            return NotImplemented
        lo, hi = np.searchsorted(rows, [start, stop])
        out_coords = coords[:, lo:hi].copy()
        out_coords[0] -= start
        return COO._make(out_coords, data[lo:hi], (stop - start,) + x.shape[1:], x.fill_value)

    k0 = np.asarray(k0)
    if k0.ndim != 1 or k0.dtype.kind not in "iu":
        return NotImplemented
    # join the query rows against the sorted row stream
    lo = np.searchsorted(rows, k0, side="left")
    hi = np.searchsorted(rows, k0, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total:
        ends = np.cumsum(counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        src = np.repeat(lo, counts) + within
        new_rows = np.repeat(np.arange(k0.size, dtype=coords.dtype), counts)
        out_coords = np.concatenate([new_rows[None, :], coords[1:, src]], axis=0)
        out_data = data[src]
    else:
        out_coords = np.empty((x.ndim, 0), dtype=coords.dtype)
        out_data = data[:0]
    # output is canonical: query order is the new row order; within each
    # query the source range is ascending in the remaining dims
    return COO._make(out_coords, out_data, (k0.size,) + x.shape[1:], x.fill_value)


def getitem(x, index):
    from ..core.coo import COO

    if isinstance(index, tuple) and index == () and x.ndim == 0:
        return x.data[-1][()] if x.nnz else np.asarray(x.fill_value)[()]

    # structured-dtype field access: select the field from data (+subarray
    # dims become new trailing dense-patterned axes), reference
    # ``_coo/indexing.py:33-55``
    if isinstance(index, str):
        field_data = np.asarray(x.data)[index]
        idx = np.where(field_data)
        data = field_data[idx].flatten()
        coords = list(np.asarray(x.coords)[:, idx[0]])
        coords.extend(idx[1:])
        fv_field = np.asarray(np.asarray(x.fill_value)[index]).flatten()
        fill_value = fv_field[0] if fv_field.size else np.zeros((), dtype=field_data.dtype.base)[()]
        if fv_field.size and not np.all(fv_field == fv_field[0]):
            raise ValueError("Fill-values in the array are inconsistent.")
        return COO(
            np.stack(coords, axis=0) if coords else np.empty((0, data.size), dtype=np.intp),
            data,
            shape=x.shape + np.asarray(x.data).dtype[index].shape,
            has_duplicates=False,
            sorted=True,
            fill_value=fill_value,
        )

    # scalar results: a trailing explicit Ellipsis yields a 0-d COO, a pure
    # integer index yields a plain scalar (reference ``_coo/indexing.py:60,115``)
    last_ellipsis = index is Ellipsis or (
        isinstance(index, tuple) and len(index) > 0 and index[-1] is Ellipsis
    )

    index = normalize_index(index, x.shape)

    # identity fast path (fresh object so `out=`-style mutation is safe)
    if all(isinstance(k, slice) and k == slice(0, d, 1) for k, d in zip(index, x.shape)) and len(
        [k for k in index if k is not None]
    ) == x.ndim and not any(k is None for k in index):
        return x.copy(deep=False)

    coords = np.asarray(x.coords)
    data = np.asarray(x.data)
    nnz = data.shape[0]

    fast = _getitem_leading_fast(x, index, coords, data, last_ellipsis)
    if fast is not NotImplemented:
        return fast

    mask = np.ones(nnz, dtype=bool)
    dim_entries = []  # aligned with `index`: dicts describing each output axis
    adv_positions = []
    adv_arrays = []
    adv_dims = []
    # numpy rule: integer indices become 0-d *advanced* indices when any
    # array index is present — their positions count for the
    # contiguous-vs-front placement of the advanced result dimension
    has_arrays = any(not isinstance(k, (Integral, slice, type(None))) for k in index)

    d = 0
    for pos, k in enumerate(index):
        if k is None:
            dim_entries.append({"kind": "new"})
            continue
        if isinstance(k, Integral):
            mask &= coords[d] == int(k)
            if has_arrays:
                adv_positions.append(pos)
                dim_entries.append({"kind": "advint"})
            else:
                dim_entries.append({"kind": "int"})
        elif isinstance(k, slice):
            start, stop, step = k.start, k.stop, k.step
            size = len(range(start, stop, step))
            if step > 0:
                m = (coords[d] >= start) & (coords[d] < stop)
                if step != 1:
                    m &= (coords[d] - start) % step == 0
                newc = (coords[d] - start) // step
            else:
                m = (coords[d] <= start) & (coords[d] > stop)
                if step != -1:
                    m &= (start - coords[d]) % (-step) == 0
                newc = (start - coords[d]) // (-step)
            mask &= m
            dim_entries.append({"kind": "slice", "size": size, "coord": newc, "reversed": step < 0})
        else:  # integer array
            adv_positions.append(pos)
            adv_arrays.append(np.asarray(k))
            adv_dims.append(d)
            dim_entries.append({"kind": "adv"})
        d += 1

    if adv_arrays:
        try:
            adv_bcast = np.broadcast_arrays(*adv_arrays)
        except ValueError as e:
            raise IndexError(f"shape mismatch among advanced indices: {e}") from None
        L = adv_bcast[0].shape[0] if adv_bcast[0].ndim else 1
        adv_bcast = [np.broadcast_to(a, (L,)) for a in adv_bcast]

    # filter entries by the basic-index mask
    sel = np.flatnonzero(mask)
    coords_sel = coords[:, sel]
    data_sel = data[sel]

    if adv_arrays:
        # join stored entries with the advanced index list on the advanced dims
        adv_shape = tuple(x.shape[dd] for dd in adv_dims)
        entry_key = np.ravel_multi_index(tuple(coords_sel[dd] for dd in adv_dims), adv_shape) if adv_dims else None
        query_key = np.ravel_multi_index(tuple(adv_bcast), adv_shape)

        order = np.argsort(query_key, kind="stable")
        sorted_q = query_key[order]
        lo = np.searchsorted(sorted_q, entry_key, side="left")
        hi = np.searchsorted(sorted_q, entry_key, side="right")
        counts = hi - lo
        total = int(counts.sum())
        rep_idx = np.repeat(np.arange(entry_key.size), counts)
        ends = np.cumsum(counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        adv_result_coord = order[np.repeat(lo, counts) + within]

        coords_sel = coords_sel[:, rep_idx]
        data_sel = data_sel[rep_idx]
    else:
        adv_result_coord = None
        L = None

    # assemble output coords/shape
    out_coords = []
    out_shape = []
    # advanced dim position: at first adv index if contiguous, else front
    if adv_arrays:
        adv_pos_sorted = sorted(adv_positions)
        contiguous = all(
            b - a == 1 for a, b in zip(adv_pos_sorted, adv_pos_sorted[1:])
        ) or len(adv_pos_sorted) == 1
        # "contiguous" must ignore interleaved None? numpy: adv separated by
        # slice/None moves to front. Treat any gap as non-contiguous.
        if not contiguous:
            out_coords.append(adv_result_coord)
            out_shape.append(L)
        adv_emitted = not contiguous
    else:
        adv_emitted = True

    sel_entry_iter = 0
    for pos, entry in enumerate(dim_entries):
        kind = entry["kind"]
        if kind == "new":
            out_coords.append(np.zeros(data_sel.shape[0], dtype=coords.dtype))
            out_shape.append(1)
        elif kind == "int":
            continue
        elif kind == "slice":
            c = entry["coord"][sel]
            if adv_result_coord is not None:
                c = c[rep_idx]
            out_coords.append(c)
            out_shape.append(entry["size"])
        elif kind in ("adv", "advint"):
            if not adv_emitted:
                out_coords.append(adv_result_coord)
                out_shape.append(L)
                adv_emitted = True

    if not out_shape:
        if last_ellipsis:
            return COO(
                np.empty((0, data_sel.shape[0]), dtype=np.intp),
                data_sel,
                shape=(),
                has_duplicates=False,
                sorted=True,
                fill_value=x.fill_value,
            )
        # scalar result
        if data_sel.size:
            return data_sel[0][()]
        return np.asarray(x.fill_value, dtype=x.dtype)[()]

    from ..core.coo import COO

    out_coords = np.stack(out_coords, axis=0) if out_coords else np.empty((0, data_sel.shape[0]), dtype=np.intp)
    return COO(
        out_coords,
        data_sel,
        shape=tuple(out_shape),
        has_duplicates=False,
        sorted=False,
        fill_value=x.fill_value,
    )
