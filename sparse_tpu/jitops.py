"""Traceable operations over sparse pytrees — the in-``jit`` op surface.

The eager namespace (``sparse_tpu.*``) is host-orchestrated with exact
dynamic nnz; inside ``jit``/``pjit`` shapes must be static, so this module
exposes the subset that works on ``COO``/``GCXS`` **pytrees with fixed
patterns** (plus capacity-bounded ops for pattern-changing cases). It is
the role the Finch backend's lazy fused mode plays in the reference
ecosystem, realized as ordinary JAX composition: everything here is
differentiable and shardable.

Pattern-preserving (exact, no capacities):
  ``spmm, spmv, sddmm, mttkrp, sum_dense, scale, map_data,
  add_same_pattern, mul_same_pattern``
Capacity-bounded (padded outputs + traced counts):
  ``union_elemwise`` (see ``kernels.elemwise``), ``spgemm``
  (see ``kernels.spgemm``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .kernels.search import searchsorted_sorted_probes as _ssp

from .core.coo import COO
from .kernels import dot as _kdot

__all__ = [
    "spmm",
    "spmv",
    "sddmm",
    "mttkrp",
    "sum_dense",
    "scale",
    "map_data",
    "add_same_pattern",
    "mul_same_pattern",
    "transpose",
    "union_elemwise",
    "spgemm",
]


def _triplet(a):
    """(rows, cols, data) from a COO — or a 2-D CSR/CSC-form GCXS pytree
    (indptr expands to row ids with a static-shape searchsorted; nnz is a
    static pytree dimension, so this stays traceable)."""
    from .core.gcxs import GCXS

    if isinstance(a, GCXS):
        if a.ndim != 2 or a.compressed_axes not in ((0,), (1,)):
            raise ValueError("traceable ops accept 2-D CSR/CSC-form GCXS")
        indptr = jnp.asarray(a.indptr)
        idx = jnp.asarray(a.indices)
        nnz = idx.shape[0]
        comp_ids = (
            _ssp(indptr, jnp.arange(nnz, dtype=indptr.dtype), side="right") - 1
        ).astype(idx.dtype)
        if a.compressed_axes == (0,):
            return comp_ids, idx, jnp.asarray(a.data)
        return idx, comp_ids, jnp.asarray(a.data)
    coords = jnp.asarray(a.coords)
    return coords[0], coords[1], jnp.asarray(a.data)


def spmm(a: COO, dense):
    """``a @ dense`` → dense array; traceable (zero fill assumed).
    Accepts a COO or a 2-D CSR/CSC GCXS pytree."""
    r, c, d = _triplet(a)
    return _kdot.coo_spmm(r, c, d, dense, n_rows=a.shape[0], rows_sorted=not _is_csc(a))


def spmv(a: COO, x):
    r, c, d = _triplet(a)
    return _kdot.coo_spmv(r, c, d, x, n_rows=a.shape[0], rows_sorted=not _is_csc(a))


def _is_csc(a):
    from .core.gcxs import GCXS

    return isinstance(a, GCXS) and a.compressed_axes == (1,)


def sddmm(s: COO, lhs, rhs):
    """``s ⊙ (lhs @ rhs)`` at s's pattern → COO with the same coords."""
    r, c, d = _triplet(s)
    vals = _kdot.sddmm(r, c, d, lhs, rhs)
    return COO._make(s.coords, vals, s.shape, jnp.zeros((), vals.dtype))


def mttkrp(t: COO, c, d):
    coords = jnp.asarray(t.coords)
    return _kdot.mttkrp(coords[0], coords[1], coords[2], jnp.asarray(t.data), c, d, n_rows=t.shape[0])


def sum_dense(a: COO, axes):
    """``a.sum(axis=axes)`` → dense array (zero fill assumed); traceable."""
    return _kdot.coo_sum_axes_dense(jnp.asarray(a.coords), jnp.asarray(a.data), shape=a.shape, axes=tuple(axes))


def scale(a: COO, scalar):
    """Multiply stored values by a (traced) scalar."""
    return COO._make(a.coords, jnp.asarray(a.data) * scalar, a.shape, a.fill_value)


def map_data(a: COO, fn):
    """Apply an elementwise fn to the stored values (zero fill must map to
    zero for the result to remain consistent — caller's responsibility)."""
    return COO._make(a.coords, fn(jnp.asarray(a.data)), a.shape, a.fill_value)


def add_same_pattern(a: COO, b: COO):
    """``a + b`` for operands sharing one coordinate pattern (e.g. results
    of sddmm/map_data chains over one mask)."""
    return COO._make(a.coords, jnp.asarray(a.data) + jnp.asarray(b.data), a.shape, a.fill_value)


def mul_same_pattern(a: COO, b: COO):
    return COO._make(a.coords, jnp.asarray(a.data) * jnp.asarray(b.data), a.shape, a.fill_value)


def _linearize(coords, shape):
    out = jnp.zeros(coords.shape[1], dtype=jnp.int64)
    stride = 1
    for d in range(len(shape) - 1, -1, -1):
        out = out + coords[d].astype(jnp.int64) * stride
        stride *= shape[d]
    return out


def _unravel(lin, shape, dtype):
    coords = []
    rem = lin
    for s in reversed(shape):
        coords.append((rem % s).astype(dtype))
        rem = rem // s
    return jnp.stack(coords[::-1])


def transpose(a: COO, axes=None):
    """Traceable transpose of a canonical COO pytree (exact — a permutation
    of nnz values needs no capacity): permute the coordinate rows, re-sort by
    the new linearization, and return a canonical COO with the same nnz.
    The eager path does this with one host counting scatter; in-jit it is a
    single XLA key sort (role of reference ``_coo/core.py:725``)."""
    ndim = a.ndim
    if axes is None:
        axes = tuple(range(ndim))[::-1]
    axes = tuple(int(ax) % ndim for ax in axes)
    if sorted(axes) != list(range(ndim)):
        raise ValueError("repeated or incomplete axis in transpose")
    new_shape = tuple(a.shape[ax] for ax in axes)
    if axes == tuple(range(ndim)):
        return a
    coords = jnp.asarray(a.coords)[list(axes), :]
    order = jnp.argsort(_linearize(coords, new_shape))
    return COO._make(coords[:, order], jnp.asarray(a.data)[order], new_shape, a.fill_value)


def union_elemwise(func, a: COO, b: COO):
    """Capacity-bounded traceable elemwise over two same-shape COO pytrees.

    Returns ``(out, nnz)``: ``out`` is a COO with static nnz capacity
    ``a.nnz + b.nnz`` whose entries past the traced count ``nnz`` are padding
    (coordinate 0 with data equal to the result fill value), and whose
    fill value is ``func(a.fill_value, b.fill_value)``. No pruning happens
    (a data-dependent compaction; eager-only) — call ``.compact()`` host-side
    or keep chaining pattern-preserving jitops. For zero result fill the
    padding entries are numerically inert in matmul/reduction kernels.
    """
    if a.shape != b.shape:
        raise ValueError(f"union_elemwise requires equal shapes, got {a.shape} vs {b.shape}")
    from .kernels.elemwise import coo_elemwise_union

    size = 1
    for s in a.shape:
        size *= s
    lin_a = _linearize(jnp.asarray(a.coords), a.shape)
    lin_b = _linearize(jnp.asarray(b.coords), b.shape)
    lin_out, data_out, fill_out, nnz_out = coo_elemwise_union(
        lin_a,
        jnp.asarray(a.data),
        jnp.asarray(a.fill_value),
        lin_b,
        jnp.asarray(b.data),
        jnp.asarray(b.fill_value),
        func=func,
        size=size,
    )
    lin_safe = jnp.where(lin_out >= size, 0, lin_out)
    coords = _unravel(lin_safe, a.shape, jnp.asarray(a.coords).dtype)
    return COO._make(coords, data_out, a.shape, fill_out), nnz_out


def spgemm(a: COO, b: COO, *, product_capacity, out_capacity=None):
    """Capacity-bounded traceable ``a @ b`` for 2-D zero-fill COO pytrees.

    ``product_capacity`` must bound the number of expanded partial products
    (``kernels.spgemm.product_count`` computes it host-side). Returns
    ``(out, nnz)`` where ``out`` has static capacity ``out_capacity``
    (default ``product_capacity``) and entries past the traced count are
    padding with coordinate 0 and zero data.
    """
    from .kernels.spgemm import esc_spgemm

    if a.ndim != 2 or b.ndim != 2:
        raise ValueError("traceable spgemm supports 2-D operands")
    if out_capacity is None:
        out_capacity = product_capacity
    ac = jnp.asarray(a.coords)
    bc = jnp.asarray(b.coords)
    out_rows, out_cols, out_data, out_nnz = esc_spgemm(
        ac[0],
        ac[1],
        jnp.asarray(a.data),
        bc[0],
        bc[1],
        jnp.asarray(b.data),
        k=a.shape[1],
        n=b.shape[1],
        product_capacity=product_capacity,
        out_capacity=out_capacity,
    )
    sentinel = jnp.iinfo(jnp.int32).max
    rows_safe = jnp.where(out_rows == sentinel, 0, out_rows)
    coords = jnp.stack([rows_safe, out_cols]).astype(ac.dtype)
    out = COO._make(coords, out_data, (a.shape[0], b.shape[1]), jnp.zeros((), out_data.dtype))
    return out, out_nnz
