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

import jax
import jax.numpy as jnp

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
]


def _triplet(a):
    coords = jnp.asarray(a.coords)
    return coords[0], coords[1], jnp.asarray(a.data)


def spmm(a: COO, dense):
    """``a @ dense`` → dense array; traceable (zero fill assumed)."""
    r, c, d = _triplet(a)
    return _kdot.coo_spmm(r, c, d, dense, n_rows=a.shape[0])


def spmv(a: COO, x):
    r, c, d = _triplet(a)
    return _kdot.coo_spmv(r, c, d, x, n_rows=a.shape[0])


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
