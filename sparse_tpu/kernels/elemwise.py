"""Traceable (jit-able) sparse elementwise — capacity-bounded union.

The eager engine (``ops/elemwise.py``) compacts results host-side; inside
``jit`` no host sync is possible, so this kernel returns the union *padded*
to the static bound ``nnz_a + nnz_b`` with an out-of-range sentinel
coordinate, plus the true count as a traced scalar — the same
capacity/padding discipline as ``kernels/spgemm.py``.

Supports two canonical same-shape COO operands (the jit-relevant case:
device-resident pipelines over fixed patterns use the even cheaper
same-pattern path for free since data arrays just combine elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("func", "size"))
def coo_elemwise_union(lin_a, data_a, fv_a, lin_b, data_b, fv_b, *, func, size):
    """Apply binary ``func`` over the union of two sorted linear-coordinate
    streams of one logical shape (``size`` = number of logical elements).

    Returns ``(lin_out, data_out, fill_out, nnz_out)`` where the arrays have
    length ``nnz_a + nnz_b``; entries past ``nnz_out`` carry linear
    coordinate ``size`` (out of range) and the output fill value. The result
    is NOT pruned (entries equal to the fill value are kept) — pruning is a
    data-dependent compaction, eager-only.
    """
    na = lin_a.shape[0]
    nb = lin_b.shape[0]
    cap = na + nb

    fill_out = func(fv_a, fv_b)

    # merge the two sorted streams: concatenated + sort (XLA sort is the
    # TPU-friendly merge)
    lin_all = jnp.concatenate([lin_a, lin_b])
    owner = jnp.concatenate([jnp.zeros(na, jnp.int32), jnp.ones(nb, jnp.int32)])
    val_all = jnp.concatenate([data_a, data_b.astype(data_a.dtype)])
    order = jnp.argsort(lin_all, stable=True)
    lin_s = lin_all[order]
    owner_s = owner[order]
    val_s = val_all[order]

    # runs of equal coordinates (length 1 or 2) collapse to one union entry
    is_new = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
    seg = jnp.cumsum(is_new) - 1
    nnz_out = is_new.sum()

    # per union entry: value of a (stored or fill), value of b
    a_contrib = jnp.where(owner_s == 0, val_s, 0)
    b_contrib = jnp.where(owner_s == 1, val_s, 0)
    a_present = jax.ops.segment_max(
        (owner_s == 0).astype(jnp.int32), seg, num_segments=cap, indices_are_sorted=True
    ).astype(bool)
    b_present = jax.ops.segment_max(
        (owner_s == 1).astype(jnp.int32), seg, num_segments=cap, indices_are_sorted=True
    ).astype(bool)
    a_val = jax.ops.segment_sum(a_contrib, seg, num_segments=cap, indices_are_sorted=True)
    b_val = jax.ops.segment_sum(b_contrib, seg, num_segments=cap, indices_are_sorted=True)
    a_val = jnp.where(a_present, a_val, jnp.asarray(fv_a, a_val.dtype))
    b_val = jnp.where(b_present, b_val, jnp.asarray(fv_b, b_val.dtype))

    lin_u = jax.ops.segment_min(lin_s, seg, num_segments=cap, indices_are_sorted=True)

    slot = jnp.arange(cap)
    in_range = slot < nnz_out
    lin_out = jnp.where(in_range, lin_u, size)
    data_out = jnp.where(in_range, func(a_val, b_val), fill_out)
    return lin_out, data_out, fill_out, nnz_out
