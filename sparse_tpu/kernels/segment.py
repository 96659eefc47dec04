"""Segment reductions — the TPU-native replacement for the reference's
``ufunc.reduceat`` / Numba grouped-reduce kernels (``_coo/core.py:1601-1650``).

Two strategies:

- ``segment_reduce``: thin wrapper over ``jax.ops.segment_*`` (XLA scatter).
  Fine on CPU; on TPU scatter lowers to a serial loop, so the hot paths use:
- ``segment_sum_onehot_mm``: block-wise one-hot matrix-multiply — converts the
  scatter-add into MXU matmuls ``onehot(rows)ᵀ @ values``, the idiomatic way
  to run a segment-sum at high throughput on the TPU systolic array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_OPS = {
    "sum": jax.ops.segment_sum,
    "prod": jax.ops.segment_prod,
    "max": jax.ops.segment_max,
    "min": jax.ops.segment_min,
}


def segment_reduce(data, segment_ids, num_segments, op="sum", indices_are_sorted=True):
    """Reduce ``data`` by sorted ``segment_ids`` into ``num_segments`` slots."""
    fn = _OPS[op]
    return fn(data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted)


@functools.partial(jax.jit, static_argnames=("num_segments", "block_rows"))
def segment_sum_onehot_mm(values, segment_ids, *, num_segments, block_rows=512):
    """Segment-sum of ``values (nnz, N)`` by sorted ``segment_ids`` via
    one-hot matmul, blocked over the segment axis.

    For each block of ``block_rows`` output rows, builds the (nnz_blk ×
    block_rows) one-hot indicator of local segment ids and contracts it with
    the corresponding value rows on the MXU. Entries outside the block are
    masked to zero, so full (unblocked) ``values`` can be passed; the cost is
    one pass over ``values`` per block — use only when nnz per block is
    bounded, else prefer :func:`segment_reduce`.
    """
    nnz, n = values.shape
    num_blocks = -(-num_segments // block_rows)
    pad_segments = num_blocks * block_rows

    def body(b, _):
        base = b * block_rows
        local = segment_ids - base
        onehot = (local[None, :] == jnp.arange(block_rows, dtype=segment_ids.dtype)[:, None]).astype(values.dtype)
        out = jnp.dot(onehot, values, preferred_element_type=values.dtype)
        return out

    blocks = jax.lax.map(lambda b: body(b, None), jnp.arange(num_blocks))
    out = blocks.reshape(pad_segments, n)[:num_segments]
    return out
