"""Traceable XLA kernels for the sparse matmul family: SpMV, SpMM, SDDMM,
MTTKRP.

These are the TPU-native equivalents of the reference's Numba dot kernels
(``_common.py:543-1158``). They are pure jittable functions over plain
arrays; the eager op layer (``sparse_tpu.ops.dot``) orchestrates formats and
shapes around them, and ``bench.py`` / the distributed layer jit them
end-to-end.

Design notes
------------
- All inputs have static shapes (nnz is the length of ``data``), so XLA can
  tile and fuse freely.
- Segment sums over the sorted row ids use ``jax.ops.segment_sum`` by
  default; strategy "cumsum" (diff-of-prefix-sums at row boundaries) avoids
  XLA's serial scatter path on TPU.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

from .search import searchsorted_sorted_probes

DEFAULT_SEGMENT_STRATEGY = "scatter"


def on_cpu():
    """Context manager pinning uncommitted computation to the host CPU
    backend. The eager op layer uses this so numpy-backed arrays don't
    round-trip through a (possibly remote) accelerator; jitted/TPU callers
    simply don't enter it."""
    try:
        dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(dev)


@functools.partial(jax.jit, static_argnames=("n_rows", "strategy", "rows_sorted"))
def coo_spmm(rows, cols, data, dense, *, n_rows, strategy="scatter", rows_sorted=True):
    """``A @ B`` for COO ``A`` (zero fill) and dense ``B`` → dense.

    rows/cols/data: the COO triplet of A with shape (nnz,); dense: (K, N).
    Returns (n_rows, N). ``rows_sorted`` is the canonical-row-order hint
    (False for e.g. a CSC-derived triplet).
    """
    gathered = jnp.take(dense, cols, axis=0)
    prod = data[:, None] * gathered
    if strategy == "cumsum":
        return _sorted_segment_sum_cumsum(prod, rows, n_rows)
    return jax.ops.segment_sum(prod, rows, num_segments=n_rows, indices_are_sorted=rows_sorted)


@functools.partial(jax.jit, static_argnames=("n_rows", "strategy", "rows_sorted", "lane_gather"))
def coo_spmv(rows, cols, data, x, *, n_rows, strategy="scatter", rows_sorted=True, lane_gather=None):
    """``A @ x`` for COO ``A`` and dense vector ``x`` → dense (n_rows,).

    ``lane_gather`` reads x through a (K/128, 128) view (512-byte row
    gathers + a one-hot lane select) — ~1.6× over scalar gathers on TPU,
    where the gather unit is row-rate limited. Defaults on for TPU backends
    when K is a multiple of 128."""
    if lane_gather is None:
        lane_gather = jax.default_backend() not in ("cpu",)
    if lane_gather and x.shape[0] % 128 == 0:
        xt = x.reshape(-1, 128)
        g_rows = jnp.take(xt, cols // 128, axis=0)  # (nnz, 128)
        onehot = ((cols % 128)[:, None] == jnp.arange(128, dtype=cols.dtype)[None, :]).astype(x.dtype)
        gathered = jnp.einsum("el,el->e", g_rows, onehot)
    else:
        gathered = jnp.take(x, cols)
    prod = data * gathered
    if strategy == "cumsum":
        return _sorted_segment_sum_cumsum(prod[:, None], rows, n_rows)[:, 0]
    return jax.ops.segment_sum(prod, rows, num_segments=n_rows, indices_are_sorted=rows_sorted)


@functools.partial(jax.jit, static_argnames=("n_out_cols",))
def dense_coo_matmul(dense, rows, cols, data, *, n_out_cols):
    """``B @ A``: dense ``B (M, K)`` × COO ``A (K, N)`` → dense (M, N)."""
    gathered = jnp.take(dense, rows, axis=1)  # (M, nnz)
    prod = gathered * data[None, :]
    out = jax.ops.segment_sum(prod.T, cols, num_segments=n_out_cols, indices_are_sorted=False)
    return out.T


# Above this nnz, SDDMM runs as a lax.scan over entry chunks: the
# per-chunk gathered (chunk, K) blocks stay VMEM-resident instead of
# materializing two (nnz, K) streams in HBM — 14.0 -> 9.9 ms at the
# flagship shape (65536^2 mask, 2.1M nnz, K=128; chunk sweep
# 2k/4k/8k/16k/32k/64k/128k/256k -> 26.0/10.7/10.1/9.9/9.8/10.4/11.1/33.1
# in experiments/sddmm_chunked{,2}.py).  Small problems keep the
# monolithic form (scan overhead dominates).
SDDMM_CHUNK = 32768
SDDMM_CHUNK_MIN_NNZ = 4 * SDDMM_CHUNK


@jax.jit
def sddmm(rows, cols, sample_data, lhs, rhs):
    """Sampled dense-dense matmul: for each stored (i, j, s) return
    ``s * (lhs[i, :] @ rhs[:, j])``. lhs (M, K), rhs (K, N) → (nnz,).

    Large nnz runs chunked (see ``SDDMM_CHUNK``): identical results up to
    f32 rounding (same per-entry dot order)."""
    nnz = rows.shape[0]
    rhs_t = rhs.T
    if nnz >= SDDMM_CHUNK_MIN_NNZ:
        chunk = SDDMM_CHUNK
        pad = (-nnz) % chunk
        rows_p = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)]).reshape(-1, chunk)
        cols_p = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)]).reshape(-1, chunk)
        sd_p = jnp.concatenate([sample_data, jnp.zeros(pad, sample_data.dtype)]).reshape(-1, chunk)

        def body(_, x):
            r_, c_, s_ = x
            lg = jnp.take(lhs, r_, axis=0)
            rg = jnp.take(rhs_t, c_, axis=0)
            return None, s_ * jnp.sum(lg * rg, axis=-1)

        _, out = jax.lax.scan(body, None, (rows_p, cols_p, sd_p))
        return out.reshape(-1)[:nnz]
    lg = jnp.take(lhs, rows, axis=0)  # (nnz, K)
    rg = jnp.take(rhs_t, cols, axis=0)  # (nnz, K)
    return sample_data * jnp.sum(lg * rg, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_rows",))
def mttkrp(coords_i, coords_j, coords_k, data, c, d, *, n_rows):
    """Matricized-tensor-times-Khatri-Rao-product for a 3-D COO tensor B:
    ``out[i, r] = sum_{(i,j,k) in B} B[i,j,k] * C[j, r] * D[k, r]``.

    The hot kernel of the reference's mttkrp example workload
    (``examples/mttkrp_example.py``)."""
    prod = data[:, None] * jnp.take(c, coords_j, axis=0) * jnp.take(d, coords_k, axis=0)
    return jax.ops.segment_sum(prod, coords_i, num_segments=n_rows, indices_are_sorted=True)


def _sorted_segment_sum_cumsum(values, segment_ids, num_segments):
    """Segment-sum for sorted ids via difference of prefix sums — avoids the
    serial XLA scatter on TPU. values: (nnz, N)."""
    nnz = values.shape[0]
    cs = jnp.cumsum(values, axis=0)
    # ends[m] = index of last entry of segment m (exclusive end - 1).
    # searchsorted, NOT bincount: jnp.bincount lowers to the serial XLA
    # scatter this function exists to avoid (r4, same finding as
    # kernels/spgemm.py)
    ends = searchsorted_sorted_probes(
        segment_ids, jnp.arange(num_segments, dtype=segment_ids.dtype), side="right"
    )
    counts = jnp.diff(jnp.concatenate([jnp.zeros(1, ends.dtype), ends]))
    hi = jnp.where((ends > 0)[:, None], cs[jnp.clip(ends - 1, 0, nnz - 1)], 0)
    starts = ends - counts
    lo = jnp.where((starts > 0)[:, None], cs[jnp.clip(starts - 1, 0, nnz - 1)], 0)
    return hi - lo


def uncompress_indptr(indptr, nnz):
    """Row id of each stored entry, from CSR indptr. Traceable."""
    positions = jnp.arange(nnz)
    return searchsorted_sorted_probes(indptr, positions, side="right") - 1


@functools.partial(jax.jit, static_argnames=("shape", "axes"))
def coo_sum_axes_dense(coords, data, *, shape, axes):
    """Traceable ``x.sum(axis=axes)`` for a COO pytree's triplet, returning
    the (dense) reduced array — the jit-compatible reduction for in-graph
    pipelines (eager reductions keep sparse outputs; see
    ``core/base.py::reduce``)."""
    keep = tuple(d for d in range(len(shape)) if d not in set(axes))
    keep_shape = tuple(shape[d] for d in keep)
    keep_size = 1
    for s in keep_shape:
        keep_size *= s
    if keep:
        lin = jnp.zeros(data.shape[0], dtype=jnp.int32)
        stride = 1
        for d in reversed(keep):
            lin = lin + coords[d].astype(jnp.int32) * stride
            stride *= shape[d]
        out = jax.ops.segment_sum(data, lin, num_segments=keep_size)
        return out.reshape(keep_shape)
    return data.sum().reshape(())
