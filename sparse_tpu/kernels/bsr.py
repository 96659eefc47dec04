"""BSR — block compressed sparse row format and its Pallas SpMM kernel.

The unstructured formats (COO/GCXS) are bound by the TPU's random-gather
rate; block-sparse structure removes that bound: each stored 128×128 block
contracts on the MXU at full tile utilization, and the dense operand's
blocks are DMA'd by *scalar-prefetched* block indices
(``pltpu.PrefetchScalarGridSpec``), so the irregular access pattern drives
the pipeline instead of fighting it.

Kernel design (``bsr_spmm_pallas``):

- grid = (N-tiles, nnz-blocks), nnz-blocks innermost, stored row-major by
  (block-row, block-col);
- the output tile's index map depends only on the *block-row* of the current
  stored block, so consecutive stored blocks of one block-row revisit the
  same output tile in VMEM and accumulate for free;
- the dense operand's tile index map reads the prefetched block-col id;
- rows with no stored blocks are padded with one zero block host-side so
  every output tile gets initialized.

This is the TPU-native analogue of the role CUDA block-sparse kernels play
in GPU frameworks; nothing like it exists in the reference (scipy's BSR is
the closest cousin).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BSR(NamedTuple):
    """Block compressed sparse row matrix (zero fill).

    blocks: (n_blocks, bm, bn) stored dense blocks
    block_rows/block_cols: (n_blocks,) int32 block coordinates, sorted
        row-major by (block_row, block_col)
    """

    blocks: jax.Array
    block_rows: jax.Array
    block_cols: jax.Array
    shape: tuple
    block_shape: tuple

    @property
    def n_blocks(self):
        return self.blocks.shape[0]

    @property
    def nnz(self):
        return int(self.blocks.shape[0] * self.blocks.shape[1] * self.blocks.shape[2])

    def todense(self):
        m, n = self.shape
        bm, bn = self.block_shape
        out = np.zeros((-(-m // bm) * bm, -(-n // bn) * bn), dtype=np.asarray(self.blocks).dtype)
        br = np.asarray(self.block_rows)
        bc = np.asarray(self.block_cols)
        blocks = np.asarray(self.blocks)
        for i in range(blocks.shape[0]):
            out[br[i] * bm : (br[i] + 1) * bm, bc[i] * bn : (bc[i] + 1) * bn] += blocks[i]
        return out[:m, :n]


def build_bsr(rows, cols, data, shape, block_shape=(128, 128), pad_run_multiple=1):
    """Build a BSR layout from COO triplets (host-side, one-time).

    Every empty block-row receives one zero block so the Pallas kernel's
    output tiles are always initialized. ``pad_run_multiple > 1`` pads each
    block-row's run of stored blocks to a multiple of that count (with zero
    blocks) so the unrolled kernel can consume fixed-size groups."""
    bm, bn = block_shape
    m, k = shape
    n_block_rows = -(-m // bm)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)

    brow = rows // bm
    bcol = cols // bn
    key = brow.astype(np.int64) * (-(-k // bn)) + bcol
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.flatnonzero(np.concatenate([[True], np.diff(key_s) != 0])) if key_s.size else np.empty(0, np.int64)
    uniq = key_s[starts] if key_s.size else np.empty(0, np.int64)
    block_of_entry = np.searchsorted(uniq, key_s)

    n_stored = uniq.shape[0]
    u_brow = (uniq // (-(-k // bn))).astype(np.int32)
    u_bcol = (uniq % (-(-k // bn))).astype(np.int32)

    # pad empty block-rows with one zero block at column 0
    present = np.zeros(n_block_rows, dtype=bool)
    present[u_brow] = True
    missing = np.flatnonzero(~present).astype(np.int32)

    total = n_stored + missing.shape[0]
    blocks = np.zeros((max(total, 1), bm, bn), dtype=data.dtype)
    if key_s.size:
        r_local = (rows[order] % bm).astype(np.int64)
        c_local = (cols[order] % bn).astype(np.int64)
        np.add.at(blocks, (block_of_entry, r_local, c_local), data[order])
    all_brow = np.concatenate([u_brow, missing]).astype(np.int32)
    all_bcol = np.concatenate([u_bcol, np.zeros(missing.shape[0], dtype=np.int32)]).astype(np.int32)
    if total == 0:
        all_brow = np.zeros(1, dtype=np.int32)
        all_bcol = np.zeros(1, dtype=np.int32)
        total = 1
    # final row-major order over (brow, bcol)
    forder = np.argsort(all_brow.astype(np.int64) * (-(-k // bn)) + all_bcol, kind="stable")
    blocks = blocks[:total][forder]
    all_brow = all_brow[forder]
    all_bcol = all_bcol[forder]

    if pad_run_multiple > 1:
        counts = np.bincount(all_brow, minlength=n_block_rows)
        padded = -(-counts // pad_run_multiple) * pad_run_multiple
        extra = padded - counts
        if extra.sum():
            pad_rows = np.repeat(np.arange(n_block_rows, dtype=np.int32), extra)
            blocks = np.concatenate([blocks, np.zeros((pad_rows.size, bm, bn), dtype=blocks.dtype)])
            all_brow = np.concatenate([all_brow, pad_rows])
            all_bcol = np.concatenate([all_bcol, np.zeros(pad_rows.size, dtype=np.int32)])
            forder = np.argsort(all_brow.astype(np.int64) * (-(-k // bn) + 1), kind="stable")
            blocks = blocks[forder]
            all_brow = all_brow[forder]
            all_bcol = all_bcol[forder]

    return BSR(
        jnp.asarray(blocks),
        jnp.asarray(all_brow),
        jnp.asarray(all_bcol),
        (m, k),
        (bm, bn),
    )


def _spmm_kernel(block_rows_ref, block_cols_ref, blocks_ref, b_ref, out_ref, acc_ref, *, precision):
    j = pl.program_id(1)
    row = block_rows_ref[j]
    prev_row = block_rows_ref[jnp.maximum(j, 1) - 1]
    is_first = jnp.logical_or(j == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # accumulate in a 32-bit VMEM scratch (required for bf16 outputs; for
    # f32 inputs `precision` is HIGHEST since the default truncates to bf16)
    acc_ref[...] += jnp.dot(
        blocks_ref[...],
        b_ref[...],
        preferred_element_type=acc_ref.dtype,
        precision=precision,
    )
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_shape", "n_tile", "interpret"))
def bsr_spmm_pallas(
    block_rows, block_cols, blocks, dense, *, n_rows, block_shape=(128, 128), n_tile=512, interpret=False
):
    """``A @ B`` for BSR ``A`` via the scalar-prefetch Pallas kernel.

    f32 and bf16 inputs are supported; accumulation is always f32 (VMEM
    scratch). Measured ~10 TFLOP/s f32-HIGHEST on TPU v5e at 25% block
    density (2x the XLA gather+segment path)."""
    bm, bn = block_shape
    n_blocks = blocks.shape[0]
    k, n = dense.shape
    n_tile = min(n_tile, max(-(-n // 128) * 128, 128))
    n_block_rows = -(-n_rows // bm)
    n_tiles = -(-n // n_tile)
    kb = -(-k // bn)
    if dense.shape != (kb * bn, n_tiles * n_tile):
        dense = jnp.pad(dense, ((0, kb * bn - k), (0, n_tiles * n_tile - n)))

    precision = jax.lax.Precision.DEFAULT if blocks.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    acc_dtype = jnp.float64 if blocks.dtype == jnp.float64 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda t, j, rows, cols: (j, 0)),
            pl.BlockSpec((bn, n_tile), lambda t, j, rows, cols: (cols[j], t)),
        ],
        out_specs=pl.BlockSpec((bm, n_tile), lambda t, j, rows, cols: (rows[j], t)),
        scratch_shapes=[pltpu.VMEM((bm, n_tile), acc_dtype)],
    )
    # x64 mode (enabled package-wide for numpy parity) produces int64 index
    # arithmetic that Mosaic cannot legalize — trace the kernel in x32.
    # Interpret mode (CPU testing) handles any dtype; keep x64 there so f64
    # inputs work.
    import contextlib

    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        out = pl.pallas_call(
            functools.partial(_spmm_kernel, precision=precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_block_rows * bm, n_tiles * n_tile), dense.dtype),
            interpret=interpret,
        )(block_rows, block_cols, blocks.reshape(n_blocks * bm, bn), dense)
    return out[:n_rows, :n]


def _spmm_kernel2(block_rows_ref, block_cols_ref, blocks_ref, b0_ref, b1_ref, out_ref, acc_ref, *, precision):
    j = pl.program_id(1)
    row = block_rows_ref[2 * j]
    prev_row = block_rows_ref[jnp.maximum(2 * j, 1) - 1]
    is_first = jnp.logical_or(j == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bm = acc_ref.shape[0]
    acc_ref[...] += jnp.dot(
        blocks_ref[:bm], b0_ref[...], preferred_element_type=acc_ref.dtype, precision=precision
    ) + jnp.dot(
        blocks_ref[bm:], b1_ref[...], preferred_element_type=acc_ref.dtype, precision=precision
    )
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_shape", "n_tile", "interpret"))
def bsr_spmm_pallas2(
    block_rows, block_cols, blocks, dense, *, n_rows, block_shape=(128, 128), n_tile=512, interpret=False
):
    """Unrolled variant of :func:`bsr_spmm_pallas` consuming TWO stored
    blocks per grid step (halves per-step overhead). Requires the layout
    built with ``build_bsr(..., pad_run_multiple=2)`` so each block-row's
    run has even length."""
    bm, bn = block_shape
    n_blocks = blocks.shape[0]
    assert n_blocks % 2 == 0, "pad_run_multiple=2 layout required"
    k, n = dense.shape
    n_tile = min(n_tile, max(-(-n // 128) * 128, 128))
    n_block_rows = -(-n_rows // bm)
    n_tiles = -(-n // n_tile)
    kb = -(-k // bn)
    if dense.shape != (kb * bn, n_tiles * n_tile):
        dense = jnp.pad(dense, ((0, kb * bn - k), (0, n_tiles * n_tile - n)))

    precision = jax.lax.Precision.DEFAULT if blocks.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    acc_dtype = jnp.float64 if blocks.dtype == jnp.float64 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_blocks // 2),
        in_specs=[
            pl.BlockSpec((2 * bm, bn), lambda t, j, rows, cols: (j, 0)),
            pl.BlockSpec((bn, n_tile), lambda t, j, rows, cols: (cols[2 * j], t)),
            pl.BlockSpec((bn, n_tile), lambda t, j, rows, cols: (cols[2 * j + 1], t)),
        ],
        out_specs=pl.BlockSpec((bm, n_tile), lambda t, j, rows, cols: (rows[2 * j], t)),
        scratch_shapes=[pltpu.VMEM((bm, n_tile), acc_dtype)],
    )
    import contextlib

    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        out = pl.pallas_call(
            functools.partial(_spmm_kernel2, precision=precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_block_rows * bm, n_tiles * n_tile), dense.dtype),
            interpret=interpret,
        )(block_rows, block_cols, blocks.reshape(n_blocks * bm, bn), dense, dense)
    return out[:n_rows, :n]


@functools.partial(jax.jit, static_argnames=("n_rows", "block_shape"))
def bsr_spmm_xla(block_rows, block_cols, blocks, dense, *, n_rows, block_shape=(128, 128)):
    """XLA fallback (works on CPU): gather dense blocks, batched matmul,
    segment-sum by block row."""
    bm, bn = block_shape
    k, n = dense.shape
    kb = -(-k // bn)
    n_block_rows = -(-n_rows // bm)
    d = jnp.pad(dense, ((0, kb * bn - k), (0, 0))).reshape(kb, bn, n)
    gathered = jnp.take(d, block_cols, axis=0)  # (n_blocks, bn, n)
    prods = jnp.einsum(
        "kij,kjn->kin", blocks, gathered, preferred_element_type=blocks.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.ops.segment_sum(prods, block_rows, num_segments=n_block_rows, indices_are_sorted=True)
    return out.reshape(n_block_rows * bm, n)[:n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bsr_spmm(block_rows, block_cols, blocks, dense, n_rows, use_pallas=True):
    """Differentiable BSR SpMM: Pallas forward (MXU), XLA-derived backward.

    ``pl.pallas_call`` has no autodiff rule, so the VJP is taken through the
    mathematically identical :func:`bsr_spmm_xla` formulation."""
    impl = bsr_spmm_pallas if use_pallas else bsr_spmm_xla
    return impl(block_rows, block_cols, blocks, dense, n_rows=n_rows)


def _bsr_spmm_fwd(block_rows, block_cols, blocks, dense, n_rows, use_pallas):
    out = bsr_spmm(block_rows, block_cols, blocks, dense, n_rows, use_pallas)
    return out, (block_rows, block_cols, blocks, dense)


def _bsr_spmm_bwd(n_rows, use_pallas, res, g):
    block_rows, block_cols, blocks, dense = res
    _, vjp = jax.vjp(
        lambda bl, d: bsr_spmm_xla(block_rows, block_cols, bl, d, n_rows=n_rows), blocks, dense
    )
    d_blocks, d_dense = vjp(g)
    return None, None, d_blocks, d_dense


bsr_spmm.defvjp(_bsr_spmm_fwd, _bsr_spmm_bwd)


def _sddmm_kernel(block_rows_ref, block_cols_ref, lhs_ref, rhs_ref, out_ref, acc_ref, *, precision):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        lhs_ref[...], rhs_ref[...], preferred_element_type=acc_ref.dtype, precision=precision
    )

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_shape", "b_tile", "interpret"))
def bsr_sddmm_pallas(block_rows, block_cols, lhs, rhs, *, block_shape=(128, 128), b_tile=512, interpret=False):
    """Block-sampled dense-dense matmul: for each stored block (r, c) return
    ``lhs[r·bm:(r+1)·bm, :] @ rhs[:, c·bn:(c+1)·bn]`` — the weight-gradient
    of :func:`bsr_spmm` (and a BigBird-style block-scores kernel).

    lhs (M, B), rhs (B, K) → (n_blocks, bm, bn); contraction tiled by
    ``b_tile`` with f32 VMEM accumulation."""
    bm, bn = block_shape
    n_blocks = block_rows.shape[0]
    m, b = lhs.shape
    b2, k = rhs.shape
    assert b == b2
    b_tile = min(b_tile, max(-(-b // 128) * 128, 128))
    n_t = -(-b // b_tile)
    mb = -(-m // bm)
    kb = -(-k // bn)
    if lhs.shape != (mb * bm, n_t * b_tile):
        lhs = jnp.pad(lhs, ((0, mb * bm - m), (0, n_t * b_tile - b)))
    if rhs.shape != (n_t * b_tile, kb * bn):
        rhs = jnp.pad(rhs, ((0, n_t * b_tile - b), (0, kb * bn - k)))

    precision = jax.lax.Precision.DEFAULT if lhs.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    acc_dtype = jnp.float64 if lhs.dtype == jnp.float64 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks, n_t),
        in_specs=[
            pl.BlockSpec((bm, b_tile), lambda j, t, rows, cols: (rows[j], t)),
            pl.BlockSpec((b_tile, bn), lambda j, t, rows, cols: (t, cols[j])),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda j, t, rows, cols: (j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
    )
    import contextlib

    ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
    with ctx:
        out = pl.pallas_call(
            functools.partial(_sddmm_kernel, precision=precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, bm, bn), lhs.dtype),
            interpret=interpret,
        )(block_rows, block_cols, lhs, rhs)
    return out


def transpose_bsr_layout(block_rows, block_cols, n_block_rows_t):
    """Host-side one-time transpose layout for a BSR pattern: returns
    ``(t_rows, t_cols, t_perm)`` sorted row-major in the transposed space,
    with every empty transposed block-row padded by one zero block
    (``t_perm == -1``), ready for :func:`bsr_spmm_pallas` on Aᵀ."""
    br = np.asarray(block_rows)
    bc = np.asarray(block_cols)
    order = np.argsort(bc.astype(np.int64) * (br.max(initial=0) + 1) + br, kind="stable")
    t_rows = bc[order].astype(np.int32)
    t_cols = br[order].astype(np.int32)
    t_perm = order.astype(np.int64)
    present = np.zeros(n_block_rows_t, dtype=bool)
    present[t_rows] = True
    missing = np.flatnonzero(~present).astype(np.int32)
    if missing.size:
        t_rows = np.concatenate([t_rows, missing])
        t_cols = np.concatenate([t_cols, np.zeros(missing.size, np.int32)])
        t_perm = np.concatenate([t_perm, np.full(missing.size, -1, np.int64)])
        order2 = np.argsort(t_rows.astype(np.int64) * (int(t_cols.max(initial=0)) + 2) + t_cols, kind="stable")
        t_rows, t_cols, t_perm = t_rows[order2], t_cols[order2], t_perm[order2]
    return t_rows, t_cols, t_perm


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def bsr_spmm_trainable(block_rows, block_cols, t_rows, t_cols, t_perm, blocks, dense, n_rows, n_cols, use_pallas):
    """Fully kernelized differentiable BSR SpMM: Pallas forward, Pallas
    backward — dgrad through the precomputed transposed layout
    (:func:`transpose_bsr_layout`), wgrad through :func:`bsr_sddmm_pallas`."""
    impl = bsr_spmm_pallas if use_pallas else bsr_spmm_xla
    return impl(block_rows, block_cols, blocks, dense, n_rows=n_rows)


def _bsr_spmm_trainable_fwd(block_rows, block_cols, t_rows, t_cols, t_perm, blocks, dense, n_rows, n_cols, use_pallas):
    out = bsr_spmm_trainable(block_rows, block_cols, t_rows, t_cols, t_perm, blocks, dense, n_rows, n_cols, use_pallas)
    return out, (block_rows, block_cols, t_rows, t_cols, t_perm, blocks, dense)


def _bsr_spmm_trainable_bwd(n_rows, n_cols, use_pallas, res, g):
    block_rows, block_cols, t_rows, t_cols, t_perm, blocks, dense = res
    blocks_t = jnp.where(
        (t_perm < 0)[:, None, None], 0, blocks[jnp.clip(t_perm, 0, None)]
    ).transpose(0, 2, 1)
    if use_pallas:
        d_dense = bsr_spmm_pallas(t_rows, t_cols, blocks_t, g, n_rows=n_cols)
        d_blocks = bsr_sddmm_pallas(block_rows, block_cols, g, dense.T)
    else:
        d_dense = bsr_spmm_xla(t_rows, t_cols, blocks_t, g, n_rows=n_cols)
        _, vjp = jax.vjp(lambda bl: bsr_spmm_xla(block_rows, block_cols, bl, dense, n_rows=n_rows), blocks)
        (d_blocks,) = vjp(g)
    return None, None, None, None, None, d_blocks, d_dense


bsr_spmm_trainable.defvjp(_bsr_spmm_trainable_fwd, _bsr_spmm_trainable_bwd)
