"""Block-ELL SpMM — the TPU fast path.

The matrix's stored entries are grouped by 128-row output block and padded
to a common per-block capacity (host-side, one-time, cached on the array).
The SpMM then becomes, per block:

    out_block = onehot(local_rows)ᵀ @ (data ⊙ dense[cols])

i.e. the irregular segment-sum is reformulated as a batched one-hot
matmul that runs on the MXU — measured ~3× faster than XLA's scatter-based
``segment_sum`` on TPU v5e, with the dense-row gather as the remaining
bandwidth bound.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_ROWS = 128


class BlockEll(NamedTuple):
    """Padded block-ELL layout of a 2-D sparse matrix (zero fill).

    e_rows/e_cols/e_data: (n_blocks, cap); padding entries have data == 0.
    """

    e_rows: jax.Array  # local row ids within the block, int32
    e_cols: jax.Array  # global column ids, int32
    e_data: jax.Array
    n_rows: int
    n_cols: int
    block_rows: int


def build_block_ell(rows, cols, data, n_rows, n_cols, block_rows=DEFAULT_BLOCK_ROWS, pad_to=8):
    """Host-side preprocessing: group entries by row block, pad to the max
    block population (rounded up to ``pad_to``)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)
    nnz = rows.shape[0]
    n_blocks = -(-n_rows // block_rows)
    blk = rows // block_rows
    counts = np.bincount(blk, minlength=n_blocks)
    cap = max(-(-int(counts.max()) // pad_to) * pad_to, pad_to) if nnz else pad_to

    e_rows = np.zeros((n_blocks, cap), dtype=np.int32)
    e_cols = np.zeros((n_blocks, cap), dtype=np.int32)
    e_data = np.zeros((n_blocks, cap), dtype=data.dtype)
    if nnz:
        order = np.argsort(blk, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        within = np.arange(nnz) - starts[blk[order]]
        e_rows[blk[order], within] = (rows[order] - blk[order] * block_rows).astype(np.int32)
        e_cols[blk[order], within] = cols[order].astype(np.int32)
        e_data[blk[order], within] = data[order]
    return BlockEll(
        jnp.asarray(e_rows), jnp.asarray(e_cols), jnp.asarray(e_data), int(n_rows), int(n_cols), int(block_rows)
    )


@functools.partial(jax.jit, static_argnames=("n_rows", "block_rows"))
def ell_spmm(e_rows, e_cols, e_data, dense, *, n_rows, block_rows=DEFAULT_BLOCK_ROWS):
    """Block-ELL ``A @ B`` → dense (n_rows, N)."""
    n_blocks, cap = e_cols.shape
    n = dense.shape[1]
    g = jnp.take(dense, e_cols.reshape(-1), axis=0).reshape(n_blocks, cap, n)
    prod = e_data[:, :, None] * g
    onehot = (e_rows[:, :, None] == jnp.arange(block_rows, dtype=e_rows.dtype)[None, None, :]).astype(e_data.dtype)
    # HIGHEST keeps f32 accumulation exact-ish: the default TPU matmul
    # precision truncates operands to bf16, which loses ~1e-3 relative.
    # bf16 inputs accumulate in f32 via preferred_element_type at DEFAULT.
    acc_dtype = jnp.float32 if prod.dtype == jnp.bfloat16 else prod.dtype
    precision = jax.lax.Precision.DEFAULT if prod.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    out = jnp.einsum(
        "ber,ben->brn", onehot, prod, preferred_element_type=acc_dtype, precision=precision
    ).astype(prod.dtype)
    return out.reshape(n_blocks * block_rows, n)[:n_rows]


def build_block_ell_3d(ci, cj, ck, data, n_rows, block_rows=DEFAULT_BLOCK_ROWS, pad_to=8):
    """Block-ELL layout of a 3-D COO tensor grouped by i-blocks (for
    :func:`ell_mttkrp`): returns ``(e_rows, e_j, e_k, e_data)`` each
    ``(n_blocks, cap)``; padding entries have data == 0."""
    ci = np.asarray(ci)
    cj = np.asarray(cj)
    ck = np.asarray(ck)
    data = np.asarray(data)
    nnz = ci.shape[0]
    n_blocks = -(-n_rows // block_rows)
    blk = ci // block_rows
    counts = np.bincount(blk, minlength=n_blocks)
    cap = max(-(-int(counts.max()) // pad_to) * pad_to, pad_to) if nnz else pad_to
    e_rows = np.zeros((n_blocks, cap), dtype=np.int32)
    e_j = np.zeros((n_blocks, cap), dtype=np.int32)
    e_k = np.zeros((n_blocks, cap), dtype=np.int32)
    e_data = np.zeros((n_blocks, cap), dtype=data.dtype)
    if nnz:
        order = np.argsort(blk, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        within = np.arange(nnz) - starts[blk[order]]
        bo = blk[order]
        e_rows[bo, within] = (ci[order] - bo * block_rows).astype(np.int32)
        e_j[bo, within] = cj[order].astype(np.int32)
        e_k[bo, within] = ck[order].astype(np.int32)
        e_data[bo, within] = data[order]
    return jnp.asarray(e_rows), jnp.asarray(e_j), jnp.asarray(e_k), jnp.asarray(e_data)


# exact-path scan-over-blocks (see ell_mttkrp): group size and the
# minimum block count below which the monolithic form stays
MTTKRP_SCAN_GROUP = 4
MTTKRP_SCAN_MIN_BLOCKS = 32


def _split16_cols(x):
    """EXACT 16-bit split along columns: (n, r) f32 -> (n, 2r) int16
    holding each value's high and low 16 bits.  Halves the lane-padded
    gather streams like the bf16 hilo split, but ``_recon16_cols``
    rebuilds the ORIGINAL f32 bitwise (r5)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    hi = (bits >> 16).astype(jnp.int16)
    lo = bits.astype(jnp.int16)  # wraps: low 16 bits
    return jnp.concatenate([hi, lo], axis=1)


def _recon16_cols(g, r):
    """Inverse of :func:`_split16_cols` on gathered (..., 2r) int16."""
    hi = g[..., :r].astype(jnp.int32) << 16
    lo = g[..., r:].astype(jnp.int32) & jnp.int32(0xFFFF)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def _hilo_split_cols(x):
    """bf16 hi|lo split along columns: (n, r) f32 -> (n, 2r) bf16 with
    hi = round-to-nearest-bf16(x), lo = bf16(x - hi).  Computed with
    integer bit arithmetic — XLA rewrites the naive ``x - bf16(x)``
    subtraction to bf16 on TPU and folds lo to exactly 0 (CLAUDE.md)."""
    xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    hi_bits = (xi + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)
    hi = jax.lax.bitcast_convert_type(hi_bits, jnp.float32)
    lo = x.astype(jnp.float32) - hi
    return jnp.concatenate([hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)], axis=1)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_rows", "strategy"))
def ell_mttkrp(e_rows, e_j, e_k, e_data, c, d, *, n_rows, block_rows=DEFAULT_BLOCK_ROWS, strategy="exact"):
    """MTTKRP with the one-hot MXU scatter: per 128-row block,
    ``out_block = onehot(local_i)ᵀ @ (data ⊙ C[j] ⊙ D[k])`` — 17× over the
    segment-sum form at 10M nnz (7.9 ms vs 136 ms, J=32, v5e).

    ``strategy`` (r4 measurement campaign, docs/spmm_roofline.md "MTTKRP"):

    - ``"exact"`` (default): exact-grade f32.  Large f32 problems with
      ``2r <= 128`` gather INT16-SPLIT tables (r5,
      experiments/mttkrp_exact16_r5.py): each factor f32 is stored as
      its two 16-bit halves in a (J, 2r) int16 table — the gathered
      rows' tile padding halves (the f32 (E, r=32) stream pads 4× to
      128 lanes) and ``(hi << 16) | lo`` reconstructs the ORIGINAL f32
      BITWISE, so only the contraction's FP association differs (55.4 →
      45.0 ms at the 10M-nnz bench shape, same-session; the r4
      scan-over-blocks form measured 62.2 with split tables — the scan
      only paid off when the streams were full-width — and stays for
      the f64/x64 path).  The r4 negatives still stand: data-folded
      operand, pair-product table, 4-per-row lane packing, j-sort,
      one-hot pick, packed+bf16 all slower; gathers are issue-bound on
      cache-resident tables.
    - ``"bf16"``: C/D gathered as bf16, f32 accumulation — halves the
      padded gather-output streams: 58.0 ms (1.17x), relerr ~1e-3.
    - ``"hilo"``: (J, 2r) hi|lo bf16 split tables — same gathered bytes
      as ``"bf16"``, f32-reconstructed factors: relerr ~1e-7.  Mostly
      superseded by the exact int16 split (same bytes, bit-true
      values); kept for compatibility.
    """
    n_blocks, cap = e_j.shape
    r = c.shape[1]
    dt_in = jnp.promote_types(c.dtype, d.dtype)
    if strategy == "exact" and dt_in == jnp.float32 and 2 * r <= 128 and n_blocks >= MTTKRP_SCAN_MIN_BLOCKS:
        c2 = _split16_cols(c.astype(jnp.float32))
        d2 = _split16_cols(d.astype(jnp.float32))
        gc = jnp.take(c2, e_j.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * r)
        gd = jnp.take(d2, e_k.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * r)
        g = _recon16_cols(gc, r) * _recon16_cols(gd, r)
        prod = e_data[:, :, None] * g
        onehot = (e_rows[:, :, None] == jnp.arange(block_rows, dtype=e_rows.dtype)[None, None, :]).astype(prod.dtype)
        out = jnp.einsum(
            "ber,ben->brn", onehot, prod, preferred_element_type=prod.dtype, precision=jax.lax.Precision.HIGHEST
        )
        return out.reshape(n_blocks * block_rows, r)[:n_rows]
    if strategy == "exact" and n_blocks >= MTTKRP_SCAN_MIN_BLOCKS:
        # scan over groups of blocks: per-iteration gathered/product slices
        # stay VMEM-resident instead of materializing 4x-lane-padded
        # (E, r) streams in HBM — 67.6 -> 51.8 ms exact at the 10M-nnz
        # bench shape (group sweep {1,2,4,8} -> 59.6/52.2/51.8/65.5;
        # hilo+scan measured WORSE than plain hilo, so only exact scans).
        group = MTTKRP_SCAN_GROUP
        nb = -(-n_blocks // group) * group
        pb = nb - n_blocks

        def padb(x):
            if pb == 0:
                return x
            return jnp.concatenate([x, jnp.zeros((pb,) + x.shape[1:], x.dtype)], axis=0)

        erp = padb(e_rows).reshape(nb // group, group, cap)
        ejp = padb(e_j).reshape(nb // group, group, cap)
        ekp = padb(e_k).reshape(nb // group, group, cap)
        edp = padb(e_data).reshape(nb // group, group, cap)
        dt_ = jnp.promote_types(e_data.dtype, jnp.promote_types(c.dtype, d.dtype))
        acc = jnp.float32 if dt_ == jnp.bfloat16 else dt_
        prec = jax.lax.Precision.DEFAULT if dt_ == jnp.bfloat16 else jax.lax.Precision.HIGHEST

        def body(_, x):
            erx, ejx, ekx, edx = x
            g_ = (
                jnp.take(c, ejx.reshape(-1), axis=0) * jnp.take(d, ekx.reshape(-1), axis=0)
            ).reshape(group, cap, r)
            prod_ = edx[:, :, None] * g_
            oh = (
                erx[:, :, None] == jnp.arange(block_rows, dtype=erx.dtype)[None, None, :]
            ).astype(prod_.dtype)
            out_ = jnp.einsum(
                "ben,ber->bnr", oh, prod_, preferred_element_type=acc, precision=prec
            )
            return None, out_

        _, outs = jax.lax.scan(body, None, (erp, ejp, ekp, edp))
        return outs.reshape(nb * block_rows, r).astype(dt_)[:n_rows]
    if strategy == "bf16":
        g = (
            jnp.take(c.astype(jnp.bfloat16), e_j.reshape(-1), axis=0).astype(jnp.float32)
            * jnp.take(d.astype(jnp.bfloat16), e_k.reshape(-1), axis=0).astype(jnp.float32)
        ).reshape(n_blocks, cap, r)
    elif strategy == "hilo":
        c2 = _hilo_split_cols(c)
        d2 = _hilo_split_cols(d)
        gc = jnp.take(c2, e_j.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * r)
        gd = jnp.take(d2, e_k.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * r)
        g = (gc[:, :, :r].astype(jnp.float32) + gc[:, :, r:].astype(jnp.float32)) * (
            gd[:, :, :r].astype(jnp.float32) + gd[:, :, r:].astype(jnp.float32)
        )
    else:
        g = (jnp.take(c, e_j.reshape(-1), axis=0) * jnp.take(d, e_k.reshape(-1), axis=0)).reshape(
            n_blocks, cap, r
        )
    prod = e_data[:, :, None] * g.astype(e_data.dtype) if strategy in ("bf16", "hilo") else e_data[:, :, None] * g
    onehot = (e_rows[:, :, None] == jnp.arange(block_rows, dtype=e_rows.dtype)[None, None, :]).astype(prod.dtype)
    acc_dtype = jnp.float32 if prod.dtype == jnp.bfloat16 else prod.dtype
    precision = jax.lax.Precision.DEFAULT if prod.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    out = jnp.einsum(
        "ber,ben->brn", onehot, prod, preferred_element_type=acc_dtype, precision=precision
    ).astype(prod.dtype)
    return out.reshape(n_blocks * block_rows, r)[:n_rows]


@functools.partial(jax.jit, static_argnames=("n_rows", "block_rows", "lane_gather"))
def ell_spmv(e_rows, e_cols, e_data, x, *, n_rows, block_rows=DEFAULT_BLOCK_ROWS, lane_gather=None):
    """Block-ELL ``A @ x`` → dense (n_rows,).

    ``lane_gather`` reads x through a ``(K/128, 128)`` view: one 512-byte
    row gather per entry plus a one-hot lane selection on the MXU — measured
    1.5× over the scalar gather on TPU v5e (the gather unit is row-rate
    limited, so wider rows are free). Defaults to on for TPU backends; the
    intermediate is (n_blocks, cap, 128), so it trades memory for rate."""
    if lane_gather is None:
        lane_gather = jax.default_backend() not in ("cpu",)
    n_blocks, cap = e_cols.shape
    acc_dtype = jnp.float32 if e_data.dtype == jnp.bfloat16 else e_data.dtype
    precision = jax.lax.Precision.DEFAULT if e_data.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    if lane_gather and x.shape[0] % 128 == 0:
        xt = x.reshape(-1, 128)
        g_rows = jnp.take(xt, (e_cols // 128).reshape(-1), axis=0).reshape(n_blocks, cap, 128)
        onehot_lane = (
            (e_cols % 128)[:, :, None] == jnp.arange(128, dtype=e_cols.dtype)[None, None, :]
        ).astype(e_data.dtype)
        g = jnp.einsum("bel,bel->be", g_rows, onehot_lane)
    else:
        g = jnp.take(x, e_cols.reshape(-1)).reshape(n_blocks, cap)
    prod = e_data * g
    onehot = (e_rows[:, :, None] == jnp.arange(block_rows, dtype=e_rows.dtype)[None, None, :]).astype(e_data.dtype)
    out = jnp.einsum(
        "ber,be->br", onehot, prod, preferred_element_type=acc_dtype, precision=precision
    ).astype(prod.dtype)
    return out.reshape(n_blocks * block_rows)[:n_rows]
