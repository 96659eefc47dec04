"""Degree-sorted per-row ELL — the unstructured SpMM/SpMV fast path.

Rows are relabeled by descending nnz count so consecutive rows have
near-uniform width; rows of the same quantized width class share a tier
padded to the class width (multiples of 8 — the f32 sublane tile — so the
gather's (r, w, N) output layout is physically exact).  The SpMM is then,
per tier::

    out_tier = (data[:, :, None] * dense[cols]).sum(axis=1)

a uniform segmented reduction with **no one-hot and no MXU**: exact f32
accumulation, measured 794 GB/s on the reduce phase (v5e) vs ~400 GB/s for
the one-hot einsum scatter of the block-ELL form (`kernels/ell.py`), and
~4.7-11% padding at the bench density.  Full study: docs/spmm_roofline.md
(the gather's HBM round-trip is unavoidable: XLA never fuses gathers into
reduce or elementwise fusion roots — measured, probes P1-P3).

Replaces the reference's 1-D Numba CSR dot kernels
(/root/reference/sparse/numba_backend/_common.py:672-744) as the
unstructured matmul engine; semantics (zero fill, dtype promotion) match.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class RowEll(NamedTuple):
    """Tiered, degree-sorted per-row ELL layout of a 2-D sparse matrix.

    ``tiers``: tuple of ``(cols, data)`` pairs, each ``(r_t, w_t)`` —
    relabeled rows ``sum(r_1..r_{t-1}) .. +r_t`` with their column ids and
    values, zero-padded to the tier width.  ``perm_inv`` maps original row
    ids to relabeled positions (``out_original = out_relabeled[perm_inv]``).
    """

    tiers: tuple
    perm_inv: jax.Array  # (n_rows,) int32
    n_rows: int
    n_cols: int
    nz_rows: int


def build_row_ell(rows, cols, data, n_rows, n_cols, min_pad=8, max_tiers=16):
    """Host-side preprocessing: degree-sort rows, quantize widths to
    multiples of ``min_pad`` (keep it a multiple of 8: narrower tiers are
    physically padded to the sublane tile anyway and measure ~1.5x slower
    gathers), merge adjacent width classes until at most ``max_tiers``.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)
    nnz = rows.shape[0]

    counts = np.bincount(rows, minlength=n_rows) if nnz else np.zeros(n_rows, dtype=np.int64)
    perm = np.argsort(-counts, kind="stable")  # relabeled -> original
    perm_inv = np.empty(n_rows, dtype=np.int64)
    perm_inv[perm] = np.arange(n_rows)
    sorted_counts = counts[perm]
    nz_rows = int((sorted_counts > 0).sum())

    tiers = []
    if nz_rows:
        order = np.argsort(rows, kind="stable")
        cols_s = cols[order]
        data_s = data[order]
        indptr = np.concatenate([[0], np.cumsum(counts)])

        cls = -(-sorted_counts[:nz_rows] // min_pad)  # ceil width class
        b = np.flatnonzero(np.diff(cls)) + 1
        bounds = [
            (int(s), int(e), int(cls[s]) * min_pad)
            for s, e in zip(np.concatenate([[0], b]), np.concatenate([b, [nz_rows]]))
        ]
        # merge adjacent classes (narrower pads up to the wider width),
        # always taking the cheapest merge, until the tier count is bounded
        while len(bounds) > max_tiers:
            costs = [
                (bounds[i + 1][1] - bounds[i + 1][0]) * (bounds[i][2] - bounds[i + 1][2])
                for i in range(len(bounds) - 1)
            ]
            i = int(np.argmin(costs))
            bounds[i] = (bounds[i][0], bounds[i + 1][1], bounds[i][2])
            del bounds[i + 1]

        for start, end, w in bounds:
            r = end - start
            c2 = np.zeros((r, w), dtype=np.int32)
            d2 = np.zeros((r, w), dtype=data.dtype)
            orig = perm[start:end]
            s = indptr[orig]
            cnt = indptr[orig + 1] - s
            rr = np.repeat(np.arange(r), cnt)
            pos = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            src = np.repeat(s, cnt) + pos
            c2[rr, pos] = cols_s[src].astype(np.int32)
            d2[rr, pos] = data_s[src]
            tiers.append((jnp.asarray(c2), jnp.asarray(d2)))

    return RowEll(
        tuple(tiers),
        jnp.asarray(perm_inv, dtype=jnp.int32),
        int(n_rows),
        int(n_cols),
        nz_rows,
    )


@functools.partial(jax.jit, static_argnames=("n_rows", "nz_rows"))
def _spmm(tiers, perm_inv, dense, *, n_rows, nz_rows):
    n = dense.shape[1]
    dt = jnp.result_type(dense.dtype, tiers[0][1].dtype if tiers else dense.dtype)
    outs = []
    for c2, d2 in tiers:
        g = jnp.take(dense, c2, axis=0)  # (r, w, n) straight from the gather
        outs.append((d2.astype(dt)[:, :, None] * g.astype(dt)).sum(axis=1))
    pad = jnp.zeros((n_rows - nz_rows, n), dtype=dt)
    out_sorted = jnp.concatenate(outs + [pad], axis=0) if outs else pad
    return jnp.take(out_sorted, perm_inv, axis=0)


def row_ell_spmm(re: RowEll, dense):
    """``A @ B`` → dense ``(n_rows, N)`` with exact f32 accumulation."""
    return _spmm(re.tiers, re.perm_inv, dense, n_rows=re.n_rows, nz_rows=re.nz_rows)


@functools.partial(jax.jit, static_argnames=("n_rows", "nz_rows", "lane_gather"))
def _spmv(tiers, perm_inv, x, *, n_rows, nz_rows, lane_gather):
    dt = jnp.result_type(x.dtype, tiers[0][1].dtype if tiers else x.dtype)
    k = x.shape[0]
    outs = []
    if lane_gather:
        kp = -(-k // 128) * 128
        xp = jnp.pad(x, (0, kp - k)).reshape(-1, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
    for c2, d2 in tiers:
        if lane_gather:
            g = jnp.take(xp, c2 // 128, axis=0)  # (r, w, 128)
            sel = jnp.where((c2 % 128)[:, :, None] == lanes[None, None, :], g, 0).sum(axis=2)
        else:
            sel = jnp.take(x, c2)
        outs.append((d2.astype(dt) * sel.astype(dt)).sum(axis=1))
    pad = jnp.zeros(n_rows - nz_rows, dtype=dt)
    out_sorted = jnp.concatenate(outs + [pad]) if outs else pad
    return jnp.take(out_sorted, perm_inv)


def row_ell_spmv(re: RowEll, x, lane_gather=None):
    """``A @ x`` → dense ``(n_rows,)``.

    ``lane_gather`` reads x through a ``(K/128, 128)`` view — one 512-byte
    row gather per entry plus a fused one-hot lane select (the gather unit
    is issue-rate-bound at ~140M scalar gathers/s but streams 512 B rows at
    bandwidth; see docs/spmm_roofline.md).  Defaults to on for TPU."""
    if lane_gather is None:
        lane_gather = jax.default_backend() not in ("cpu",)
    return _spmv(
        re.tiers, re.perm_inv, x, n_rows=re.n_rows, nz_rows=re.nz_rows, lane_gather=bool(lane_gather)
    )
