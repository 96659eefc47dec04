"""Degree-sorted per-row ELL — the unstructured SpMM/SpMV fast path.

Rows are relabeled by descending nnz count so consecutive rows have
near-uniform width; rows of the same width class share a tier.  Two
physical layouts:

**Grouped (default, ``group=16``)**: tiers keep EXACT per-degree widths
(merged down to ``max_tiers`` classes) and store indices/data as
``(r/G, w, G)`` — the physical f32 tile covers the trailing ``(G, 128)``
dims of the gathered ``(r/G, w, G, N)`` block, so the free middle ``w``
pays **zero sublane padding** (the round-1 ``(r, w)`` layout quantized w
to multiples of 8: x1.109 fake entries at the bench density).  The
traversal also interleaves G degree-sorted rows' ascending column runs,
measurably closer to sorted order (700 GB/s vs 640 for a ``(w, r)``
transpose and 605 for G=8).  The SpMM is then, per tier::

    out_tier = (data[:, :, :, None] * dense[cols]).sum(axis=1)

a uniform segmented reduction with **no one-hot and no MXU**: exact f32
accumulation, and the ``(r/G, G, N) -> (r, N)`` reshape is a physical
no-op (same tile bytes).  Measured on v5e at the bench shape (65k^2,
2.1M nnz, N=128): 3.78 ms = 555 M nnz/s with the r4 w-split (4.74 ms
without; see SPMM_WSPLIT below) vs 5.18 ms for the round-1
layout and 5.6 ms for the one-hot block-ELL.  Full study incl. the
rejected (w, r) transpose and G sweep: docs/spmm_roofline.md.

**Legacy (``group=0``)**: ``(r, w)`` tiers with w quantized to multiples
of ``min_pad`` — kept for layout A/B comparison in bench_suite.

SpMV has two strategies: the exact lane-gather form (5.68 ms at the
bench shape) and the Pallas one-hot MXU pick with x VMEM-resident
(``strategy="onehot"``: 3.32 ms = 631 M nnz/s, relerr ~1e-6;
``"onehot3"``: ~1e-8) — see docs/spmm_roofline.md "SpMV (round 3)".

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

    ``tiers``: tuple of ``(cols, data)`` pairs — grouped layout arrays of
    shape ``(r_t/G, w_t, G)`` (or legacy ``(r_t, w_t)``) holding the
    relabeled rows' column ids and values, zero-padded to the tier shape.
    ``perm_inv`` maps original row ids to positions in the concatenated
    per-tier output (``out_original = out_relabeled[perm_inv]``).
    """

    tiers: tuple
    perm_inv: jax.Array  # (n_rows,) int32
    n_rows: int
    n_cols: int
    nz_rows: int


def row_ell_cache_key(min_pad=8, max_tiers=None, group=16):
    """Normalized cache key for a built layout: ``min_pad`` only affects
    the legacy ``group=0`` layout (grouped tiers keep exact widths), so it
    is normalized out of the key when ``group > 0`` — calls differing only
    in ``min_pad`` share one cached layout."""
    return (None if group else min_pad, max_tiers, group)


# the key under which COO.to_row_ell() with all-default arguments caches —
# shared with linalg's trace-path peek so the two can't drift
ROW_ELL_DEFAULT_KEY = row_ell_cache_key()


def _merge_bounds(bounds, max_tiers):
    """Greedily merge adjacent width classes (narrower pads up to the
    wider width), always taking the cheapest merge, until bounded."""
    while len(bounds) > max_tiers:
        costs = [
            (bounds[i + 1][1] - bounds[i + 1][0]) * (bounds[i][2] - bounds[i + 1][2])
            for i in range(len(bounds) - 1)
        ]
        i = int(np.argmin(costs))
        bounds[i] = (bounds[i][0], bounds[i + 1][1], bounds[i][2])
        del bounds[i + 1]
    return bounds


def build_row_ell(rows, cols, data, n_rows, n_cols, min_pad=8, max_tiers=None, group=16):
    """Host-side preprocessing: degree-sort rows, tier them by width
    class, lay each tier out grouped ``(r/G, w, G)`` (``group>0``, exact
    widths, default) or legacy ``(r, w)`` (``group=0``, widths quantized
    to multiples of ``min_pad``)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)
    nnz = rows.shape[0]
    if max_tiers is None:
        max_tiers = 32 if group else 16

    counts = np.bincount(rows, minlength=n_rows) if nnz else np.zeros(n_rows, dtype=np.int64)
    perm = np.argsort(-counts, kind="stable")  # relabeled -> original
    sorted_counts = counts[perm]
    nz_rows = int((sorted_counts > 0).sum())

    tiers = []
    pos_of_sorted = np.empty(n_rows, dtype=np.int64)
    off = 0
    if nz_rows:
        order = np.argsort(rows, kind="stable")
        cols_s = cols[order]
        data_s = data[order]
        indptr = np.concatenate([[0], np.cumsum(counts)])

        w_of = sorted_counts[:nz_rows]
        if group:
            b = np.flatnonzero(np.diff(w_of)) + 1
            bounds = [
                (int(s), int(e), int(w_of[s]))
                for s, e in zip(np.concatenate([[0], b]), np.concatenate([b, [nz_rows]]))
            ]
        else:
            cls = -(-w_of // min_pad)  # ceil width class
            b = np.flatnonzero(np.diff(cls)) + 1
            bounds = [
                (int(s), int(e), int(cls[s]) * min_pad)
                for s, e in zip(np.concatenate([[0], b]), np.concatenate([b, [nz_rows]]))
            ]
        bounds = _merge_bounds(bounds, max_tiers)

        for start, end, w in bounds:
            r = end - start
            rp = -(-r // group) * group if group else r
            c2 = np.zeros((rp, w), dtype=np.int32)
            d2 = np.zeros((rp, w), dtype=data.dtype)
            orig = perm[start:end]
            s = indptr[orig]
            cnt = indptr[orig + 1] - s
            rr = np.repeat(np.arange(r), cnt)
            pos = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            src = np.repeat(s, cnt) + pos
            c2[rr, pos] = cols_s[src].astype(np.int32)
            d2[rr, pos] = data_s[src]
            if group:
                # rows within the tier sorted by first column id: keeps the
                # interleaved gather order marginally closer to ascending
                key = np.full(rp, np.iinfo(np.int64).max)  # dummy pad rows last
                key[:r] = cols_s[s]  # every tier row has >=1 entry
                o = np.argsort(key, kind="stable")
                inv_o = np.empty(rp, dtype=np.int64)
                inv_o[o] = np.arange(rp)
                c2 = c2[o]
                d2 = d2[o]
                c3 = np.ascontiguousarray(c2.reshape(rp // group, group, w).transpose(0, 2, 1))
                d3 = np.ascontiguousarray(d2.reshape(rp // group, group, w).transpose(0, 2, 1))
                tiers.append((jnp.asarray(c3), jnp.asarray(d3)))
                pos_of_sorted[start:end] = off + inv_o[np.arange(r)]
            else:
                tiers.append((jnp.asarray(c2), jnp.asarray(d2)))
                pos_of_sorted[start:end] = off + np.arange(r)
            off += rp

    # zero-nnz rows read from the trailing zero block
    pos_of_sorted[nz_rows:n_rows] = off + np.arange(n_rows - nz_rows)
    # positions include per-tier group padding, so they can exceed n_rows;
    # they must still fit the int32 gather indices used on device
    if off + (n_rows - nz_rows) > np.iinfo(np.int32).max:
        raise ValueError("row-ELL padded row count exceeds int32 index range")
    perm_inv = np.empty(n_rows, dtype=np.int64)
    perm_inv[perm] = pos_of_sorted
    return RowEll(
        tuple(tiers),
        jnp.asarray(perm_inv, dtype=jnp.int32),
        int(n_rows),
        int(n_cols),
        nz_rows,
    )


# w-split: wide grouped tiers run as SPMM_WSPLIT independent half-width
# gather->multiply->reduce chains summed at the end — 4.21 -> 3.78 ms =
# 555 M nnz/s at the bench shape (exact; halves the peak gathered-block
# footprint and the chains pipeline).  Sweep over split {1,2,3,4} x
# min_w {8,16,32}: split2/minw8 best (experiments/spmm_wsplit.py).
# Measured negatives at the same shape: bf16 table (5.73), einsum-over-w
# MXU (tie), fully-sorted gather order (tie) — docs "Round 4".
SPMM_WSPLIT = 2
SPMM_WSPLIT_MIN_W = 8


@functools.partial(jax.jit, static_argnames=("n_rows", "nz_rows"))
def _spmm(tiers, perm_inv, dense, *, n_rows, nz_rows):
    n = dense.shape[1]
    dt = jnp.result_type(dense.dtype, tiers[0][1].dtype if tiers else dense.dtype)
    outs = []
    for c, d in tiers:
        if c.ndim == 3:
            w = c.shape[1]
            k = SPMM_WSPLIT if w >= SPMM_WSPLIT_MIN_W else 1
            if k > 1 and w >= 2 * k:
                bnds = [w * t // k for t in range(k + 1)]
                o = None
                for t in range(k):
                    s0, s1 = bnds[t], bnds[t + 1]
                    g = jnp.take(dense, c[:, s0:s1], axis=0)
                    p = (d[:, s0:s1, :, None].astype(dt) * g.astype(dt)).sum(axis=1)
                    o = p if o is None else o + p
            else:
                g = jnp.take(dense, c, axis=0)  # grouped (r/G, w, G, n)
                o = (d.astype(dt)[:, :, :, None] * g.astype(dt)).sum(axis=1)  # (r/G, G, n)
            outs.append(o.reshape(-1, n))  # physical no-op: tile covers (G, n)
        else:
            g = jnp.take(dense, c, axis=0)  # legacy (r, w, n)
            outs.append((d.astype(dt)[:, :, None] * g.astype(dt)).sum(axis=1))
    pad = jnp.zeros((n_rows - nz_rows, n), dtype=dt)
    out_sorted = jnp.concatenate(outs + [pad], axis=0) if outs else pad
    return jnp.take(out_sorted, perm_inv, axis=0)


def row_ell_spmm(re: RowEll, dense):
    """``A @ B`` → dense ``(n_rows, N)`` with exact f32 accumulation."""
    return _spmm(re.tiers, re.perm_inv, dense, n_rows=re.n_rows, nz_rows=re.nz_rows)


def _onehot_products_call(n_entries, blk=2048, interpret=False):
    """pallas_call computing per-entry products ``data[e] * x[cols[e]]``
    with x resident in VMEM as a TRANSPOSED (256, T) hi|lo bf16 split
    table (``x2t[m, q]`` = hi of ``x[q*128+m]``; rows 128..255 the lo).

    The pick is an in-VMEM one-hot MXU contraction — measured at 1142 M
    rows/s (MXU bf16 peak) vs the take-based gather's 706 M rows/s issue
    bound.  Entries are processed in LANES so the sublane lane-select
    reduce lands lane-major and the (n/128, 128) products stream writes
    DENSE: the entry-in-sublanes form emits a (n, 1) column whose TPU
    tile layout silently pads to 128 lanes — a hidden 1.19 GB round trip
    that cost 1.8 ms at the bench shape (docs/spmm_roofline.md "SpMV
    (round 3)").  hi/lo split keeps relative error ~1e-6."""
    import contextlib

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x2t_ref, col_ref, dat_ref, out_ref):
        T = x2t_ref.shape[1]
        levels = x2t_ref.shape[0] // 128
        c = col_ref[:].reshape(1, blk)
        q = c // 128
        m = c - q * 128
        ohT = (jax.lax.broadcasted_iota(jnp.int32, (T, blk), 0) == q).astype(jnp.bfloat16)
        pickedT = jnp.dot(x2t_ref[:], ohT, preferred_element_type=jnp.float32)  # (128*L, blk)
        foldedT = pickedT[:128, :]
        for lv in range(1, levels):
            foldedT = foldedT + pickedT[128 * lv : 128 * (lv + 1), :]
        eqT = jax.lax.broadcasted_iota(jnp.int32, (128, blk), 0) == m
        selT = jnp.sum(jnp.where(eqT, foldedT, 0.0), axis=0, keepdims=True)  # (1, blk)
        out_ref[:] = (selT * dat_ref[:].reshape(1, blk)).reshape(blk // 128, 128)

    def call(x2t, cols, data):
        T = x2t.shape[1]
        tab_rows = x2t.shape[0]
        # Mosaic rejects kernels traced in x64 mode (package enables x64)
        ctx = contextlib.nullcontext() if interpret else jax.enable_x64(False)
        with ctx:
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n_entries // 128, 128), jnp.float32),
                grid=(n_entries // blk,),
                in_specs=[
                    pl.BlockSpec((tab_rows, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((blk // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                interpret=interpret,
            )(x2t, cols, data)

    return call


# largest hi|lo table height kept resident in VMEM: (8192, 256) bf16 = 4 MB
ONEHOT_SPMV_MAX_K = 8192 * 128


def _spmv_onehot(tiers, perm_inv, x, *, n_rows, nz_rows, interpret=False, blk=2048, levels=2):
    if not tiers:
        return jnp.take(jnp.zeros(n_rows, jnp.float32), perm_inv)
    k = x.shape[0]
    T = -(-k // 128)
    xp = jnp.pad(x.astype(jnp.float32), (0, T * 128 - k)).reshape(T, 128)
    # hi = round-to-nearest bf16 truncation computed via INTEGER bit
    # arithmetic: on TPU, XLA's convert-folding rewrites the naive
    # `(xp - bf16(xp).astype(f32))` so the subtraction happens in bf16 and
    # the lo half folds to exactly zero (observed; optimization_barrier
    # does not stop it).  Bitmasking is opaque to the algebraic simplifier.
    # ``levels`` bf16 residual splits: 2 -> relerr ~1e-6, 3 -> ~1e-8
    # (f32-roundoff scale) at +1 MXU level.
    parts = []
    rem = xp
    for _ in range(levels - 1):
        ri = jax.lax.bitcast_convert_type(rem, jnp.int32)
        hi_f32 = jax.lax.bitcast_convert_type((ri + 0x8000) & jnp.int32(-65536), jnp.float32)
        parts.append(hi_f32.astype(jnp.bfloat16).T)
        rem = rem - hi_f32
    parts.append(rem.astype(jnp.bfloat16).T)
    x2t = jnp.concatenate(parts, axis=0)  # transposed (128*levels, T)

    # the kernel is order-independent (x is VMEM-resident), so stream the
    # entries ROW-MAJOR — each row's products land contiguous and the tail
    # reduce is a plain minor-axis (lane) row sum instead of a strided
    # middle-axis reduce over the grouped (r/G, w, G) layout
    def row_major(a):
        return (a.transpose(0, 2, 1) if a.ndim == 3 else a).reshape(-1)

    flat_cols = jnp.concatenate([row_major(c) for c, _ in tiers])
    flat_data = jnp.concatenate([row_major(d.astype(jnp.float32)) for _, d in tiers])
    n_flat = flat_cols.shape[0]
    n_pad = -(-n_flat // blk) * blk
    flat_cols = jnp.pad(flat_cols, (0, n_pad - n_flat))
    flat_data = jnp.pad(flat_data, (0, n_pad - n_flat))

    prods = _onehot_products_call(n_pad, blk=blk, interpret=interpret)(x2t, flat_cols, flat_data)
    prods = prods.reshape(-1)

    outs = []
    off = 0
    for c, _ in tiers:
        sz = int(np.prod(c.shape))
        rp = c.shape[0] * c.shape[2] if c.ndim == 3 else c.shape[0]
        outs.append(prods[off : off + sz].reshape(rp, -1).sum(axis=1))
        off += sz
    pad = jnp.zeros(n_rows - nz_rows, jnp.float32)
    out_sorted = jnp.concatenate(outs + [pad]) if outs else pad
    # unpermute via ROW gather + fused lane select: the scalar
    # take(out_sorted, perm_inv) costs 2.1 ms at the bench shape (65k
    # 4-byte gathers are issue-bound); 512-byte row gathers stream at
    # bandwidth (same asymmetry as the lane-gather SpMV itself).  The
    # barrier forces the 33-piece concat to materialize (260 KB) instead
    # of XLA distributing the gather over every piece.
    out_sorted = jax.lax.optimization_barrier(out_sorted)
    P = out_sorted.shape[0]
    Pp = -(-P // 128) * 128
    os2 = jnp.pad(out_sorted, (0, Pp - P)).reshape(-1, 128)
    g = jnp.take(os2, perm_inv // 128, axis=0)  # (n_rows, 128)
    lanes = jnp.arange(128, dtype=perm_inv.dtype)
    return jnp.where((perm_inv % 128)[:, None] == lanes, g, 0.0).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("n_rows", "nz_rows", "lane_gather"))
def _spmv(tiers, perm_inv, x, *, n_rows, nz_rows, lane_gather):
    dt = jnp.result_type(x.dtype, tiers[0][1].dtype if tiers else x.dtype)
    k = x.shape[0]
    outs = []
    if lane_gather:
        kp = -(-k // 128) * 128
        xp = jnp.pad(x, (0, kp - k)).reshape(-1, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
    for c, d in tiers:
        if lane_gather:
            g = jnp.take(xp, c // 128, axis=0)  # (..., w, [G,] 128)
            sel = jnp.where((c % 128)[..., None] == lanes, g, 0).sum(axis=-1)
        else:
            sel = jnp.take(x, c)
        o = (d.astype(dt) * sel.astype(dt)).sum(axis=1)
        outs.append(o.reshape(-1) if c.ndim == 3 else o)
    pad = jnp.zeros(n_rows - nz_rows, dtype=dt)
    out_sorted = jnp.concatenate(outs + [pad]) if outs else pad
    if lane_gather:
        # row-gather + fused lane-select unpermute (exact: selects one
        # element); the scalar take is issue-bound on TPU.  Barrier: stop
        # XLA from distributing the gather over the 33-piece concat.
        out_sorted = jax.lax.optimization_barrier(out_sorted)
        P = out_sorted.shape[0]
        Pp = -(-P // 128) * 128
        os2 = jnp.pad(out_sorted, (0, Pp - P)).reshape(-1, 128)
        g2 = jnp.take(os2, perm_inv // 128, axis=0)
        lanes2 = jnp.arange(128, dtype=perm_inv.dtype)
        return jnp.where((perm_inv % 128)[:, None] == lanes2, g2, 0).sum(axis=1).astype(dt)
    return jnp.take(out_sorted, perm_inv)


_spmv_onehot_jit = functools.partial(
    jax.jit, static_argnames=("n_rows", "nz_rows", "interpret", "blk", "levels")
)(_spmv_onehot)


_SPMM_PROGRAMS = {}


def row_ell_spmm_program(re: RowEll):
    """A jitted ``dense -> A @ dense`` program with the layout EMBEDDED as
    compile-time constants, memoized on the layout's buffers.

    Embedding matters on TPU: with tier arrays as runtime arguments XLA
    emits ~190 extra layout-conversion copies around the gathers (4.65 ms
    at the bench shape); as constants it pre-lays-out and pre-slices them
    (3.78 ms with the w-split — the measured 555 M nnz/s operating
    point).  Use for repeated products against a fixed matrix (solvers,
    iterative workloads, benchmarks); one-shot callers use
    :func:`row_ell_spmm`."""
    key = (id(re.tiers), id(re.perm_inv))
    entry = _SPMM_PROGRAMS.get(key)
    if entry is not None and entry[0] is re.tiers and entry[1] is re.perm_inv:
        return entry[2]

    @jax.jit
    def prog(dense):
        return _spmm.__wrapped__(re.tiers, re.perm_inv, dense, n_rows=re.n_rows, nz_rows=re.nz_rows)

    _SPMM_PROGRAMS[key] = (re.tiers, re.perm_inv, prog)
    if len(_SPMM_PROGRAMS) > 32:  # bound the program cache
        _SPMM_PROGRAMS.pop(next(iter(_SPMM_PROGRAMS)))
    return prog


def row_ell_spmv(re: RowEll, x, lane_gather=None, strategy=None, interpret=False):
    """``A @ x`` → dense ``(n_rows,)``.

    ``strategy``:

    - ``"exact"`` (default): exact f32/f64 accumulation.  On TPU the
      lane-gather form (x read through a ``(K/128, 128)`` view — one
      512-byte row gather per entry plus a fused one-hot lane select;
      scalar gathers are issue-rate-bound at ~140M/s), plain ``take`` on
      CPU; override with ``lane_gather``.
    - ``"onehot"``: the Pallas in-VMEM one-hot MXU pick (TPU;
      ``n_cols <= ONEHOT_SPMV_MAX_K``): 1.71x the lane form at the bench
      shape (5.68 -> 3.32 ms, 631 M nnz/s) with 2-level hi|lo-split
      relative error ~1e-6 — the throughput path for f32 workloads
      (docs/spmm_roofline.md "SpMV (round 3)").
    - ``"onehot3"``: same with a 3-level split — relative error ~1e-8
      (f32-roundoff scale) at one extra MXU level; still well under the
      exact path's cost.  Iterative solvers can pass
      ``lambda v: row_ell_spmv(re, v, strategy="onehot3")`` as the
      matvec callable."""
    if strategy in ("onehot", "onehot3"):
        if x.shape[0] > ONEHOT_SPMV_MAX_K:
            # An oversized x2t table would blow the VMEM budget and go
            # straight to a Mosaic compile that can crash/hang the shared
            # TPU compile service (ADVICE r3) — refuse before tracing.
            raise ValueError(
                f"strategy={strategy!r} requires n_cols <= {ONEHOT_SPMV_MAX_K} "
                f"(got {x.shape[0]}); use the default exact lane-gather path"
            )
        return _spmv_onehot_jit(
            re.tiers,
            re.perm_inv,
            x,
            n_rows=re.n_rows,
            nz_rows=re.nz_rows,
            interpret=interpret,
            levels=3 if strategy == "onehot3" else 2,
        )
    if lane_gather is None:
        lane_gather = jax.default_backend() not in ("cpu",)
    return _spmv(
        re.tiers, re.perm_inv, x, n_rows=re.n_rows, nz_rows=re.nz_rows, lane_gather=bool(lane_gather)
    )
