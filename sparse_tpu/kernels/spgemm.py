"""Traceable (jit-able) SpGEMM — expand–sort–contract with static capacity.

The reference's Gustavson kernel (``_common.py:640-717``) uses a sequential
linked-list accumulator — no parallel analogue on TPU. The eager path
(``ops/dot._spgemm``) already uses vectorized ESC on host; this module is
the **device-resident** variant for use inside ``jit``/``pjit`` where no
host sync is possible: all shapes are static, bounded by caller-provided
capacities (the "capacity/padding discipline" of SURVEY §7.2):

- ``product_capacity`` bounds the number of expanded partial products
  (exact value = sum over A's entries of B's matching row population; the
  helper :func:`product_count` computes it host-side, or use an upper
  bound like ``nnz_a * max_row_nnz_b``);
- the result is returned *padded*: entries beyond the true output nnz have
  an out-of-range sentinel coordinate and zero data, plus the true count as
  a traced scalar.

Every step is a sort / cumsum / gather / segment-op — the primitives the
TPU runs well.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .search import searchsorted_sorted_probes


def product_count(cols_a, rows_b, k):
    """Host helper: the exact number of expanded partial products."""
    counts_b = np.bincount(np.asarray(rows_b), minlength=k)
    return int(counts_b[np.asarray(cols_a)].sum())


@functools.partial(jax.jit, static_argnames=("k", "n", "product_capacity", "out_capacity"))
def esc_spgemm(rows_a, cols_a, data_a, rows_b, cols_b, data_b, *, k, n, product_capacity, out_capacity):
    """``A (m,k) @ B (k,n)`` for canonical COO operands, fully traceable.

    Returns ``(out_rows, out_cols, out_data, out_nnz)`` with arrays of
    length ``out_capacity``; entries past ``out_nnz`` are padding with
    coordinates ``(m, 0)``-style sentinels (row = int32 max) and zero data.
    """
    nnz_a = data_a.shape[0]
    nnz_b = data_b.shape[0]
    dt = jnp.promote_types(data_a.dtype, data_b.dtype)

    # B row segmentation (B canonical: sorted by row).  searchsorted edges,
    # NOT bincount: jnp.bincount lowers to XLA scatter-add, which
    # SERIALIZES on TPU — measured 28.8 of 33.6 ms at the reference
    # 100k^2 @ 1e-5 SpGEMM shape (experiments/spgemm_esc_roofline.py, r4)
    # method="sort": the default searchsorted lowering is a while_loop of
    # scalar gathers (~140 M probes/s TPU issue bound); the sort-based
    # form is one vectorized sort of keys+probes
    edges = searchsorted_sorted_probes(rows_b, jnp.arange(k + 1, dtype=rows_b.dtype), side="left")
    counts_b = jnp.diff(edges)
    starts_b = edges[:-1]

    # expansion: product p belongs to A-entry e(p)
    repeats = counts_b[cols_a]
    ends = jnp.cumsum(repeats)
    total = ends[-1] if nnz_a else jnp.asarray(0, ends.dtype)
    p_idx = jnp.arange(product_capacity, dtype=ends.dtype)
    e = searchsorted_sorted_probes(ends, p_idx, side="right")
    e_c = jnp.clip(e, 0, nnz_a - 1)
    within = p_idx - (ends[e_c] - repeats[e_c])
    b_idx = jnp.clip(starts_b[cols_a[e_c]] + within, 0, nnz_b - 1)
    valid = p_idx < total

    out_i = jnp.where(valid, rows_a[e_c], jnp.iinfo(jnp.int32).max).astype(jnp.int64)
    out_j = jnp.where(valid, cols_b[b_idx], 0).astype(jnp.int64)
    v = jnp.where(valid, data_a[e_c].astype(dt) * data_b[b_idx].astype(dt), 0)

    # contract: sort by (i, j) then sum runs of equal keys
    key = out_i * n + out_j  # sentinel rows sort last
    order = jnp.argsort(key)
    key_s = key[order]
    v_s = v[order]

    is_new = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]]) & (
        key_s < jnp.asarray(jnp.iinfo(jnp.int32).max, key.dtype) * n
    )
    # segment id per product; products of the same (i,j) share one id.
    # (Invalid/sentinel products fold into the last real segment with
    # v == 0 — harmless for sums.)
    seg = jnp.cumsum(is_new) - 1
    out_nnz = is_new.sum()

    # Scatter-free contraction (r4): XLA scatter serializes on TPU —
    # segment_sum/min measured ~420 of 456 ms at 2.8M products (fine at
    # 100k).  seg is SORTED, so (a) per-segment prefix sums via a
    # segmented Hillis-Steele scan (log2(P) shift-add passes; adds stay
    # WITHIN segments — exact, no global-cumsum error growth), and
    # (b) each segment's last position via ONE sort-based searchsorted
    # (the default searchsorted lowering is a scalar-gather while_loop —
    # as slow as the scatter it replaces).
    x = v_s
    d = 1
    while d < product_capacity:
        same = seg[d:] == seg[:-d]
        x = x + jnp.concatenate([jnp.zeros(d, x.dtype), jnp.where(same, x[:-d], 0)])
        d *= 2
    slot = jnp.arange(out_capacity)
    end_pos = searchsorted_sorted_probes(seg, slot, side="right")
    in_range = slot < out_nnz
    tail = jnp.clip(end_pos - 1, 0, product_capacity - 1)
    # sentinel products fold into the LAST segment with v == 0: their zeros
    # don't disturb x[tail], but the tail KEY there is the sentinel — take
    # keys from the segment head instead
    head = jnp.clip(
        searchsorted_sorted_probes(seg, slot, side="left"), 0, product_capacity - 1
    )
    sums = jnp.where(in_range, x[tail], 0)
    keys_out = jnp.where(in_range, key_s[head], jnp.asarray(-1, key.dtype))
    out_rows = jnp.where(in_range, keys_out // n, jnp.iinfo(jnp.int32).max).astype(jnp.int32)
    out_cols = jnp.where(in_range, keys_out % n, 0).astype(jnp.int32)
    out_data = jnp.where(in_range, sums, 0)
    return out_rows, out_cols, out_data, out_nnz
