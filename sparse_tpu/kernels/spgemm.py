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

TPU cost model (r4 measurements at 2.8M products, v5e):

- XLA scatter SERIALIZES: ``jnp.bincount`` and ``segment_sum/min`` were
  420+ ms — replaced by searchsorted edges and a segmented scan;
- every JAX ``searchsorted`` lowering loses (scalar-gather while_loop /
  scatter-based rank) — replaced by :func:`searchsorted_sorted_probes`
  (double argsort, two vectorized sorts);
- per-product SCALAR gathers issue at ~140 M/s — the f32 path packs the
  per-entry columns into int32 lane tables (one row gather replaces 3-4
  scalar gathers) and co-sorts values with keys via multi-operand
  ``lax.sort`` (no permutation gathers).
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


def _f32_bits(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _bits_f32(i):
    return jax.lax.bitcast_convert_type(i, jnp.float32)


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
    packed = dt == jnp.float32 and product_capacity < np.iinfo(np.int32).max

    # B row segmentation (B canonical: sorted by row): searchsorted edges,
    # not bincount (XLA scatter-add serializes on TPU)
    edges = searchsorted_sorted_probes(rows_b, jnp.arange(k + 1, dtype=rows_b.dtype), side="left")
    counts_b = jnp.diff(edges)
    starts_b = edges[:-1]

    # per-A-entry quantities (nnz_a-sized gathers: cheap)
    repeats = counts_b[cols_a]
    ends = jnp.cumsum(repeats)
    starts_prod = ends - repeats
    startsb_a = starts_b[cols_a]
    total = ends[-1] if nnz_a else jnp.asarray(0, ends.dtype)

    # expansion: product p belongs to A-entry e(p)
    p_idx = jnp.arange(product_capacity, dtype=ends.dtype)
    e = searchsorted_sorted_probes(ends, p_idx, side="right")
    e_c = jnp.clip(e, 0, max(nnz_a - 1, 0))
    valid = p_idx < total

    if packed:
        # ONE row gather per product per side instead of 3-4 scalar gathers
        a_tab = jnp.stack(
            [
                rows_a.astype(jnp.int32),
                starts_prod.astype(jnp.int32),
                startsb_a.astype(jnp.int32),
                _f32_bits(data_a),
            ],
            axis=1,
        )
        ga = jnp.take(a_tab, e_c, axis=0)  # (P, 4)
        within = p_idx.astype(jnp.int32) - ga[:, 1]
        b_idx = jnp.clip(ga[:, 2] + within, 0, max(nnz_b - 1, 0))
        b_tab = jnp.stack([cols_b.astype(jnp.int32), _f32_bits(data_b)], axis=1)
        gb = jnp.take(b_tab, b_idx, axis=0)  # (P, 2)
        out_i = jnp.where(valid, ga[:, 0], jnp.iinfo(jnp.int32).max).astype(jnp.int64)
        out_j = jnp.where(valid, gb[:, 0], 0).astype(jnp.int64)
        v = jnp.where(valid, _bits_f32(ga[:, 3]) * _bits_f32(gb[:, 1]), 0.0)
    else:
        within = p_idx - starts_prod[e_c]
        b_idx = jnp.clip(startsb_a[e_c] + within, 0, max(nnz_b - 1, 0))
        out_i = jnp.where(valid, rows_a[e_c], jnp.iinfo(jnp.int32).max).astype(jnp.int64)
        out_j = jnp.where(valid, cols_b[b_idx], 0).astype(jnp.int64)
        v = jnp.where(valid, data_a[e_c].astype(dt) * data_b[b_idx].astype(dt), 0)

    # contract: co-sort (key, value) in ONE multi-operand lax.sort — no
    # argsort permutation gathers; sentinel rows sort last
    key = out_i * n + out_j
    key_s, v_s = jax.lax.sort((key, v), num_keys=1)

    is_new = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]]) & (
        key_s < jnp.asarray(jnp.iinfo(jnp.int32).max, key.dtype) * n
    )
    # segment id per product; products of the same (i,j) share one id.
    # (Invalid/sentinel products fold into the last real segment with
    # v == 0 — harmless for sums.)
    seg = jnp.cumsum(is_new) - 1
    out_nnz = is_new.sum()

    # per-segment prefix sums via a segmented Hillis-Steele scan (adds stay
    # WITHIN segments — exact, no global-cumsum error growth)
    x = v_s
    d = 1
    while d < product_capacity:
        same = seg[d:] == seg[:-d]
        x = x + jnp.concatenate([jnp.zeros(d, x.dtype), jnp.where(same, x[:-d], 0)])
        d *= 2

    # seg ids are contiguous 0..out_nnz-1, so ONE searchsorted over an
    # (out_capacity+1) probe grid gives both each segment's head and (via
    # shift) its end
    head_ext = searchsorted_sorted_probes(
        seg, jnp.arange(out_capacity + 1, dtype=seg.dtype), side="left"
    )
    head = jnp.clip(head_ext[:-1], 0, product_capacity - 1)
    end_pos = head_ext[1:]
    tail = jnp.clip(end_pos - 1, 0, product_capacity - 1)
    slot = jnp.arange(out_capacity)
    in_range = slot < out_nnz

    if packed:
        # pack (key lo32, key hi32, bitcast(x)) so the head/tail lookups
        # are row gathers too.  The sentinel tail folds into the last
        # segment: take keys from the head, sums from the tail.
        out_tab = jnp.stack(
            [
                (key_s & jnp.int64(0xFFFFFFFF)).astype(jnp.int32),
                (key_s >> jnp.int64(32)).astype(jnp.int32),
                _f32_bits(x),
            ],
            axis=1,
        )
        gh = jnp.take(out_tab, head, axis=0)
        gt = jnp.take(out_tab, tail, axis=0)
        keys_out_raw = (gh[:, 1].astype(jnp.int64) << jnp.int64(32)) | (
            gh[:, 0].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        )
        keys_out = jnp.where(in_range, keys_out_raw, jnp.asarray(-1, key.dtype))
        sums = jnp.where(in_range, _bits_f32(gt[:, 2]), 0.0)
    else:
        sums = jnp.where(in_range, x[tail], 0)
        keys_out = jnp.where(in_range, key_s[head], jnp.asarray(-1, key.dtype))

    out_rows = jnp.where(in_range, keys_out // n, jnp.iinfo(jnp.int32).max).astype(jnp.int32)
    out_cols = jnp.where(in_range, keys_out % n, 0).astype(jnp.int32)
    out_data = jnp.where(in_range, sums, 0).astype(dt)
    return out_rows, out_cols, out_data, out_nnz
