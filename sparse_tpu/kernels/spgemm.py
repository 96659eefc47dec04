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

r5: the whole pipeline is on a TWO-big-sort budget (r4 paid ~5 sorts of
``product_capacity``-sized arrays — VERDICT r4 #4):

- the expansion's ``searchsorted(ends, arange(P))`` (2 sorts) is now a
  BLOCKED COMPARE-COUNT: block-boundary ranks from a small searchsorted
  (``nnz_a + P/B`` elements), then ``e[p] = base[block] + #{window keys
  <= p}`` with a per-block gathered key window.  The window bound W = B
  is static because ``ends`` is strictly increasing once zero-repeat
  A-entries (ties) are pushed to the back by a small trace-time co-sort;
  their pile at ``ends == total`` only affects p >= total, which the
  validity mask already discards.
- the contraction's ``searchsorted(seg, arange(ocap))`` head/tail lookup
  (2 sorts) is gone: the segmented Hillis-Steele scan now runs BACKWARD,
  leaving each duplicate-group's total at its HEAD slot, and one
  multi-operand co-sort of ``(head ? key : +inf, head ? total : 0)``
  compacts the result — replacing 2 sorts + packed gathers with 1 sort.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .search import searchsorted_sorted_probes

_COUNT_BLOCK = 64  # probe-grid block width B for the blocked compare-count


def product_count(cols_a, rows_b, k):
    """Host helper: the exact number of expanded partial products."""
    counts_b = np.bincount(np.asarray(rows_b), minlength=k)
    return int(counts_b[np.asarray(cols_a)].sum())


def _f32_bits(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _bits_f32(i):
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _blocked_rank_grid(ends, pcap):
    """``e[p] = #{ends <= p}`` for the dense probe grid ``p = 0..pcap-1``
    WITHOUT a product-sized sort.  ``ends`` must be non-decreasing with all
    ties at its maximum (zero-tail form) so every width-B window of the
    value grid holds at most B keys below the tie value."""
    n_k = ends.shape[0]
    B = _COUNT_BLOCK
    nblk = -(-pcap // B)
    # block-boundary ranks: base[t] = #{ends < t*B}  (small: n_k + nblk+1)
    base = searchsorted_sorted_probes(ends, jnp.arange(nblk + 1, dtype=ends.dtype) * B, side="left")
    base = base.astype(jnp.int32)
    # per-block key window: keys >= t*B start at base[t]; at most B of them
    # lie below (t+1)*B (strict increase below the tie pile), and gathered
    # keys beyond the block are >= the next block start, comparing False
    # against every in-block probe.  The windows are CONTIGUOUS, so fetch
    # them as nblk SLICE gathers (slice_sizes=B) — a jnp.take with (nblk,
    # B) fancy indices would issue pcap SCALAR gathers (~140 M/s: ~20 ms
    # at 2.8M products, as costly as the sort it replaces).  A sentinel
    # tail keeps every window in bounds without start-clipping (clipped
    # starts would slide the window BACK over already-counted keys).
    # int32 value domain when it fits (int64 compares are emulated on TPU:
    # the int64 form of this count measured 90 ms at 2.8M products — the
    # entire pipeline's cost — vs ~2 ms in int32)
    i32 = pcap + B < np.iinfo(np.int32).max
    vdt = jnp.int32 if i32 else ends.dtype
    sent = np.iinfo(np.int32).max if i32 else np.iinfo(np.int64).max
    ends_v = jnp.minimum(ends, sent).astype(vdt) if i32 else ends
    # Fetch each block's key window as TWO ALIGNED 64-lane ROW gathers
    # from a (n/64, 64) reshape of the sorted keys.  Both a fancy-indexed
    # jnp.take and a lax.gather with slice_sizes=(B,) lower to per-ELEMENT
    # gathers on TPU (measured 54-92 ms at 2.8M products — the scalar
    # 140 M/s issue bound); 2-D-table row gathers run at the ~700 M rows/s
    # row rate.  The window [base, base+B) sits inside the two aligned
    # rows [64*(base//64), 64*(base//64)+128); gathered keys with rank <
    # base all compare <= p (they precede the block), so subtracting
    # base % 64 corrects the count exactly.
    n2 = n_k // 64 + 2
    tbl = jnp.concatenate([ends_v, jnp.full(n2 * 64 - n_k, sent, vdt)]).reshape(n2, 64)
    rowidx = (base[:-1] // 64).astype(jnp.int32)
    gk = jnp.concatenate([jnp.take(tbl, rowidx, axis=0), jnp.take(tbl, rowidx + 1, axis=0)], axis=1)  # (nblk, 128)
    probes = (jnp.arange(nblk, dtype=jnp.int32)[:, None] * B + jnp.arange(B, dtype=jnp.int32)[None, :]).astype(vdt)
    # compare laid out (nblk, B, W) so the reduction runs over the MINOR
    # (lane) axis
    cnt = jnp.sum(gk[:, None, :] <= probes[:, :, None], axis=2, dtype=jnp.int32) - (base[:-1] % 64)[:, None]
    return (base[:-1, None] + cnt).reshape(nblk * B)[:pcap]


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
    startsb_a = starts_b[cols_a]

    # zero-tail reorder: push zero-repeat A-entries (they own no products)
    # behind the rest with one SMALL stable co-sort, so the cumulative
    # ``ends`` below is strictly increasing except for a tie pile at
    # ``total`` — the static-window guarantee of the blocked count
    if nnz_a:
        zkey = (repeats == 0).astype(jnp.int32)
        if packed:
            _, repeats, startsb_a, rows_az, data_bits = jax.lax.sort(
                (zkey, repeats, startsb_a.astype(jnp.int64), rows_a.astype(jnp.int32), _f32_bits(data_a)),
                num_keys=1,
                is_stable=True,
            )
            data_az = _bits_f32(data_bits)
        else:
            _, repeats, startsb_a, rows_az, data_az = jax.lax.sort(
                (zkey, repeats, startsb_a.astype(jnp.int64), rows_a.astype(jnp.int64), data_a),
                num_keys=1,
                is_stable=True,
            )
    else:
        rows_az, data_az = rows_a, data_a

    ends = jnp.cumsum(repeats)
    starts_prod = ends - repeats
    total = ends[-1] if nnz_a else jnp.asarray(0, jnp.int64)

    # expansion: product p belongs to A-entry e(p) = #{ends <= p} — the
    # blocked compare-count (no product-sized sort; r4 paid a double
    # argsort of (nnz_a + P) here)
    p_idx = jnp.arange(product_capacity, dtype=jnp.int64)
    e = _blocked_rank_grid(ends.astype(jnp.int64), product_capacity)
    e_c = jnp.clip(e, 0, max(nnz_a - 1, 0))
    valid = p_idx < total

    if packed:
        # a-side per-product values by WINDOW-SELECT, not a (P, 4) row
        # gather: e is non-decreasing, so each 64-product block's
        # a-entries sit in a 65-rank window — fetch 2 aligned 64-lane
        # rows per field and one-hot-select (exact for every bit pattern
        # incl. NaN data).  The (P, 4) gather's rows tile-pad 4->128
        # lanes: 15.1 ms vs 6.0 at 2.8M products
        # (experiments/spgemm_gathers_r5.py).  ``shift`` folds the two
        # offset fields: b_idx = shift[e] + p.
        B = _COUNT_BLOCK
        nblk = -(-product_capacity // B)
        shift = (startsb_a - starts_prod).astype(jnp.int32)
        npad = nnz_a // 64 + 2

        def _field_tbl(f):
            return jnp.concatenate([f, jnp.zeros(npad * 64 - nnz_a, f.dtype)]).reshape(npad, 64)

        e_pad = jnp.concatenate(
            [e.astype(jnp.int32), jnp.full(nblk * B - product_capacity, nnz_a, jnp.int32)]
        ).reshape(nblk, B)
        row0 = e_pad[:, 0] // 64
        li = e_pad - (row0 * 64)[:, None]  # lane index in [0, 128) for valid products
        oh = (li[:, :, None] == jnp.arange(128, dtype=jnp.int32)[None, None, :]).astype(jnp.int32)

        def _wsel(f):
            ft = _field_tbl(f)
            g = jnp.concatenate([jnp.take(ft, row0, axis=0), jnp.take(ft, jnp.minimum(row0 + 1, npad - 1), axis=0)], axis=1)
            return jnp.sum(oh * g[:, None, :], axis=2, dtype=jnp.int32).reshape(-1)[:product_capacity]

        rows_sel = _wsel(rows_az.astype(jnp.int32))
        shift_sel = _wsel(shift)
        data_sel = _wsel(_f32_bits(data_az))
        b_idx = jnp.clip(shift_sel + p_idx.astype(jnp.int32), 0, max(nnz_b - 1, 0))
        b_tab = jnp.stack([cols_b.astype(jnp.int32), _f32_bits(data_b)], axis=1)
        gb = jnp.take(b_tab, b_idx, axis=0)  # (P, 2)
        out_i = jnp.where(valid, rows_sel, jnp.iinfo(jnp.int32).max).astype(jnp.int64)
        out_j = jnp.where(valid, gb[:, 0], 0).astype(jnp.int64)
        v = jnp.where(valid, _bits_f32(data_sel) * _bits_f32(gb[:, 1]), 0.0)
    else:
        within = p_idx - starts_prod[e_c]
        b_idx = jnp.clip(startsb_a[e_c] + within, 0, max(nnz_b - 1, 0))
        out_i = jnp.where(valid, rows_az[e_c], jnp.iinfo(jnp.int32).max).astype(jnp.int64)
        out_j = jnp.where(valid, cols_b[b_idx], 0).astype(jnp.int64)
        v = jnp.where(valid, data_az[e_c].astype(dt) * data_b[b_idx].astype(dt), 0)

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

    # per-segment SUFFIX sums via a BACKWARD segmented Hillis-Steele scan
    # (adds stay within segments — exact, no global-cumsum error growth):
    # each duplicate-group's total lands at its HEAD slot, so no head/tail
    # searchsorted lookup is needed afterwards
    x = v_s
    d = 1
    while d < product_capacity:
        same = seg[d:] == seg[:-d]
        x = x + jnp.concatenate([jnp.where(same, x[d:], 0), jnp.zeros(d, x.dtype)])
        d *= 2

    # compact the head slots with ONE co-sort: heads keep their (already
    # ascending, unique) key, every other slot floats to +inf
    big = jnp.asarray(np.iinfo(np.int64).max, key.dtype)
    ck = jnp.where(is_new, key_s, big)
    cv = jnp.where(is_new, x, 0)
    ck_s, cv_s = jax.lax.sort((ck, cv), num_keys=1)

    slot = jnp.arange(out_capacity)
    in_range = slot < out_nnz
    keys_out = jnp.where(in_range, ck_s[:out_capacity], jnp.asarray(-1, key.dtype))
    sums = jnp.where(in_range, cv_s[:out_capacity], 0)

    out_rows = jnp.where(in_range, keys_out // n, jnp.iinfo(jnp.int32).max).astype(jnp.int32)
    out_cols = jnp.where(in_range, keys_out % n, 0).astype(jnp.int32)
    out_data = jnp.where(in_range, sums, 0).astype(dt)
    return out_rows, out_cols, out_data, out_nnz
