"""Probe 3: group-interleaved row-ELL (r/G, w, G) — exact widths AND
row-major-ish gather order.

The transposed (w, r) layout killed the 8-sublane padding tax but pays a
j-major gather order (640-665 GB/s vs 721 for the (r, w) layout and 768
for fully sorted).  A (r/G, w, G) index array keeps the physical tile on
the trailing (G, 128) dims — w is a free middle dim, so tiers stay
exact-width — while the gather traversal for each group of G rows
interleaves G ascending per-row column runs (closer to globally sorted
order than either previous layout).  The reduce is
(data * g).sum(axis=1) -> (r/G, G, 128), whose reshape to (r, 128) is a
physical no-op (same tile bytes).

Run on the real TPU:  python experiments/rowell_t3.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments.rowell_transposed import build_problem, timed, M, K, N, ITERS


def build_grouped(rows, cols, data, n_rows, max_tiers=32, group=8, sort_rows=True):
    """Exact-width tiers; each tier is (r/G, w, G) index/data arrays with
    rows-per-tier padded to a multiple of ``group`` via dummy zero rows."""
    nnz = rows.shape[0]
    counts = np.bincount(rows, minlength=n_rows)
    perm = np.argsort(-counts, kind="stable")
    sorted_counts = counts[perm]
    nz_rows = int((sorted_counts > 0).sum())

    order = np.argsort(rows, kind="stable")
    cols_s = cols[order]
    data_s = data[order]
    indptr = np.concatenate([[0], np.cumsum(counts)])

    w_of = sorted_counts[:nz_rows]
    b = np.flatnonzero(np.diff(w_of)) + 1
    bounds = [
        (int(s), int(e), int(w_of[s]))
        for s, e in zip(np.concatenate([[0], b]), np.concatenate([b, [nz_rows]]))
    ]
    while len(bounds) > max_tiers:
        costs = [
            (bounds[i + 1][1] - bounds[i + 1][0]) * (bounds[i][2] - bounds[i + 1][2])
            for i in range(len(bounds) - 1)
        ]
        i = int(np.argmin(costs))
        bounds[i] = (bounds[i][0], bounds[i + 1][1], bounds[i][2])
        del bounds[i + 1]

    tiers = []
    pos_of_sorted = np.empty(n_rows, dtype=np.int64)
    off = 0
    slots = 0
    for start, end, w in bounds:
        r = end - start
        rp = -(-r // group) * group
        c2 = np.zeros((rp, w), dtype=np.int32)
        d2 = np.zeros((rp, w), dtype=np.float32)
        orig = perm[start:end]
        s = indptr[orig]
        cnt = indptr[orig + 1] - s
        rr = np.repeat(np.arange(r), cnt)
        pz = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        src = np.repeat(s, cnt) + pz
        c2[rr, pz] = cols_s[src]
        d2[rr, pz] = data_s[src]
        if sort_rows:
            key = np.where(cnt > 0, cols_s[s], np.iinfo(np.int64).max)
            key = np.concatenate([key, np.full(rp - r, np.iinfo(np.int64).max)])
            o = np.argsort(key, kind="stable")
        else:
            o = np.arange(rp)
        inv_o = np.empty(rp, dtype=np.int64)
        inv_o[o] = np.arange(rp)
        c2 = c2[o]
        d2 = d2[o]
        # (rp, w) -> (rp/G, G, w) -> (rp/G, w, G)
        c3 = np.ascontiguousarray(c2.reshape(rp // group, group, w).transpose(0, 2, 1))
        d3 = np.ascontiguousarray(d2.reshape(rp // group, group, w).transpose(0, 2, 1))
        tiers.append((jnp.asarray(c3), jnp.asarray(d3)))
        pos_of_sorted[start:end] = off + inv_o[np.arange(r)]
        off += rp
        slots += w * rp
    pos_of_sorted[nz_rows:n_rows] = off + np.arange(n_rows - nz_rows)
    perm_inv = np.empty(n_rows, dtype=np.int64)
    perm_inv[perm] = pos_of_sorted
    return tiers, jnp.asarray(perm_inv, dtype=jnp.int32), off, slots


def spmm_g(tiers, perm_inv, dense, n_rows):
    outs = []
    for c3, d3 in tiers:
        g = jnp.take(dense, c3, axis=0)  # (r/G, w, G, N)
        o = (d3[:, :, :, None] * g).sum(axis=1)  # (r/G, G, N)
        outs.append(o.reshape(-1, dense.shape[1]))
    pad = jnp.zeros((n_rows, dense.shape[1]), dtype=jnp.float32)
    out_sorted = jnp.concatenate(outs + [pad], axis=0)
    return jnp.take(out_sorted, perm_inv, axis=0)


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    for group in (8, 16, 32):
        for sort_rows in ((True, False) if group == 8 else (True,)):
            tiers, perm_inv, total_padded, slots = build_grouped(
                rows, cols, data, M, max_tiers=32, group=group, sort_rows=sort_rows
            )
            tag = f"G={group:2d} sort={int(sort_rows)}"
            gb_rw = slots * N * 4 * 2 / 1e9

            @jax.jit
            def run_gather(ts, d):
                def body(carry, i):
                    eps = i.astype(jnp.float32) * 1e-6
                    acc = carry
                    for c3, _ in ts:
                        g = jnp.take(d + eps, c3, axis=0)
                        acc = acc + g.ravel()[0]
                    return acc, None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
                return acc

            t = timed(run_gather, tiers, dense_j)
            print(f"[{tag}] gather : {t*1e3:8.3f} ms ({gb_rw/t:6.1f} GB/s, pad x{slots/nnz:.4f})")

            f = jax.jit(lambda ts, pi, d: spmm_g(ts, pi, d, M))
            out = f(tiers, perm_inv, dense_j)
            err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))

            @jax.jit
            def run_full(ts, pi, d):
                def body(carry, i):
                    eps = i.astype(jnp.float32) * 1e-6
                    tp = [(c, dd + eps) for c, dd in ts]
                    out = spmm_g(tp, pi, d + eps, M)
                    return carry + out.ravel()[0], None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
                return acc

            t = timed(run_full, tiers, perm_inv, dense_j)
            print(
                f"[{tag}] FULL   : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)  relerr {err:.1e}"
            )


if __name__ == "__main__":
    main()
