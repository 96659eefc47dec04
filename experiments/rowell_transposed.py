"""Experiment: TRANSPOSED row-ELL (w-major) — kill the 8-sublane padding tax.

The current row-ELL gathers into (r, w, N): the physical f32 tile covers
the trailing (w, N) dims, so w must be a multiple of 8 and every row pays
ceil-to-8 padding (x1.109 fake entries at the bench density), and tier
merging (max_tiers=16) pads narrower classes up to wider widths on top.

A (w, r, N) layout puts the tile on (r, N): r pads to 8 **per tier**
(dummy rows, negligible) and w is a free leading dim -> tiers can be
EXACT per-width classes with zero fake entries.

Risk probed here: the j-major gather order visits each row's j-th entry
across all rows -> near-random source order, vs the current layout's short
ascending per-row runs (doc: ordered gathers ~750 GB/s, fully random ~557).

Run on the real TPU:  python experiments/rowell_transposed.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

M = K = 1 << 16
NNZ = 1 << 21
N = 128
ITERS = 50


def timed(fn, *args, n_iters=ITERS):
    @jax.jit
    def empty(x):
        return x + 1.0

    float(empty(jnp.float32(0)))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(empty(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))
    total = time.perf_counter() - t0
    return max(total - rtt, total * 0.1) / n_iters


def build_problem():
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    data = rng.random(lin.size, dtype=np.float32)
    dense = rng.random((K, N), dtype=np.float32)
    return rows, cols, data, dense


def build_transposed(rows, cols, data, n_rows, max_tiers=64, r_pad=8):
    """Degree-sorted, EXACT-width tiers, transposed (w, r) arrays,
    rows-per-tier padded to a multiple of ``r_pad`` with dummy rows."""
    nnz = rows.shape[0]
    counts = np.bincount(rows, minlength=n_rows)
    perm = np.argsort(-counts, kind="stable")  # relabeled -> original
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
    # relabeled positions including per-tier dummy padding rows
    pos_of_sorted = np.empty(n_rows, dtype=np.int64)
    off = 0
    slots = 0
    for start, end, w in bounds:
        r = end - start
        rp = -(-r // r_pad) * r_pad
        c2 = np.zeros((r, w), dtype=np.int32)
        d2 = np.zeros((r, w), dtype=np.float32)
        orig = perm[start:end]
        s = indptr[orig]
        cnt = indptr[orig + 1] - s
        rr = np.repeat(np.arange(r), cnt)
        pz = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        src = np.repeat(s, cnt) + pz
        c2[rr, pz] = cols_s[src]
        d2[rr, pz] = data_s[src]
        c2t = np.zeros((w, rp), dtype=np.int32)
        d2t = np.zeros((w, rp), dtype=np.float32)
        c2t[:, :r] = c2.T
        d2t[:, :r] = d2.T
        tiers.append((jnp.asarray(c2t), jnp.asarray(d2t)))
        pos_of_sorted[start:end] = off + np.arange(r)
        off += rp
        slots += w * rp
    # zero-nnz rows land in a trailing zero block
    pos_of_sorted[nz_rows:n_rows] = off + np.arange(n_rows - nz_rows)
    perm_inv = np.empty(n_rows, dtype=np.int64)
    perm_inv[perm] = pos_of_sorted
    return tiers, jnp.asarray(perm_inv, dtype=jnp.int32), off, slots


def spmm_t(tiers, perm_inv, dense, total_padded, n_rows):
    outs = []
    for c2t, d2t in tiers:
        g = jnp.take(dense, c2t, axis=0)  # (w, r, N)
        outs.append((d2t[:, :, None] * g).sum(axis=0))
    pad = jnp.zeros((n_rows - 0, N), dtype=jnp.float32)  # trailing zero rows block
    out_sorted = jnp.concatenate(outs + [pad], axis=0)
    return jnp.take(out_sorted, perm_inv, axis=0)


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    # ---------- baseline: current row-ELL ----------
    from sparse_tpu.kernels import build_row_ell, row_ell_spmm
    from sparse_tpu.kernels.row_ell import RowEll

    re = build_row_ell(rows, cols, data, M, K)
    base_slots = sum(int(c.size) for c, _ in re.tiers)
    print(f"current row-ELL: {len(re.tiers)} tiers, pad x{base_slots/nnz:.4f}")

    @jax.jit
    def run_base(tiers, perm_inv, dense):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            tp = tuple((c, d + eps) for c, d in tiers)
            rep = RowEll(tp, perm_inv, re.n_rows, re.n_cols, re.nz_rows)
            out = row_ell_spmm(rep, dense + eps)
            return carry + out.ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_base, re.tiers, re.perm_inv, dense_j)
    print(f"row-ELL (r,w) mp=8 mt=16 : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- transposed, tier-count sweep ----------
    for max_tiers in (64, 32, 24, 16):
        t0 = time.perf_counter()
        tiers, perm_inv, total_padded, slots = build_transposed(
            rows, cols, data, M, max_tiers=max_tiers
        )
        bt = time.perf_counter() - t0
        print(
            f"[mt={max_tiers}] build {bt:.2f}s, {len(tiers)} tiers, pad x{slots/nnz:.4f}, "
            f"padded rows {total_padded}"
        )

        f = jax.jit(lambda ts, pi, d: spmm_t(ts, pi, d, total_padded, M))
        out = f(tiers, perm_inv, dense_j)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
        print(f"  max relerr: {err:.2e}")

        @jax.jit
        def run_t(ts, pi, d):
            def body(carry, i):
                eps = i.astype(jnp.float32) * 1e-6
                tp = [(c, dd + eps) for c, dd in ts]
                out = spmm_t(tp, pi, d + eps, total_padded, M)
                return carry + out.ravel()[0], None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        t = timed(run_t, tiers, perm_inv, dense_j)
        print(f"  transposed (w,r)       : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- phase decomposition at the best tier count ----------
    tiers, perm_inv, total_padded, slots = build_transposed(rows, cols, data, M, max_tiers=32)

    @jax.jit
    def run_gather_only(ts, d):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            acc = carry
            for c2t, _ in ts:
                g = jnp.take(d + eps, c2t, axis=0)
                acc = acc + g.ravel()[0]
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_gather_only, tiers, dense_j)
    gb = slots * N * 4 * 2 / 1e9
    print(f"gather only (w,r)        : {t*1e3:8.3f} ms  ({gb/t:6.1f} GB/s r+w)")

    gs = [jnp.take(dense_j, c2t, axis=0) for c2t, _ in tiers]

    @jax.jit
    def run_reduce_only(gs, ts):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            acc = carry
            for g, (c2t, d2t) in zip(gs, ts):
                o = ((d2t[:, :, None] + eps) * g).sum(axis=0)
                acc = acc + o.ravel()[0]
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_reduce_only, gs, tiers)
    print(f"reduce only (w,r)        : {t*1e3:8.3f} ms  ({slots*N*4/1e9/t:6.1f} GB/s read)")


if __name__ == "__main__":
    main()
