"""Experiment v4: tune the per-tier row-ELL SpMM (D formulation).

  V1: mp=8, 2-D-indexed gather (gather emits (r,w,128) directly)
  V2: mp=4, 2-D-indexed gather (finer padding, more tiers)
  V3: mp=4, 2-D gather, adjacent width classes merged to <= 8 tiers
  V4: mp=8, flat gather + reshape (v2's D, re-run as the reference)
  plus phase decomposition of the winner.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, N, ITERS, timed, build_problem, build_row_ell_tiers
from rowell_exp3 import scan_wrap


def merge_tiers(tiers, max_tiers):
    """Merge adjacent (start,end,w) classes until <= max_tiers, choosing the
    merge that adds the fewest padded slots (narrower class pads up)."""
    tiers = [list(t) for t in tiers]
    while len(tiers) > max_tiers:
        best, cost = None, None
        for i in range(len(tiers) - 1):
            s0, e0, w0 = tiers[i]
            s1, e1, w1 = tiers[i + 1]
            c = (e1 - s1) * (w0 - w1)  # narrower rows pad up to w0
            if cost is None or c < cost:
                best, cost = i, c
        s0, e0, w0 = tiers[best]
        s1, e1, w1 = tiers[best + 1]
        tiers[best] = [s0, e1, w0]
        del tiers[best + 1]
    return [tuple(t) for t in tiers]


def materialize(tiers_bounds, perm, indptr, cols_s, data_s):
    out = []
    for start, end, w in tiers_bounds:
        r = end - start
        c2 = np.zeros((r, w), dtype=np.int32)
        d2 = np.zeros((r, w), dtype=np.float32)
        orig = perm[start:end]
        s = indptr[orig]
        cnt = indptr[orig + 1] - s
        # vectorized fill
        rr = np.repeat(np.arange(r), cnt)
        pos = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        src = np.repeat(s, cnt) + pos
        c2[rr, pos] = cols_s[src]
        d2[rr, pos] = data_s[src]
        out.append((start, r, w, c2, d2))
    return out


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)

    counts = np.bincount(rows, minlength=M)
    perm = np.argsort(-counts, kind="stable")
    perm_inv = np.empty(M, dtype=np.int64)
    perm_inv[perm] = np.arange(M)
    order = np.argsort(rows, kind="stable")
    cols_s = cols[order]
    data_s = data[order]
    indptr = np.concatenate([[0], np.cumsum(counts)])
    sorted_counts = counts[perm]
    nz_rows = int((sorted_counts > 0).sum())
    perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)

    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    def class_tiers(mp):
        cls = -(-sorted_counts[:nz_rows] // mp)
        b = np.flatnonzero(np.diff(cls)) + 1
        starts = np.concatenate([[0], b])
        ends = np.concatenate([b, [nz_rows]])
        return [(int(s), int(e), int(cls[s]) * mp) for s, e in zip(starts, ends)]

    def finish(outs):
        out_sorted = jnp.concatenate(outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0)
        return jnp.take(out_sorted, perm_inv_j, axis=0)

    def make_fn(tier_cd, flat_gather=False):
        def one(eps, tier_cd, dense):
            dp = dense + eps
            outs = []
            for c2, d2 in tier_cd:
                r, w = c2.shape
                if flat_gather:
                    g = jnp.take(dp, c2.reshape(-1), axis=0).reshape(r, w, N)
                else:
                    g = jnp.take(dp, c2, axis=0)  # (r, w, N) straight from gather
                outs.append((d2[:, :, None] * g).sum(axis=1))
            return finish(outs)

        return one

    def run_variant(name, bounds, flat_gather=False):
        tiers = materialize(bounds, perm, indptr, cols_s, data_s)
        slots = sum(r * w for (_, r, w, _, _) in tiers)
        tier_cd = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
        fn = make_fn(tier_cd, flat_gather)
        out = jax.jit(lambda tcd, d: fn(jnp.float32(0), tcd, d))(tier_cd, dense_j)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
        t = timed(scan_wrap(fn), tier_cd, dense_j)
        print(
            f"{name}: {t*1e3:7.3f} ms ({nnz/t/1e6:6.1f} M nnz/s)  "
            f"tiers={len(tiers)} pad x{slots/nnz:.3f} relerr {err:.1e}"
        )
        return t, tier_cd

    run_variant("V4 mp=8 flat+reshape ", class_tiers(8), flat_gather=True)
    t1, _ = run_variant("V1 mp=8 2-D gather   ", class_tiers(8))
    t2, best_cd = run_variant("V2 mp=4 2-D gather   ", class_tiers(4))
    run_variant("V3 mp=4 merged<=8    ", merge_tiers(class_tiers(4), 8))
    run_variant("V3b mp=4 merged<=5   ", merge_tiers(class_tiers(4), 5))

    # phase decomposition of V2
    def gather_only(eps, tier_cd, dense):
        dp = dense + eps
        acc = jnp.float32(0)
        for c2, _ in tier_cd:
            acc = acc + jnp.take(dp, c2, axis=0).ravel()[0]
        return acc.reshape(1)

    t = timed(scan_wrap(gather_only), best_cd, dense_j)
    print(f"V2 gather-only phase : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
