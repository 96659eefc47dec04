"""Probe 2: gather-order and reduce-form ceilings for transposed row-ELL.

Q1: how much of the gather's 649 GB/s (vs 721-750 ordered) can a legal
    row-reordering recover?  Probes: rows-sorted-by-first-col (legal),
    per-slab sorted indices (ILLEGAL alignment — pure ceiling), fully
    sorted flat indices (absolute ceiling).
Q2: is there a faster reduce-over-leading-axis form than
    (d[:,:,None]*g).sum(0)?  Probes: einsum, dot_general batch form.

Run on the real TPU:  python experiments/rowell_t2.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments.rowell_transposed import build_problem, build_transposed, timed, M, K, N, ITERS


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    tiers, perm_inv, total_padded, slots = build_transposed(rows, cols, data, M, max_tiers=32)
    gb_rw = slots * N * 4 * 2 / 1e9

    def gather_only_timer(ts):
        @jax.jit
        def run(ts, d):
            def body(carry, i):
                eps = i.astype(jnp.float32) * 1e-6
                acc = carry
                for c2t in ts:
                    g = jnp.take(d + eps, c2t, axis=0)
                    acc = acc + g.ravel()[0]
                return acc, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        return timed(run, ts, dense_j)

    # --- baseline gather (as built: rows ordered by degree) ---
    t = gather_only_timer([c for c, _ in tiers])
    print(f"gather as-built          : {t*1e3:8.3f} ms ({gb_rw/t:6.1f} GB/s)")

    # --- legal: rows within tier sorted by first (min) column ---
    tiers_s = []
    for c2t, d2t in tiers:
        key = np.asarray(c2t).min(axis=0)  # (r,) min col per row
        o = np.argsort(key, kind="stable")
        tiers_s.append((jnp.asarray(np.asarray(c2t)[:, o]), jnp.asarray(np.asarray(d2t)[:, o])))
    t = gather_only_timer([c for c, _ in tiers_s])
    print(f"gather rows-by-min-col   : {t*1e3:8.3f} ms ({gb_rw/t:6.1f} GB/s)")

    # --- ceiling: per-slab sorted (ILLEGAL — alignment broken) ---
    tiers_ps = [jnp.asarray(np.sort(np.asarray(c2t), axis=1)) for c2t, _ in tiers]
    t = gather_only_timer(tiers_ps)
    print(f"gather per-slab sorted   : {t*1e3:8.3f} ms ({gb_rw/t:6.1f} GB/s)  [ceiling]")

    # --- absolute ceiling: one flat fully-sorted gather, same cardinality ---
    all_sorted = np.sort(np.concatenate([np.asarray(c).ravel() for c, _ in tiers]))
    pad128 = -(-all_sorted.size // 128) * 128
    flat = np.zeros(pad128, dtype=np.int32)
    flat[: all_sorted.size] = all_sorted
    flat2 = jnp.asarray(flat.reshape(-1, 128))

    @jax.jit
    def run_flat(idx, d):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            g = jnp.take(d + eps, idx, axis=0)
            return carry + g.ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_flat, flat2, dense_j)
    gb = flat.size * N * 4 * 2 / 1e9
    print(f"gather flat fully sorted : {t*1e3:8.3f} ms ({gb/t:6.1f} GB/s)  [abs ceiling]")

    # ---------------- reduce forms ----------------
    gs = [jnp.take(dense_j, c2t, axis=0) for c2t, _ in tiers]
    gb_r = slots * N * 4 / 1e9

    def reduce_timer(fn):
        @jax.jit
        def run(gs, ts):
            def body(carry, i):
                eps = i.astype(jnp.float32) * 1e-6
                acc = carry
                for g, (c2t, d2t) in zip(gs, ts):
                    o = fn(d2t + eps, g)
                    acc = acc + o.ravel()[0]
                return acc, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        return timed(run, gs, tiers)

    t = reduce_timer(lambda d, g: (d[:, :, None] * g).sum(axis=0))
    print(f"reduce mul+sum(0)        : {t*1e3:8.3f} ms ({gb_r/t:6.1f} GB/s read)")

    t = reduce_timer(lambda d, g: jnp.einsum("jr,jrn->rn", d, g))
    print(f"reduce einsum jr,jrn->rn : {t*1e3:8.3f} ms ({gb_r/t:6.1f} GB/s read)")

    t = reduce_timer(
        lambda d, g: jax.lax.dot_general(
            d, g, (((0,), (0,)), ((1,), (1,))), precision=jax.lax.Precision.HIGHEST
        ).reshape(g.shape[1], N)
    )
    print(f"reduce dot_general batch : {t*1e3:8.3f} ms ({gb_r/t:6.1f} GB/s read)")

    # ---------------- full pipeline with rows-by-min-col ----------------
    from experiments.rowell_transposed import spmm_t

    # rebuild perm_inv for the sorted row order
    # positions: recompute offsets (r padded) per tier with the sort applied
    # (sort permutes columns of c2t/d2t i.e. relabeled rows within the tier)
    # perm_inv currently maps orig row -> global padded position; we compose
    # with the within-tier sort permutation.
    pi = np.asarray(perm_inv).copy()
    off = 0
    for (c2t, _), (c2s, _) in zip(tiers, tiers_s):
        rp = c2t.shape[1]
        key = np.asarray(c2t).min(axis=0)
        o = np.argsort(key, kind="stable")  # new position p holds old position o[p]
        inv_o = np.empty(rp, dtype=np.int64)
        inv_o[o] = np.arange(rp)
        sel = (pi >= off) & (pi < off + rp)
        pi[sel] = off + inv_o[pi[sel] - off]
        off += rp
    pi_j = jnp.asarray(pi, dtype=jnp.int32)

    f = jax.jit(lambda ts, p, d: spmm_t(ts, p, d, total_padded, M))
    out = f(tiers_s, pi_j, dense_j)
    err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
    print(f"full sorted-rows relerr: {err:.2e}")

    @jax.jit
    def run_full(ts, p, d):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            tp = [(c, dd + eps) for c, dd in ts]
            out = spmm_t(tp, p, d + eps, total_padded, M)
            return carry + out.ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_full, tiers_s, pi_j, dense_j)
    print(f"FULL rows-by-min-col     : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")


if __name__ == "__main__":
    main()
