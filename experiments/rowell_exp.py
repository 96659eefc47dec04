"""Experiment: degree-sorted per-row ELL SpMM vs block-ELL one-hot MXU.

Hypothesis: the one-hot scatter costs ~256 VPU ops/nnz plus a full HBM
round-trip of the gathered array G.  If rows are relabeled by descending
nnz count, consecutive rows have near-uniform width, so a per-row ELL
layout (rows x width x N) pads only ~5-15%.  The scatter then becomes a
plain uniform segmented reduction  (B[cols] * data).sum(axis=1)  — no
one-hot, no MXU, exact f32 accumulation — which XLA may fuse with the
gather (G never round-trips HBM) or at worst streams at full bandwidth.

Run on the real TPU:  python experiments/rowell_exp.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

M = K = 1 << 16
NNZ = 1 << 21
N = 128
ITERS = 50


def timed(fn, *args, n_iters=ITERS):
    """Scan-loop timing with table perturbation + RTT subtraction."""

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


def build_row_ell_tiers(rows, cols, data, n_rows, min_pad=4):
    """Degree-sorted tiered row-ELL.

    Returns (perm_inv, tiers) where tiers is a list of
    (row_start, n_tier_rows, width, cols2d, data2d): rows are relabeled by
    descending nnz; rows of similar width share a tier padded to the tier
    max width (quantized so padding overhead stays small).
    """
    nnz = rows.shape[0]
    counts = np.bincount(rows, minlength=n_rows)
    perm = np.argsort(-counts, kind="stable")  # relabeled -> original
    perm_inv = np.empty(n_rows, dtype=np.int64)
    perm_inv[perm] = np.arange(n_rows)

    # CSR-ify in original order
    order = np.argsort(rows, kind="stable")
    cols_s = cols[order]
    data_s = data[order]
    indptr = np.concatenate([[0], np.cumsum(counts)])

    sorted_counts = counts[perm]
    nz_rows = int((sorted_counts > 0).sum())

    # tier = all rows with the same quantized width class ceil(count/min_pad):
    # rows are sorted by count, so classes are contiguous runs
    cls = -(-sorted_counts[:nz_rows] // min_pad)  # ceil division
    boundaries = np.flatnonzero(np.diff(cls)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [nz_rows]])
    tiers = [(int(s), int(e), int(cls[s]) * min_pad) for s, e in zip(starts, ends)]

    out = []
    total_slots = 0
    for start, end, w in tiers:
        r = end - start
        c2 = np.zeros((r, w), dtype=np.int32)
        d2 = np.zeros((r, w), dtype=np.float32)
        for i in range(r):
            orig = perm[start + i]
            s, e = indptr[orig], indptr[orig + 1]
            c2[i, : e - s] = cols_s[s:e]
            d2[i, : e - s] = data_s[s:e]
        out.append((start, r, w, c2, d2))
        total_slots += r * w
    return perm_inv, out, total_slots, nz_rows


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)

    # ---------- baseline: block-ELL one-hot ----------
    import sys

    sys.path.insert(0, "/root/repo")
    from sparse_tpu.kernels import build_block_ell, ell_spmm

    ell = build_block_ell(rows, cols, data, M, K)

    @jax.jit
    def run_block(e_rows, e_cols, e_data, dense):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            out = ell_spmm(e_rows, e_cols, e_data + eps, dense + eps, n_rows=M)
            return carry + out.ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_block, ell.e_rows, ell.e_cols, ell.e_data, dense_j)
    print(f"block-ELL one-hot     : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- row-ELL tiers ----------
    t0 = time.perf_counter()
    perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M)
    print(
        f"row-ELL build: {time.perf_counter()-t0:.2f}s, {len(tiers)} tiers, "
        f"slots {total_slots} (pad x{total_slots/nnz:.3f}), nz_rows {nz_rows}"
    )
    for s, r, w, _, _ in tiers[:6]:
        print(f"  tier @{s}: {r} rows x w={w}")

    tier_args = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
    perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)

    def rowell_spmm(tier_cd, dense, perm_inv):
        outs = []
        for c2, d2 in tier_cd:
            g = jnp.take(dense, c2.reshape(-1), axis=0).reshape(c2.shape[0], c2.shape[1], N)
            outs.append((d2[:, :, None] * g).sum(axis=1))
        out_sorted = jnp.concatenate(
            outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0
        )
        return jnp.take(out_sorted, perm_inv, axis=0)

    # correctness
    out = jax.jit(rowell_spmm, static_argnums=())(tier_args, dense_j, perm_inv_j)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])
    err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
    print(f"row-ELL max relerr: {err:.2e}")

    @jax.jit
    def run_rowell(tier_cd, dense, perm_inv):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            tcd = [(c2, d2 + eps) for c2, d2 in tier_cd]
            out = rowell_spmm(tcd, dense + eps, perm_inv)
            return carry + out.ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_rowell, tier_args, dense_j, perm_inv_j)
    print(f"row-ELL tiered fused  : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- phase decomposition: gather only ----------
    @jax.jit
    def run_gather_only(tier_cd, dense):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            acc = carry
            for c2, _ in tier_cd:
                g = jnp.take(dense + eps, c2.reshape(-1), axis=0)
                acc = acc + g.ravel()[0]
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_gather_only, tier_args, dense_j)
    print(f"row-ELL gather only   : {t*1e3:8.3f} ms")

    # ---------- reduce only (pre-gathered G) ----------
    gs = [
        jnp.take(dense_j, c2.reshape(-1), axis=0).reshape(c2.shape[0], c2.shape[1], N)
        for c2, _ in tier_args
    ]

    @jax.jit
    def run_reduce_only(gs, tier_cd):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            acc = carry
            for g, (c2, d2) in zip(gs, tier_cd):
                o = ((d2[:, :, None] + eps) * g).sum(axis=1)
                acc = acc + o.ravel()[0]
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    t = timed(run_reduce_only, gs, tier_args)
    print(f"row-ELL reduce only   : {t*1e3:8.3f} ms  (G pre-gathered; is the mul+sum bandwidth-bound?)")


if __name__ == "__main__":
    main()
