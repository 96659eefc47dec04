"""Experiment v5: last micro-squeezes for row-ELL SpMM and SpMV.

SpMM (best so far 5.19 ms, mp=8 2-D gather):
  S1: rows sorted by first column within each tier (gather locality:
      random index order measured 557 GB/s vs 749 for run-ordered)
  S2: tiers merged to 5 (fewer launches, more padding)
SpMV (fused 6.95 vs 3.30+1.93 phase sum):
  M1: 2-D chunk gather, fully fused per tier (baseline for the sweep)
  M2: phase-ordered: all tier gathers first, then all selects
  M3: M2 + data folded into the lane mask (one fewer (r,w) pass)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, N, ITERS, timed, build_problem, build_row_ell_tiers
from rowell_exp3 import scan_wrap


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    x = np.ascontiguousarray(dense[:, 0])
    x_j = jnp.asarray(x)

    perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M, min_pad=8)
    print(f"{len(tiers)} tiers, slots {total_slots} (pad x{total_slots/nnz:.3f})")

    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])
    refv = np.zeros(M, dtype=np.float64)
    np.add.at(refv, rows, data.astype(np.float64) * x.astype(np.float64)[cols])

    # --- S1: sort rows within tiers by first column ---
    perm_inv_s = np.array(perm_inv)
    tiers_sorted = []
    offset_rows = 0
    # recover relabel order: tier rows are relabeled positions start..start+r
    for (start, r, w, c2, d2) in tiers:
        first = np.where((d2 != 0).any(axis=1), c2[:, 0], np.iinfo(np.int32).max)
        o = np.argsort(first, kind="stable")
        tiers_sorted.append((start, r, w, c2[o], d2[o]))
        # remap perm_inv: relabeled slot (start+i) now holds old row at o[i]
        # perm_inv maps orig -> relabeled; build new positions
        new_pos = np.empty(r, dtype=np.int64)
        new_pos[o] = np.arange(r)
        sel = (perm_inv_s >= start) & (perm_inv_s < start + r)
        perm_inv_s[sel] = start + new_pos[perm_inv_s[sel] - start]
        offset_rows += r

    def finish(outs, pinv):
        out_sorted = jnp.concatenate(outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0)
        return jnp.take(out_sorted, pinv, axis=0)

    def make_spmm(tier_list, pinv_np):
        pinv = jnp.asarray(pinv_np, dtype=jnp.int32)
        tcd = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tier_list]

        def fn(eps, tcd, dense):
            dp = dense + eps
            outs = [
                ((d2 + eps)[:, :, None] * jnp.take(dp, c2, axis=0)).sum(axis=1) for c2, d2 in tcd
            ]
            return finish(outs, pinv)

        return fn, tcd

    for name, tl, pv in [("S0 unsorted     ", tiers, perm_inv), ("S1 col-sorted   ", tiers_sorted, perm_inv_s)]:
        fn, tcd = make_spmm(tl, pv)
        out = jax.jit(lambda tcd, d: fn(jnp.float32(0), tcd, d))(tcd, dense_j)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
        t = timed(scan_wrap(fn), tcd, dense_j)
        print(f"{name}: {t*1e3:7.3f} ms ({nnz/t/1e6:6.1f} M nnz/s) relerr {err:.1e}")

    # --- SpMV variants (unsorted tiers) ---
    pinv = jnp.asarray(perm_inv, dtype=jnp.int32)
    tcd = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
    lanes = jnp.arange(128, dtype=jnp.int32)

    def finv(outs):
        out_sorted = jnp.concatenate(outs + [jnp.zeros(M - nz_rows, dtype=jnp.float32)])
        return jnp.take(out_sorted, pinv)

    def m1(eps, tcd, x):
        xp = (x + eps).reshape(-1, 128)
        outs = []
        for c2, d2 in tcd:
            g = jnp.take(xp, c2 // 128, axis=0)  # (r,w,128) 2-D indexed
            sel = jnp.where((c2 % 128)[:, :, None] == lanes, g, 0.0).sum(axis=2)
            outs.append(((d2 + eps) * sel).sum(axis=1))
        return finv(outs)

    def m2(eps, tcd, x):
        xp = (x + eps).reshape(-1, 128)
        gs = [jnp.take(xp, c2 // 128, axis=0) for c2, _ in tcd]
        outs = []
        for g, (c2, d2) in zip(gs, tcd):
            sel = jnp.where((c2 % 128)[:, :, None] == lanes, g, 0.0).sum(axis=2)
            outs.append(((d2 + eps) * sel).sum(axis=1))
        return finv(outs)

    def m3(eps, tcd, x):
        xp = (x + eps).reshape(-1, 128)
        gs = [jnp.take(xp, c2 // 128, axis=0) for c2, _ in tcd]
        outs = []
        for g, (c2, d2) in zip(gs, tcd):
            contrib = jnp.where(
                (c2 % 128)[:, :, None] == lanes, (d2 + eps)[:, :, None], 0.0
            ) * g
            outs.append(contrib.sum(axis=(1, 2)))
        return finv(outs)

    for name, fn in [("M1 fused 2-D    ", m1), ("M2 phase-ordered", m2), ("M3 folded mask  ", m3)]:
        out = jax.jit(lambda tcd, xx, f=fn: f(jnp.float32(0), tcd, xx))(tcd, x_j)
        err = np.max(np.abs(np.asarray(out) - refv) / (np.abs(refv) + 1e-6))
        t = timed(scan_wrap(fn), tcd, x_j)
        print(f"{name}: {t*1e3:7.3f} ms ({nnz/t/1e6:6.1f} M nnz/s) relerr {err:.1e}")


if __name__ == "__main__":
    main()
