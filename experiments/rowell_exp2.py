"""Experiment v2: can the gather's HBM round-trip be shrunk?

v1 found: reduce phase (mul+sum over width) is bandwidth-bound at 794 GB/s
(1.6 ms) — strictly better than the one-hot einsum (2.8 ms) and exact f32.
But gather (3.4 ms) + reduce (1.6) don't fuse; the naive combined jit was
7.5 ms (13 tier gathers each recomputing dense+eps).

Variants here:
  A. one FLAT gather for all tiers + per-tier slice/mul/sum (1 gather kernel)
  B. chunked partial reduce: (d*B[cols]).reshape(r,w/c,c,N).sum(2) per tier
     — if XLA fuses gather+mul+minor-axis-sum into one kernel, the gather
     output shrinks c-fold and total time collapses.
  C. B but flat: single gather + per-tier partial sums.
  D. full-width fused reduce per tier with dense_p hoisted (fix v1's eps
     recompute) — did the 13 gathers/eps cause the 7.5?
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, N, ITERS, timed, build_problem, build_row_ell_tiers


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)

    perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M, min_pad=8)
    print(f"{len(tiers)} tiers, slots {total_slots} (pad x{total_slots/nnz:.3f})")

    tier_args = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
    perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)

    # flat layout: concat all tier slots
    cols_flat = jnp.concatenate([c2.reshape(-1) for c2, _ in tier_args])
    data_flat = jnp.concatenate([d2.reshape(-1) for _, d2 in tier_args])
    offs = np.cumsum([0] + [int(c2.size) for c2, _ in tier_args])
    shapes = [(int(c2.shape[0]), int(c2.shape[1])) for c2, _ in tier_args]

    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    def finish(outs):
        out_sorted = jnp.concatenate(outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0)
        return jnp.take(out_sorted, perm_inv_j, axis=0)

    def check(fn, *args):
        out = jax.jit(fn)(*args)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
        print(f"   relerr {err:.2e}")

    def scan_wrap(one_iter):
        @jax.jit
        def run(*args):
            def body(carry, i):
                eps = i.astype(jnp.float32) * 1e-6
                out = one_iter(eps, *args)
                return carry + out.ravel()[0], None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        return run

    # ---------- A: flat gather + per-tier reduce ----------
    def spmm_A(eps, cols_flat, data_flat, dense):
        dp = dense + eps
        g = jnp.take(dp, cols_flat, axis=0)
        outs = []
        for (r, w), o0, o1 in zip(shapes, offs[:-1], offs[1:]):
            gw = g[o0:o1].reshape(r, w, N)
            dw = (data_flat[o0:o1] + eps).reshape(r, w)
            outs.append((dw[:, :, None] * gw).sum(axis=1))
        return finish(outs)

    check(lambda cf, df, d: spmm_A(jnp.float32(0), cf, df, d), cols_flat, data_flat, dense_j)
    t = timed(scan_wrap(spmm_A), cols_flat, data_flat, dense_j)
    print(f"A flat-gather + tier reduce : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- B: per-tier chunked partial reduce (c=8) ----------
    CH = 8

    def spmm_B(eps, tier_cd, dense):
        dp = dense + eps
        outs = []
        for c2, d2 in tier_cd:
            r, w = c2.shape
            g = jnp.take(dp, c2.reshape(-1), axis=0).reshape(r, w // CH, CH, N)
            dw = (d2 + eps).reshape(r, w // CH, CH)
            part = (dw[:, :, :, None] * g).sum(axis=2)  # (r, w/CH, N)
            outs.append(part.sum(axis=1))
        return finish(outs)

    check(lambda tcd, d: spmm_B(jnp.float32(0), tcd, d), tier_args, dense_j)
    t = timed(scan_wrap(spmm_B), tier_args, dense_j)
    print(f"B chunked partial (c={CH})    : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- C: flat gather + fused chunk sum, one op ----------
    # pad flat slots to multiple of CH*N rows? slots are already multiples
    # of CH per tier (min_pad=8); do the partial sum on the flat array
    def spmm_C(eps, cols_flat, data_flat, dense):
        dp = dense + eps
        g = jnp.take(dp, cols_flat, axis=0).reshape(-1, CH, N)
        dw = (data_flat + eps).reshape(-1, CH)
        part = (dw[:, :, None] * g).sum(axis=1)  # (slots/CH, N)
        outs = []
        for (r, w), o0 in zip(shapes, offs[:-1]):
            pw = part[o0 // CH : o0 // CH + r * (w // CH)].reshape(r, w // CH, N)
            outs.append(pw.sum(axis=1))
        return finish(outs)

    check(lambda cf, df, d: spmm_C(jnp.float32(0), cf, df, d), cols_flat, data_flat, dense_j)
    t = timed(scan_wrap(spmm_C), cols_flat, data_flat, dense_j)
    print(f"C flat chunked partial      : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- D: v1 full fused but dense_p hoisted ----------
    def spmm_D(eps, tier_cd, dense):
        dp = dense + eps
        outs = []
        for c2, d2 in tier_cd:
            r, w = c2.shape
            g = jnp.take(dp, c2.reshape(-1), axis=0).reshape(r, w, N)
            outs.append(((d2 + eps)[:, :, None] * g).sum(axis=1))
        return finish(outs)

    t = timed(scan_wrap(spmm_D), tier_args, dense_j)
    print(f"D per-tier full fused       : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")


if __name__ == "__main__":
    main()
