"""Experiment: row-ELL SpMV formulations (VERDICT item 3).

Current: block-ELL lane-gather ell_spmv = 9.6 ms (219M nnz/s) at the bench
shape (65536^2, 2.1M nnz). x is 256 KB — tiny table.

Variants:
  1. baseline ell_spmv re-measured
  2. row-ELL tier: lane-gather x2[c>>7] -> (r,w,128), fused one-hot lane
     select + sum over lanes + data mul + sum over width (all one jit expr)
     — if XLA fuses the gather with the lane-select reduce, the gather
     kernel's output is (r,w) = 8.8 MB instead of 1.07 GB.
  3. phase decomposition of 2: gather-only / select+reduce-only
  4. row-ELL scalar gather fused: g = x[c2]; (d*g).sum(1)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, ITERS, timed, build_problem, build_row_ell_tiers


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    x = np.ascontiguousarray(dense[:, 0])  # (K,) f32
    x_j = jnp.asarray(x)

    import os
    import sys

    sys.path.insert(0, "/root/repo")

    ref = np.zeros(M, dtype=np.float64)
    np.add.at(ref, rows, data.astype(np.float64) * x.astype(np.float64)[cols])

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

    def check(fn, *args):
        out = jax.jit(fn)(*args)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
        print(f"   relerr {err:.2e}")

    # ---------- 1. baseline (known 9.6 ms; compile hangs the run — opt-in) ----------
    if os.environ.get("SPMV_BASELINE"):
        from sparse_tpu.kernels import build_block_ell
        from sparse_tpu.kernels.ell import ell_spmv

        ell = build_block_ell(rows, cols, data, M, K)

        def spmv_base(eps, er, ec, ed, x):
            return ell_spmv(er, ec, ed + eps, x + eps, n_rows=M)

        t = timed(scan_wrap(spmv_base), ell.e_rows, ell.e_cols, ell.e_data, x_j)
        print(f"1 block-ELL lane ell_spmv  : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- row-ELL tiers ----------
    perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M, min_pad=8)
    print(f"{len(tiers)} tiers, slots {total_slots} (pad x{total_slots/nnz:.3f})")
    tier_args = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
    perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)

    def finish(outs):
        out_sorted = jnp.concatenate(outs + [jnp.zeros(M - nz_rows, dtype=jnp.float32)])
        return jnp.take(out_sorted, perm_inv_j)

    lanes = jnp.arange(128, dtype=jnp.int32)

    # ---------- 2. lane-gather + fused select ----------
    def spmv_lane(eps, tier_cd, x):
        xp = (x + eps).reshape(-1, 128)
        outs = []
        for c2, d2 in tier_cd:
            r, w = c2.shape
            g = jnp.take(xp, (c2 // 128).reshape(-1), axis=0).reshape(r, w, 128)
            sel = jnp.where((c2 % 128)[:, :, None] == lanes[None, None, :], g, 0.0).sum(axis=2)
            outs.append(((d2 + eps) * sel).sum(axis=1))
        return finish(outs)

    check(lambda tcd, xx: spmv_lane(jnp.float32(0), tcd, xx), tier_args, x_j)
    t = timed(scan_wrap(spmv_lane), tier_args, x_j)
    print(f"2 row-ELL lane fused       : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")

    # ---------- 3a. gather only ----------
    def gather_only(eps, tier_cd, x):
        xp = (x + eps).reshape(-1, 128)
        acc = jnp.float32(0)
        for c2, _ in tier_cd:
            g = jnp.take(xp, (c2 // 128).reshape(-1), axis=0)
            acc = acc + g.ravel()[0]
        return acc.reshape(1)

    t = timed(scan_wrap(gather_only), tier_args, x_j)
    print(f"3a lane gather only        : {t*1e3:8.3f} ms")

    # ---------- 3b. select+reduce only ----------
    gs = [
        jnp.take(x_j.reshape(-1, 128), (c2 // 128).reshape(-1), axis=0).reshape(c2.shape[0], c2.shape[1], 128)
        for c2, _ in tier_args
    ]

    def sel_only(eps, gs, tier_cd):
        acc = jnp.float32(0)
        for g, (c2, d2) in zip(gs, tier_cd):
            sel = jnp.where((c2 % 128)[:, :, None] == lanes[None, None, :], g + eps, 0.0).sum(axis=2)
            acc = acc + ((d2 + eps) * sel).sum(axis=1).ravel()[0]
        return acc.reshape(1)

    t = timed(scan_wrap(sel_only), gs, tier_args)
    print(f"3b select+reduce only      : {t*1e3:8.3f} ms")

    # ---------- 4. scalar gather fused ----------
    def spmv_scalar(eps, tier_cd, x):
        xp = x + eps
        outs = []
        for c2, d2 in tier_cd:
            g = jnp.take(xp, c2.reshape(-1)).reshape(c2.shape)
            outs.append(((d2 + eps) * g).sum(axis=1))
        return finish(outs)

    check(lambda tcd, xx: spmv_scalar(jnp.float32(0), tcd, xx), tier_args, x_j)
    t = timed(scan_wrap(spmv_scalar), tier_args, x_j)
    print(f"4 row-ELL scalar fused     : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")


if __name__ == "__main__":
    main()
