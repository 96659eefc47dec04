"""Experiment v3: does a gather fuse into an elementwise ADD-TREE root?

XLA TPU refused to fuse gather into reduce roots (v1/v2).  Loop fusions
with elementwise roots are a different fusion kind: if
``B[i1] + B[i2] + ... + B[ik]`` compiles to ONE kernel, the width-major
("transposed") row-ELL SpMM  out = sum_j d[:,j] * B[cols[:,j]]  never
materializes G: traffic collapses from 3.3 GB to 1.1 GB.

Probes:
  P0  one gather of 2^21 rows (baseline rate)
  P1  sum of 8 gathers, each 2^18 rows, same total rows as P0
      fused   => ~1.2 GB  => ~1.5 ms
      unfused => ~3.3 GB  => ~4 ms + launches
  P2  P1 with per-term scale (the real SpMM term shape)
  P3  width-major tier SpMM: per tier, out = sum_j d[:,j,None]*B[c[:,j]]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, N, ITERS, timed, build_problem, build_row_ell_tiers


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


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    rng = np.random.default_rng(1)

    # ---------- P0 ----------
    idx0 = jnp.asarray(rng.integers(0, K, size=1 << 21, dtype=np.int32))

    def p0(eps, idx, dense):
        return jnp.take(dense + eps, idx, axis=0)

    t = timed(scan_wrap(p0), idx0, dense_j)
    print(f"P0 one gather 2^21 rows      : {t*1e3:8.3f} ms  (r+w 2.15 GB -> {2.147/t:5.0f} GB/s)")

    # ---------- P1 ----------
    idxs = [jnp.asarray(rng.integers(0, K, size=1 << 18, dtype=np.int32)) for _ in range(8)]

    def p1(eps, idxs, dense):
        dp = dense + eps
        acc = jnp.take(dp, idxs[0], axis=0)
        for ix in idxs[1:]:
            acc = acc + jnp.take(dp, ix, axis=0)
        return acc

    t = timed(scan_wrap(p1), idxs, dense_j)
    print(f"P1 sum of 8 gathers 2^18     : {t*1e3:8.3f} ms  (fused ~1.5 ms, unfused ~4 ms)")

    # ---------- P2 with scales ----------
    scales = [jnp.asarray(rng.random(1 << 18, dtype=np.float32)) for _ in range(8)]

    def p2(eps, idxs, scales, dense):
        dp = dense + eps
        acc = scales[0][:, None] * jnp.take(dp, idxs[0], axis=0)
        for ix, s in zip(idxs[1:], scales[1:]):
            acc = acc + (s + eps)[:, None] * jnp.take(dp, ix, axis=0)
        return acc

    t = timed(scan_wrap(p2), idxs, scales, dense_j)
    print(f"P2 scaled sum of 8 gathers   : {t*1e3:8.3f} ms")

    # ---------- P3 width-major tier SpMM ----------
    perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M, min_pad=4)
    print(f"{len(tiers)} tiers, slots {total_slots} (pad x{total_slots/nnz:.3f})")
    # width-major arrays per tier: (w, r)
    tier_T = [
        (jnp.asarray(np.ascontiguousarray(c2.T)), jnp.asarray(np.ascontiguousarray(d2.T)))
        for (_, _, _, c2, d2) in tiers
    ]
    perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)

    def p3(eps, tier_T, dense, perm_inv):
        dp = dense + eps
        outs = []
        for cT, dT in tier_T:
            w = cT.shape[0]
            acc = dT[0][:, None] * jnp.take(dp, cT[0], axis=0)
            for j in range(1, w):
                acc = acc + (dT[j] + eps)[:, None] * jnp.take(dp, cT[j], axis=0)
            outs.append(acc)
        out_sorted = jnp.concatenate(outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0)
        return jnp.take(out_sorted, perm_inv, axis=0)

    out = jax.jit(lambda tT, d, p: p3(jnp.float32(0), tT, d, p))(tier_T, dense_j, perm_inv_j)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])
    err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))
    print(f"   P3 relerr {err:.2e}")

    t = timed(scan_wrap(p3), tier_T, dense_j, perm_inv_j)
    print(f"P3 width-major tier SpMM     : {t*1e3:8.3f} ms  ({nnz/t/1e6:7.1f} M nnz/s)")


if __name__ == "__main__":
    main()
