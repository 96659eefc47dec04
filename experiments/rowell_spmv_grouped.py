"""Measure grouped vs legacy row-ELL SpMV on the bench shape (TPU).

The grouped layout cuts the gather issue count by the padding factor
(x1.109 -> x1.004); the lane-gather SpMV is issue-rate-bound so the win
should be proportional.

Run on the real TPU:  python experiments/rowell_spmv_grouped.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments.rowell_transposed import build_problem, timed, M, K, ITERS

from sparse_tpu.kernels import build_row_ell, row_ell_spmv


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    x = jnp.asarray(dense[:, 0].copy())
    ref = np.zeros(M)
    np.add.at(ref, rows, data * np.asarray(x)[cols])

    for group in (16, 0):
        re = build_row_ell(rows, cols, data, M, K, group=group)
        out = row_ell_spmv(re, x, lane_gather=True)
        err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6))

        @jax.jit
        def run(tiers, perm_inv, xx):
            def body(carry, i):
                eps = i.astype(jnp.float32) * 1e-6
                tp = tuple((c, d + eps) for c, d in tiers)
                rep = re._replace(tiers=tp, perm_inv=perm_inv)
                out = row_ell_spmv(rep, xx + eps, lane_gather=True)
                return carry + out[0], None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        t = timed(run, re.tiers, re.perm_inv, x)
        print(
            f"SpMV group={group:2d}: {t*1e3:8.3f} ms ({nnz/t/1e6:7.1f} M nnz/s) relerr {err:.1e}"
        )


if __name__ == "__main__":
    main()
