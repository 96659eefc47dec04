"""Probe 4: refine the G=16 group-interleaved row-ELL operating point.

Sweeps group size {16, 24} x sort_rows x max_tiers around the t3 winner
(G=16, mt=32, sort=1: 4.737 ms), with a gather/reduce phase split at the
best point.

Run on the real TPU:  python experiments/rowell_t4.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments.rowell_transposed import build_problem, timed, M, K, N, ITERS
from experiments.rowell_t3 import build_grouped, spmm_g


def main():
    print("devices:", jax.devices())
    rows, cols, data, dense = build_problem()
    nnz = rows.size
    dense_j = jnp.asarray(dense)
    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * dense.astype(np.float64)[cols])

    best = None
    for group, sort_rows, mt in [
        (16, False, 32),
        (16, True, 16),
        (16, True, 48),
        (24, True, 32),
    ]:
        tiers, perm_inv, total_padded, slots = build_grouped(
            rows, cols, data, M, max_tiers=mt, group=group, sort_rows=sort_rows
        )
        tag = f"G={group:2d} sort={int(sort_rows)} mt={mt}"

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
            f"[{tag}] FULL : {t*1e3:8.3f} ms ({nnz/t/1e6:7.1f} M nnz/s) "
            f"pad x{slots/nnz:.4f} relerr {err:.1e}"
        )
        if best is None or t < best[0]:
            best = (t, tag)
    print("best:", best[1], f"{best[0]*1e3:.3f} ms")


if __name__ == "__main__":
    main()
