"""Round-4 SDDMM batch 3: extend the chunk sweep upward (16384 was still
improving: 25.99/10.67/10.12/9.92 for 2k/4k/8k/16k vs 14.0 monolithic).

Run: timeout 3600 python experiments/sddmm_chunked2.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp

from experiments.sddmm_chunked import bench  # same harness

M = K = 1 << 16
NNZ = 1 << 21
D = 128


def main():
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    sd = rng.random(lin.size, dtype=np.float32)
    nnz = lin.size
    lhs = jnp.asarray(rng.random((M, D), dtype=np.float32))
    rhs_t = jnp.asarray(rng.random((K, D), dtype=np.float32))

    lg64 = np.asarray(lhs, np.float64)[rows]
    rg64 = np.asarray(rhs_t, np.float64)[cols]
    ref = sd.astype(np.float64) * np.sum(lg64 * rg64, axis=1)

    for chunk in (32768, 65536, 131072, 262144):
        pad = (-nnz) % chunk
        n_chunks = (nnz + pad) // chunk
        rows_p = jnp.asarray(np.concatenate([rows, np.zeros(pad, np.int32)]).reshape(n_chunks, chunk))
        cols_p = jnp.asarray(np.concatenate([cols, np.zeros(pad, np.int32)]).reshape(n_chunks, chunk))
        sd_p = jnp.asarray(np.concatenate([sd, np.zeros(pad, np.float32)]).reshape(n_chunks, chunk))

        def f(lhs_, rhs_t_):
            def body(_, x):
                r_, c_, s_ = x
                lg = jnp.take(lhs_, r_, axis=0)
                rg = jnp.take(rhs_t_, c_, axis=0)
                return None, s_ * jnp.einsum(
                    "ek,ek->e", lg, rg,
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )

            _, out = jax.lax.scan(body, None, (rows_p, cols_p, sd_p))
            return out.reshape(-1)[:nnz]

        jf = jax.jit(f)
        got = np.asarray(jf(lhs, rhs_t), np.float64)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        dt = bench(jf, (lhs, rhs_t))
        print(f"chunk={chunk}: {dt*1e3:.3f} ms = {nnz/dt/1e6:.0f} M nnz/s relerr={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
