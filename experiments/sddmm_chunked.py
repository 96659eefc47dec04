"""Round-4 SDDMM batch 2: chunked-scan formulation.

Batch 1 measured: full 14.0 ms = lhs gather 4.3 + rhs gather 4.3 +
fused product-reduce 2.9 (+ ~2.5 ms of materialized-prod slack); gather
order irrelevant (sorted rows == random cols probe); bf16 and tile-order
negative.  The gathered (nnz, 128) blocks each round-trip HBM.

Here: lax.scan over entry chunks — per iteration gather (chunk, 128)
from each table (VMEM-resident intermediate), fused multiply+reduce,
write only the (chunk,) products.  HBM traffic drops to the random table
reads + the (nnz,) output; the (nnz, 128) streams never materialize.

Sweep chunk in {2048, 4096, 8192, 16384}.

Run: timeout 3600 python experiments/sddmm_chunked.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp

M = K = 1 << 16
NNZ = 1 << 21
D = 128

_RTT = None


def bench(fn, args, iters=30, perturb_idx=0):
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)

    @jax.jit
    def run(*a):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            aa = list(a)
            aa[perturb_idx] = (aa[perturb_idx] + eps.astype(aa[perturb_idx].dtype)).astype(
                a[perturb_idx].dtype
            )
            out = fn(*aa)
            return carry + out.sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        samples.append(max(total - _RTT, total * 0.1) / iters)
    return sorted(samples)[1]


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

    for chunk in (2048, 4096, 8192, 16384):
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
