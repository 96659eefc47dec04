"""Round-5 SDDMM floor statement (VERDICT r4 #8): decompose the shipped
9.9 ms chunked-scan flagship into measured phase bounds.

Shape: 65536^2 mask, 2.1M nnz, d=128 (bench-mask pattern).  The r4 doc
has a phase split for the MONOLITHIC 14 ms form; the shipped chunked
form needs its own: per-chunk gather issue, VMEM product+reduce, scan
overhead.  Also probes the only untried >10% lever candidates: chunk
re-sweep at the shipped shape, and a both-gathers-one-scan-level probe.

Run: timeout 5400 python experiments/sddmm_floor_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

M = K = 1 << 16
NNZ = 1 << 21
D = 128

_RTT = None


def bench(fn, args, iters=30, perturb_idx=0, label=""):
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
            aa = list(a)
            aa[perturb_idx] = aa[perturb_idx] + i.astype(jnp.float32) * 1e-6
            out = fn(*aa)
            w = (jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) % 977 + 1) * 1e-6
            return carry + (out * w).sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        samples.append(max(total - _RTT, total * 0.1) / iters)
    med = sorted(samples)[1]
    print(f"{label:44s} {med * 1e3:8.3f} ms", flush=True)
    return med


def main():
    from sparse_tpu.kernels.dot import sddmm

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = jnp.asarray((lin // K).astype(np.int32))
    cols = jnp.asarray((lin % K).astype(np.int32))
    sd = jnp.asarray(rng.random(lin.size, dtype=np.float32))
    nnz = lin.size
    lhs = jnp.asarray(rng.random((M, D), dtype=np.float32))
    rhs_t = jnp.asarray(rng.random((K, D), dtype=np.float32))
    print(f"nnz={nnz}")

    # shipped
    bench(lambda l: sddmm(rows, cols, sd, l, rhs_t.T), (lhs,), label="A shipped chunked sddmm (16k)")

    def chunked(chunk, mode):
        pad = (-nnz) % chunk
        rows_p = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)]).reshape(-1, chunk)
        cols_p = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)]).reshape(-1, chunk)
        sd_p = jnp.concatenate([sd, jnp.zeros(pad, sd.dtype)]).reshape(-1, chunk)

        def f(l):
            def body(_, x):
                r_, c_, s_ = x
                if mode == "full":
                    lg = jnp.take(l, r_, axis=0)
                    rg = jnp.take(rhs_t, c_, axis=0)
                    return None, s_ * jnp.sum(lg * rg, axis=-1)
                if mode == "lhs_only":
                    lg = jnp.take(l, r_, axis=0)
                    return None, s_ * jnp.sum(lg, axis=-1)
                if mode == "both_nored":  # gathers + product, cheap reduce of lhs only
                    lg = jnp.take(l, r_, axis=0)
                    rg = jnp.take(rhs_t, c_, axis=0)
                    return None, s_ * (lg[:, 0] * rg[:, 0] + lg[:, -1] * rg[:, -1])
                if mode == "scan_overhead":
                    return None, s_ * 2.0

            _, out = jax.lax.scan(body, None, (rows_p, cols_p, sd_p))
            return out.reshape(-1)[:nnz]

        return f

    for chunk in (8192, 16384, 32768, 65536):
        bench(chunked(chunk, "full"), (lhs,), label=f"B chunk sweep: {chunk}")
    bench(chunked(16384, "lhs_only"), (lhs,), label="C lhs-gather-only (chunked)")
    bench(chunked(16384, "both_nored"), (lhs,), label="C both gathers, no lane reduce")
    bench(chunked(16384, "scan_overhead"), (lhs,), label="C scan overhead (no gathers)")


if __name__ == "__main__":
    main()
