"""Round-5: general sparse-attention end-to-end flagship (VERDICT r4 #2).

2.1M attention edges (L=16384, ~128 keys/query, irregular degrees),
d=64.  r1 measured the COO pipeline at 192 ms (4.2M edges); the r4 parts
(chunked SDDMM, scan softmax, program SpMM) were never collected
end-to-end.  r5 routes host-known patterns through the padded row-ELL
layout (gathers + MXU einsums + dense masked softmax — no per-edge
segment machinery at all).

Measures:
  A. sparse_attention with a numpy pattern (ELL route)
  B. sparse_attention with device arrays (COO pipeline:
     sddmm -> scan softmax -> segment_sum SpMM)
  C. COO pipeline phase split (sddmm / softmax / spmm)
Oracle: blocked dense softmax attention on device (f32).

Run: timeout 3600 python experiments/attention_e2e_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

L = 1 << 14
DEG_MEAN = 128
D = 64

_RTT = None


def bench(fn, args, iters=20, perturb_idx=0):
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
            aa[perturb_idx] = aa[perturb_idx] + eps
            out = fn(*aa)
            w = (jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) + 1) * (1.0 / out.size)
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
    return sorted(samples)[1]


def main():
    from sparse_tpu import nn as stnn
    from sparse_tpu.kernels import sddmm
    from sparse_tpu.kernels.dot import coo_spmm

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    # irregular degrees around 128 (windowed pattern with jitter)
    degs = np.clip(rng.poisson(DEG_MEAN, size=L), 1, 192)
    rows = np.repeat(np.arange(L, dtype=np.int32), degs)
    cols = rng.integers(0, L, size=rows.size).astype(np.int32)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    # dedupe (canonical pattern)
    keys = rows.astype(np.int64) * L + cols
    uniq = np.concatenate([[True], np.diff(keys) > 0])
    rows, cols = rows[uniq], cols[uniq]
    nnz = rows.size
    print(f"edges={nnz} cap={np.bincount(rows, minlength=L).max()}")

    q = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)

    # oracle (host, f64, blocked)
    qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
    mask = np.zeros((L, L), bool)
    mask[rows, cols] = True
    oracle = np.empty((L, D))
    B = 2048
    for i0 in range(0, L, B):
        s = (qn[i0 : i0 + B] @ kn.T) / np.sqrt(D)
        s[~mask[i0 : i0 + B]] = -np.inf
        m = s.max(axis=1, keepdims=True)
        e = np.exp(s - np.where(np.isfinite(m), m, 0))
        e[~mask[i0 : i0 + B]] = 0
        den = e.sum(axis=1, keepdims=True)
        oracle[i0 : i0 + B] = (e / np.where(den == 0, 1, den)) @ vn

    def ell_route(q_):
        return stnn.sparse_attention(q_, k, v, rows, cols)

    def coo_route(q_):
        return stnn.sparse_attention(q_, k, v, rows_j, cols_j)

    for tag, fn in [("A ELL route", ell_route), ("B COO pipeline", coo_route)]:
        out = np.asarray(fn(q))
        err = np.abs(out - oracle).max()
        t = bench(fn, (q,))
        print(f"{tag:24s} {t * 1e3:8.2f} ms   maxerr {err:.2e}")

    # C: COO pipeline phases
    ones = jnp.ones((nnz,), jnp.float32)
    scale = jnp.float32(1 / np.sqrt(D))

    def phase_sddmm(q_):
        return sddmm(rows_j, cols_j, ones, q_, k.T) * scale

    scores = phase_sddmm(q)

    def phase_softmax(s_):
        return stnn.segment_softmax(s_, rows_j, n_rows=L)

    attn = phase_softmax(scores)

    def phase_spmm(a_):
        return coo_spmm(rows_j, cols_j, a_, v, n_rows=L)

    for tag, fn, arg in [
        ("C sddmm", phase_sddmm, q),
        ("C scan softmax", phase_softmax, scores),
        ("C spmm (segment_sum)", phase_spmm, attn),
    ]:
        t = bench(fn, (arg,))
        print(f"{tag:24s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
