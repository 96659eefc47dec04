"""Round-5: traced-pattern COO SpMM strategies at attention scale.

The COO attention pipeline's last stage (attn @ v, 2.1M sorted edges,
d=64) measured 22.3 ms via jax.ops.segment_sum (XLA scatter — serial on
TPU).  Candidates for the fully-traced path (no host layout available):

  A segment_sum (shipped)
  B cumsum-difference (_sorted_segment_sum_cumsum)
  C backward segmented scan over (nnz, d) + head compaction via the
    softmax trick is not applicable (needs per-row emission) — instead:
    segmented suffix-sum + gather heads at row starts (row starts =
    searchsorted — only n_rows probes, cheap at 16k)

Run: timeout 4800 python experiments/coo_spmm_strategies_r5.py
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


def bench(fn, args, iters=20, label=""):
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
            aa[0] = aa[0] + i.astype(jnp.float32) * 1e-6
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
    print(f"{label:44s} {med * 1e3:8.2f} ms", flush=True)
    return med


def main():
    from sparse_tpu.kernels.dot import _sorted_segment_sum_cumsum
    from sparse_tpu.kernels.search import searchsorted_sorted_probes

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    degs = np.clip(rng.poisson(DEG_MEAN, size=L), 1, 192)
    rows_np = np.repeat(np.arange(L, dtype=np.int32), degs)
    cols_np = rng.integers(0, L, size=rows_np.size).astype(np.int32)
    nnz = rows_np.size
    rows = jnp.asarray(rows_np)
    cols = jnp.asarray(cols_np)
    data = jnp.asarray(rng.random(nnz, dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))

    import scipy.sparse as sp

    oracle = sp.coo_array((np.asarray(data), (rows_np, cols_np)), shape=(L, L)) @ np.asarray(v, np.float64)

    def check(out, tag):
        rel = np.abs(np.asarray(out, np.float64) - oracle).max() / np.abs(oracle).max()
        print(f"    {tag} relerr {rel:.2e}")

    def a_segment(d_):
        prod = d_[:, None] * jnp.take(v, cols, axis=0)
        return jax.ops.segment_sum(prod, rows, num_segments=L, indices_are_sorted=True)

    def b_cumsum(d_):
        prod = d_[:, None] * jnp.take(v, cols, axis=0)
        return _sorted_segment_sum_cumsum(prod, rows, L)

    def c_suffix_scan(d_):
        prod = d_[:, None] * jnp.take(v, cols, axis=0)
        x = prod
        dd = 1
        while dd < nnz:
            same = rows[dd:] == rows[:-dd]
            x = x + jnp.concatenate([jnp.where(same[:, None], x[dd:], 0), jnp.zeros((dd, D), x.dtype)], axis=0)
            dd *= 2
        starts = jnp.clip(searchsorted_sorted_probes(rows, jnp.arange(L, dtype=rows.dtype), "left"), 0, nnz - 1)
        has = searchsorted_sorted_probes(rows, jnp.arange(L, dtype=rows.dtype), "right") > starts
        return jnp.where(has[:, None], jnp.take(x, starts, axis=0), 0)

    for tag, fn in [("A segment_sum (shipped)", a_segment), ("B cumsum-difference", b_cumsum), ("C suffix scan + head gather", c_suffix_scan)]:
        check(fn(data), tag)
        bench(fn, (data,), label=tag)


if __name__ == "__main__":
    main()
