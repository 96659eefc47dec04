"""Round-4 SpMM headroom (VERDICT r3 #3): claim the measured gaps inside
the shipped grouped row-ELL scheme, or close the book with numbers.

Targets from docs/spmm_roofline.md:
  - gather order: 700 GB/s achieved vs 768 sorted ceiling (-0.28 ms)
  - reduce stream: 725 GB/s vs 819 (-0.17 ms)
  - bf16 table (opt-in): halves the dominant gather stream

Variants (bench shape 65k^2, 2.1M nnz, N=128):
  A. shipped row_ell_spmm (re-measure, median-of-3 discipline)
  B. bf16 dense table, f32 accumulate (opt-in fast mode candidate)
  C. einsum-over-w reduce on the MXU (HIGHEST) instead of mul+sum
  D. sorted-gather probe: take(dense, sorted(c)) per tier —
     association-broken, TIMING ONLY (the layout's gather ceiling)
  E. gather+reduce with data folded as (1+eps)-style scale into gather?
     no — instead: two-pass w-split accumulate (does splitting the w axis
     change the fusion's reduce stream rate?)

Run: timeout 3600 python experiments/spmm_r4.py
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
N = 128

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
    from sparse_tpu.kernels import build_row_ell
    from sparse_tpu.kernels.row_ell import row_ell_spmm

    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    data = rng.random(lin.size, dtype=np.float32)
    dense = jnp.asarray(rng.random((K, N), dtype=np.float32))
    nnz = int(lin.size)
    re = build_row_ell(rows, cols, data, M, K)
    tiers = re.tiers
    perm_inv = re.perm_inv

    ref = np.zeros((M, N), dtype=np.float64)
    np.add.at(ref, rows, data[:, None] * np.asarray(dense, dtype=np.float64)[cols])

    def check(out, tag):
        got = np.asarray(out, np.float64)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"  {tag} relerr {rel:.2e}", flush=True)

    def variant_a(dense_):
        return row_ell_spmm(re, dense_)

    def variant_b(dense16_):
        outs = []
        for c, d in tiers:
            g = jnp.take(dense16_, c, axis=0)  # (r/G, w, G, n) bf16
            o = (d[:, :, :, None] * g.astype(jnp.float32)).sum(axis=1)
            outs.append(o.reshape(-1, N))
        pad = jnp.zeros((re.n_rows - re.nz_rows, N), jnp.float32)
        out_sorted = jnp.concatenate(outs + [pad], axis=0)
        return jnp.take(out_sorted, perm_inv, axis=0)

    def variant_c(dense_):
        outs = []
        for c, d in tiers:
            g = jnp.take(dense_, c, axis=0)  # (r/G, w, G, n)
            o = jnp.einsum(
                "bwg,bwgn->bgn", d, g,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            outs.append(o.reshape(-1, N))
        pad = jnp.zeros((re.n_rows - re.nz_rows, N), jnp.float32)
        out_sorted = jnp.concatenate(outs + [pad], axis=0)
        return jnp.take(out_sorted, perm_inv, axis=0)

    sorted_tiers = tuple(
        (jnp.asarray(np.sort(np.asarray(c).ravel()).reshape(c.shape)), d) for c, d in tiers
    )

    def variant_d(dense_):
        # TIMING ONLY: same gather volume, indices fully sorted
        outs = []
        for c, d in sorted_tiers:
            g = jnp.take(dense_, c, axis=0)
            o = (d[:, :, :, None] * g).sum(axis=1)
            outs.append(o.reshape(-1, N))
        pad = jnp.zeros((re.n_rows - re.nz_rows, N), jnp.float32)
        out_sorted = jnp.concatenate(outs + [pad], axis=0)
        return jnp.take(out_sorted, perm_inv, axis=0)

    def variant_e(dense_):
        outs = []
        for c, d in tiers:
            w = c.shape[1]
            if w >= 8:
                h = w // 2
                g1 = jnp.take(dense_, c[:, :h], axis=0)
                g2 = jnp.take(dense_, c[:, h:], axis=0)
                o = (d[:, :h, :, None] * g1).sum(axis=1) + (d[:, h:, :, None] * g2).sum(axis=1)
            else:
                g = jnp.take(dense_, c, axis=0)
                o = (d[:, :, :, None] * g).sum(axis=1)
            outs.append(o.reshape(-1, N))
        pad = jnp.zeros((re.n_rows - re.nz_rows, N), jnp.float32)
        out_sorted = jnp.concatenate(outs + [pad], axis=0)
        return jnp.take(out_sorted, perm_inv, axis=0)

    dense16 = dense.astype(jnp.bfloat16)
    print(f"nnz={nnz}", flush=True)
    jobs = [
        ("A shipped", variant_a, (dense,), True),
        ("B bf16 table", variant_b, (dense16,), True),
        ("C einsum-w MXU HIGHEST", variant_c, (dense,), True),
        ("D sorted-gather probe", variant_d, (dense,), False),
        ("E w-split gathers", variant_e, (dense,), True),
    ]
    for name, f, args, do_check in jobs:
        jf = jax.jit(f)
        if do_check:
            check(jf(*args), name)
        dt = bench(jf, args)
        print(f"{name}: {dt*1e3:.3f} ms = {nnz/dt/1e6:.0f} M nnz/s", flush=True)


if __name__ == "__main__":
    main()
