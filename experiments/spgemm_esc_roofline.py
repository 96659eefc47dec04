"""Round-4: ESC SpGEMM roofline (VERDICT r3 #8/#6).

The traceable ``esc_spgemm`` is expand -> SORT -> contract; the sort of
``product_capacity`` int64 keys is the expected bound.  This measures:

  - esc_spgemm end-to-end at two shapes:
      (a) the reference matmul workload 100k^2 @ 1e-5 (P ~= 100k products)
      (b) a flagship-adjacent 65536^2 @ 1e-4 (P ~= 2.9M products)
  - the bare jnp.sort of P int64 keys (the mechanism's floor)
  - the expansion phase alone (searchsorted + gathers)

vs_sol for the regression family = sort_floor / total.

Run: timeout 3600 python experiments/spgemm_esc_roofline.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp

_RTT = None


def bench(fn, args, iters=20, perturb=None):
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
            if perturb is not None:
                # integer args perturb by i itself: a float-eps cast to int
                # truncates to a foldable 0 (CLAUDE.md) and the op risks
                # LICM-hoisting the whole body
                if jnp.issubdtype(aa[perturb].dtype, jnp.integer):
                    aa[perturb] = aa[perturb] + i.astype(aa[perturb].dtype)
                else:
                    eps = i.astype(jnp.float32) * 1e-6
                    aa[perturb] = (aa[perturb] + eps.astype(aa[perturb].dtype)).astype(a[perturb].dtype)
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


def run_shape(m, k, n, density, tag):
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    rng = np.random.default_rng(0)

    def make(mm, kk, seed):
        r = np.random.default_rng(seed)
        nnz = int(mm * kk * density)
        lin = np.unique(r.integers(0, mm * kk, size=nnz, dtype=np.int64))
        return (
            (lin // kk).astype(np.int32),
            (lin % kk).astype(np.int32),
            r.random(lin.size, dtype=np.float32),
        )

    ra, ca, va = make(m, k, 1)
    rb, cb, vb = make(k, n, 2)
    P = product_count(ca, rb, k)
    pcap = max(int(P * 1.02) + 256, 1024)
    ocap = pcap  # collisions are rare at these densities; don't truncate
    print(f"[{tag}] nnz_a={va.size} nnz_b={vb.size} products={P} pcap={pcap}", flush=True)

    raj, caj, vaj = map(jnp.asarray, (ra, ca, va))
    rbj, cbj, vbj = map(jnp.asarray, (rb, cb, vb))

    def full(va_, vb_):
        r_, c_, d_, nz = esc_spgemm(
            raj, caj, va_, rbj, cbj, vb_, k=k, n=n, product_capacity=pcap, out_capacity=ocap
        )
        return d_

    # oracle vs scipy
    import scipy.sparse as sp

    A = sp.coo_array((va, (ra, ca)), shape=(m, k)).tocsr()
    B = sp.coo_array((vb, (rb, cb)), shape=(k, n)).tocsr()
    C = (A @ B).tocoo()
    rr, cc, dd, nz = jax.jit(full)(vaj, vbj), None, None, None
    got = np.asarray(rr)
    # compare sums (padded entries are zero)
    np.testing.assert_allclose(got.sum(), C.data.sum(), rtol=1e-3)

    t_full = bench(full, (vaj, vbj), perturb=0)

    # sort floor: P int64 keys
    keys = jnp.asarray(rng.integers(0, m * n, size=pcap, dtype=np.int64))

    def sort_only(ks):
        # order-DEPENDENT consumer: sort().sum() is DCE'd to sum()
        s = jnp.sort(ks)
        return s.astype(jnp.float32) * (jnp.arange(s.shape[0], dtype=jnp.float32) * 1e-9)

    # perturb the keys: with invariant inputs XLA hoists the sort out of
    # the timing scan entirely (measured a bogus 0.3 ms "floor" at 2.8M)
    t_sort = bench(sort_only, (keys,), perturb=0)

    # expansion phase only
    def expand_only(va_, vb_):
        nnz_a = va_.shape[0]
        edges = jnp.searchsorted(rbj, jnp.arange(k + 1, dtype=rbj.dtype), side="left")
        counts_b = jnp.diff(edges)
        starts_b = edges[:-1]
        repeats = counts_b[caj]
        ends = jnp.cumsum(repeats)
        p_idx = jnp.arange(pcap, dtype=ends.dtype)
        e = jnp.searchsorted(ends, p_idx, side="right")
        e_c = jnp.clip(e, 0, nnz_a - 1)
        within = p_idx - (ends[e_c] - repeats[e_c])
        b_idx = jnp.clip(starts_b[caj[e_c]] + within, 0, vb_.shape[0] - 1)
        return va_[e_c] * vb_[b_idx]

    print(
        f"[{tag}] full {t_full*1e3:.3f} ms | single-sort floor {t_sort*1e3:.3f} ms "
        f"(r5 mechanism floor ~= 2 sorts) | vs 2-sort floor {2*t_sort/t_full:.3f}",
        flush=True,
    )
    return t_full, t_sort


def main():
    run_shape(100_000, 100_000, 100_000, 1e-5, "ref-100k@1e-5")
    run_shape(65_536, 65_536, 65_536, 1e-4, "flagship-65k@1e-4")


if __name__ == "__main__":
    main()
