"""Eager-path op suite vs scipy — the reproducible source of the
``docs/benchmarks.md`` "Eager op suite" table (VERDICT r2 item 6: the
residual rows must be measured by a committed harness, not ad-hoc).

Format-fair rules: scipy rows/slices run against CSR (its native strength)
and so do ours; reductions compare against scipy's dense-result ``sum``
even though we build a pruned sparse result; concat compares COO vstack.

Run: python scripts/eager_bench.py  (host CPU; ~1 min)
"""

from __future__ import annotations

import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

import sparse_tpu as sparse


def bench(f, iters=30):
    f()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            f()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    n = 20000
    a = sparse.random((n, n), density=1e-3, random_state=0)
    acsr = a.asformat("csr")
    s_csr = sp.csr_array(
        (np.asarray(acsr.data).copy(), np.asarray(acsr.indices).copy(), np.asarray(acsr.indptr).copy()),
        shape=(n, n),
    )
    s_coo = sp.coo_array(s_csr)
    picks = rng.integers(0, n, 500)
    rows_out = []

    def row(label, ours, scipy_t):
        rows_out.append((label, ours, scipy_t))
        print(f"{label:36s} ours {ours:8.3f} ms   scipy {scipy_t:8.3f} ms   ({ours / scipy_t:.2f}x)", flush=True)

    row("single row (CSR)", bench(lambda: acsr[137]), bench(lambda: s_csr[[137]]))
    row("row slice 10k (CSR)", bench(lambda: acsr[5000:15000]), bench(lambda: s_csr[5000:15000]))
    row("fancy 500 rows (CSR)", bench(lambda: acsr[picks]), bench(lambda: s_csr[picks]))
    row("sum axis=0", bench(lambda: a.sum(axis=0)), bench(lambda: s_csr.sum(axis=0)))
    row("sum axis=1", bench(lambda: a.sum(axis=1)), bench(lambda: s_csr.sum(axis=1)))
    row("scalar mul", bench(lambda: a * 2.5), bench(lambda: s_coo * 2.5))
    row("abs", bench(lambda: abs(a)), bench(lambda: abs(s_coo)))
    row("reshape", bench(lambda: a.reshape((40000, 10000)), 10), bench(lambda: s_coo.reshape((40000, 10000)), 10))
    row("transpose -> csr", bench(lambda: a.T.tocsr(), 10), bench(lambda: s_coo.T.tocsr(), 10))
    row("to csr", bench(lambda: sparse.GCXS.from_coo(a, compressed_axes=(0,)), 10), bench(lambda: s_coo.tocsr(), 10))
    row("to csc", bench(lambda: sparse.GCXS.from_coo(a, compressed_axes=(1,)), 10), bench(lambda: s_coo.tocsc(), 10))

    parts_o = [sparse.random((n, 5000), density=1e-3, random_state=i) for i in range(4)]
    parts_s = [sp.coo_array(p.to_scipy_sparse()) for p in parts_o]
    row(
        "concat axis=0 (4x COO)",
        bench(lambda: sparse.concatenate(parts_o, axis=0), 10),
        bench(lambda: sp.vstack(parts_s), 10),
    )

    x = rng.random(n)
    row("spmv (COO @ x)", bench(lambda: a @ x), bench(lambda: s_csr @ x))
    d32 = rng.random((n, 32))
    row("spmm (CSR @ (n,32))", bench(lambda: acsr @ d32, 10), bench(lambda: s_csr @ d32, 10))

    # SpGEMM at the reference's matmul_example shape (100k^2 @ 1e-5,
    # ref examples/matmul_example.py:11-62): CSR x CSR via the threaded
    # C++ Gustavson (native/eager.cpp), vs scipy's csr @ csr
    g1 = sparse.random((100_000, 100_000), density=1e-5, random_state=11, format="gcxs", compressed_axes=(0,))
    g2 = sparse.random((100_000, 100_000), density=1e-5, random_state=12, format="gcxs", compressed_axes=(0,))
    sg1 = sp.csr_array(g1.to_scipy_sparse())
    sg2 = sp.csr_array(g2.to_scipy_sparse())
    row("spgemm csr@csr 100k^2 @1e-5", bench(lambda: g1 @ g2, 10), bench(lambda: sg1 @ sg2, 10))
    # input-format-fair: scipy also starts from COO operands (it converts
    # internally and returns CSR; ours returns a canonical COO, which
    # includes the indptr->rows uncompress the CSR result skips)
    gc1 = g1.tocoo()
    gc2 = g2.tocoo()
    sc1 = sp.coo_array(sg1)
    sc2 = sp.coo_array(sg2)
    row("spgemm coo@coo 100k^2 @1e-5", bench(lambda: gc1 @ gc2, 10), bench(lambda: sc1 @ sc2, 10))

    # the reference spmv_add example shape (csc 99990 x 100k @ 1e-6)
    m2 = sparse.random((99990, 100000), density=1e-6, random_state=7, format="gcxs", compressed_axes=(1,))
    s2 = sp.csc_array(m2.to_scipy_sparse())
    x2 = rng.random(100000)
    y2 = rng.random(99990)
    row("spmv_add csc 100k @1e-6", bench(lambda: m2 @ x2 + y2), bench(lambda: s2 @ x2 + y2))
    # fused entry (sparse.matvec_add): seeds the output with y, skipping
    # the unfused expression's separate full-length add pass
    row("spmv_add fused (matvec_add)", bench(lambda: sparse.matvec_add(m2, x2, y2)), bench(lambda: s2 @ x2 + y2))

    worst = max(r[1] / r[2] for r in rows_out)
    print(f"\nworst ratio vs scipy: {worst:.2f}x over {len(rows_out)} ops")


if __name__ == "__main__":
    main()
