"""Per-kernel-family regression benchmarks — the repo-native analogue of the
reference's CodSpeed-tracked pytest benchmarks
(``/root/reference/benchmarks/test_benchmark_coo.py:21-176``).

Emits one JSON object per family (and a trailing summary dict) so rounds are
diffable: run ``python bench_regression.py --out benchmarks/regression_rN.json``
then ``python scripts/bench_compare.py benchmarks/regression_baseline.json
benchmarks/regression_rN.json``.

Device (in-jit) families use the scan-loop + RTT-calibrated methodology
(CLAUDE.md); eager families time host wall-clock. Shapes are deliberately
smaller than bench.py's flagship so the full suite stays under ~2 minutes of
device time while remaining bandwidth/rate-bound.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

_RTT = None


def _fetch_rtt():
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        _RTT = min(
            _timed(lambda: float(f(jnp.float32(0)))) for _ in range(3)
        )
    return _RTT


def _timed(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def device_bench(fn, args, iters=30, perturb=None):
    """Scan-loop timing; perturbs every float arg per iteration by default
    (hoist-proof: gathers' TABLES must vary, docs/spmm_roofline.md)."""
    if perturb is None:
        def perturb(a, i):
            eps = i.astype(jnp.float32) * 1e-6
            return jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                a,
            )

    @jax.jit
    def run(*a):
        def body(carry, i):
            out = fn(*perturb(a, i))
            # full-reduction consumer: no output phase can be DCE-sliced
            # (same discipline as bench.py, VERDICT r3 #2)
            return carry + jnp.asarray(out).sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    rtt = _fetch_rtt()
    float(run(*args))
    total = _timed(lambda: float(run(*args)))
    return max(total - rtt, total * 0.05) / iters


def host_bench(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--families", default=None, help="comma-separated subset")
    args = ap.parse_args()

    import sparse_tpu as sparse
    from sparse_tpu.kernels import build_block_ell, ell_spmm, ell_spmv, sddmm

    results = []
    rng = np.random.default_rng(0)
    want = set(args.families.split(",")) if args.families else None

    HBM_BYTES_PER_S = 819e9  # v5e one core

    def emit(family, mode, ms, unit_name=None, unit_value=None, min_bytes=None):
        row = {"family": family, "mode": mode, "ms": round(ms * 1e3, 4)}
        if unit_name:
            row[unit_name] = round(unit_value, 1)
        if min_bytes is not None:
            # fraction of the HBM-bandwidth speed-of-light (strictest
            # denominator, same roofline style as bench.py)
            row["vs_sol"] = round((min_bytes / HBM_BYTES_PER_S) / ms, 4)
        results.append(row)
        print(json.dumps(row), flush=True)

    def on(family):
        return want is None or family in want

    # ---- device families (quarter-scale flagship: 16k^2, nnz 512k) ----
    M = K = 1 << 14
    lin = np.unique(rng.integers(0, M * K, size=1 << 19, dtype=np.int64))
    r, c = (lin // K).astype(np.int32), (lin % K).astype(np.int32)
    d = rng.random(lin.size, dtype=np.float32)
    ell = build_block_ell(r, c, d, M, K)
    B = jnp.asarray(rng.random((K, 128), dtype=np.float32))
    x = jnp.asarray(rng.random(K, dtype=np.float32))

    from sparse_tpu.kernels import build_row_ell, row_ell_spmm, row_ell_spmv
    from sparse_tpu.kernels.row_ell import RowEll

    rell = build_row_ell(r, c, d, M, K)

    if on("spmm"):
        dt = device_bench(
            lambda tiers, pinv, b: row_ell_spmm(
                RowEll(tiers, pinv, rell.n_rows, rell.n_cols, rell.nz_rows), b
            ),
            (rell.tiers, rell.perm_inv, B),
        )
        emit("spmm", "jit", dt, "mnnz_per_s", lin.size / dt / 1e6,
             min_bytes=lin.size * 128 * 4 + lin.size * 12 + M * 128 * 4)
        dt = device_bench(
            lambda er, ec, ed, b: ell_spmm(er, ec, ed, b, n_rows=M),
            (ell.e_rows, ell.e_cols, ell.e_data, B),
        )
        emit("spmm_block_ell", "jit", dt, "mnnz_per_s", lin.size / dt / 1e6)

    if on("spmv"):
        dt = device_bench(
            lambda tiers, pinv, xx: row_ell_spmv(
                RowEll(tiers, pinv, rell.n_rows, rell.n_cols, rell.nz_rows), xx
            ),
            (rell.tiers, rell.perm_inv, x),
        )
        emit("spmv", "jit", dt, "mnnz_per_s", lin.size / dt / 1e6,
             min_bytes=lin.size * 12 + (M + K) * 4)
        dt = device_bench(
            lambda er, ec, ed, xx: ell_spmv(er, ec, ed, xx, n_rows=M),
            (ell.e_rows, ell.e_cols, ell.e_data, x),
        )
        emit("spmv_block_ell", "jit", dt, "mnnz_per_s", lin.size / dt / 1e6)

    if on("spmm_program"):
        # constant-embedded row-ELL program at quarter scale (r4; the
        # bench.py metric path)
        from sparse_tpu.kernels import build_row_ell
        from sparse_tpu.kernels.row_ell import row_ell_spmm_program

        rngp = np.random.default_rng(0)
        Mq = Kq = 1 << 14
        linq = np.unique(rngp.integers(0, Mq * Kq, size=1 << 19, dtype=np.int64))
        rq = (linq // Kq).astype(np.int32)
        cq = (linq % Kq).astype(np.int32)
        dq = rngp.random(linq.size, dtype=np.float32)
        rellq = build_row_ell(rq, cq, dq, Mq, Kq)
        Bq = jnp.asarray(rngp.random((Kq, 128), dtype=np.float32))
        progq = row_ell_spmm_program(rellq)
        dt = device_bench(lambda b: progq(b), (Bq,))
        emit("spmm_program", "jit", dt, "mnnz_per_s", linq.size / dt / 1e6,
             min_bytes=linq.size * 128 * 4 + linq.size * 12 + Mq * 128 * 4)

    if on("sddmm"):
        n_s = 10000
        s = sparse.random((n_s, n_s), density=1e-4, random_state=1)
        sr = jnp.asarray(np.asarray(s.coords[0]))
        sc = jnp.asarray(np.asarray(s.coords[1]))
        sd = jnp.asarray(np.asarray(s.data).astype(np.float32))
        A1 = jnp.asarray(rng.random((n_s, 128), dtype=np.float32))
        B1 = jnp.asarray(rng.random((128, n_s), dtype=np.float32))
        dt = device_bench(sddmm, (sr, sc, sd, A1, B1))
        emit("sddmm", "jit", dt, "mnnz_per_s", s.nnz / dt / 1e6,
             min_bytes=s.nnz * (2 * 128 * 4 + 16))

    if on("mttkrp"):
        from sparse_tpu.kernels import mttkrp

        t3 = sparse.random((1000, 1000, 100), density=1e-4, random_state=12)
        ci, cj, ck = (jnp.asarray(np.asarray(t3.coords[i])) for i in range(3))
        tv = jnp.asarray(np.asarray(t3.data).astype(np.float32))
        Cm = jnp.asarray(rng.random((1000, 25), dtype=np.float32))
        Dm = jnp.asarray(rng.random((100, 25), dtype=np.float32))
        dt = device_bench(
            lambda a, b, c_, v, e, f: mttkrp(a, b, c_, v, e, f, n_rows=1000),
            (ci, cj, ck, tv, Cm, Dm),
        )
        emit("mttkrp", "jit", dt, "mnnz_per_s", t3.nnz / dt / 1e6,
             min_bytes=t3.nnz * (3 * 25 * 4 + 16))

    if on("sddmm_flagship"):
        # bench-scale SDDMM (VERDICT r3 #4): 65536^2 mask, 2.1M nnz, d=128
        rngS = np.random.default_rng(0)
        linS = np.unique(rngS.integers(0, (1 << 16) * (1 << 16), size=1 << 21, dtype=np.int64))
        srL = jnp.asarray((linS // (1 << 16)).astype(np.int32))
        scL = jnp.asarray((linS % (1 << 16)).astype(np.int32))
        sdL = jnp.asarray(rngS.random(linS.size, dtype=np.float32))
        AL = jnp.asarray(rngS.random((1 << 16, 128), dtype=np.float32))
        BL = jnp.asarray(rngS.random((128, 1 << 16), dtype=np.float32))
        dt = device_bench(sddmm, (srL, scL, sdL, AL, BL), iters=20)
        emit("sddmm_flagship", "jit", dt, "mnnz_per_s", linS.size / dt / 1e6,
             min_bytes=linS.size * (2 * 128 * 4 + 16))
        del linS, srL, scL, sdL, AL, BL

    if on("mttkrp_large"):
        # the BASELINE workload shape (ref examples/mttkrp_example.py:10-58):
        # 100k x 2k x 2k, 10M nnz, J=32 — exact and the r4 hilo fast mode
        from sparse_tpu.kernels import build_block_ell_3d, ell_mttkrp

        rngL = np.random.default_rng(0)
        I_, J_, K_ = 100_000, 2000, 2000
        linL = np.unique(rngL.integers(0, I_ * J_ * K_, size=10_000_000, dtype=np.int64))
        ciL = (linL // (J_ * K_)).astype(np.int32)
        cjL = ((linL // K_) % J_).astype(np.int32)
        ckL = (linL % K_).astype(np.int32)
        tvL = rngL.random(linL.size, dtype=np.float32)
        CL = jnp.asarray(rngL.random((J_, 32), dtype=np.float32))
        DL = jnp.asarray(rngL.random((K_, 32), dtype=np.float32))
        erL, ejL, ekL, edL = build_block_ell_3d(ciL, cjL, ckL, tvL, I_)
        mtt_bytes = linL.size * (2 * 32 * 4 + 16) + I_ * 32 * 4
        for mode in ("exact", "hilo"):
            dt = device_bench(
                lambda c_, d_, _m=mode: ell_mttkrp(erL, ejL, ekL, edL, c_, d_, n_rows=I_, strategy=_m),
                (CL, DL),
                iters=10,
            )
            emit("mttkrp_large", f"jit_{mode}", dt, "mnnz_per_s", linL.size / dt / 1e6,
                 min_bytes=mtt_bytes)
        del erL, ejL, ekL, edL, linL, ciL, cjL, ckL, tvL

    if on("spgemm"):
        from sparse_tpu.jitops import spgemm as jit_spgemm
        from sparse_tpu.kernels.spgemm import product_count

        a_j = sparse.random((4096, 4096), density=5e-4, random_state=2)
        b_j = sparse.random((4096, 4096), density=5e-4, random_state=3)
        a_j = sparse.COO(np.asarray(a_j.coords), np.asarray(a_j.data, np.float32), shape=a_j.shape)
        b_j = sparse.COO(np.asarray(b_j.coords), np.asarray(b_j.data, np.float32), shape=b_j.shape)
        cap = max(int(product_count(np.asarray(a_j.coords[1]), np.asarray(b_j.coords[0]), b_j.shape[0])), 1)

        def f(a_, b_):
            out, nnz = jit_spgemm(a_, b_, product_capacity=cap)
            return jnp.asarray(out.data)

        def perturb_coo2(a, i):
            a_, b_ = a
            eps = i.astype(jnp.float32) * 1e-6
            a2 = type(a_)._make(a_.coords, jnp.asarray(a_.data) + eps, a_.shape, a_.fill_value)
            b2 = type(b_)._make(b_.coords, jnp.asarray(b_.data) + eps, b_.shape, b_.fill_value)
            return (a2, b2)

        dt = device_bench(f, (a_j, b_j), iters=10, perturb=perturb_coo2)
        emit("spgemm", "jit", dt)

    if on("segment_softmax"):
        # r5: backward-scan propagation form (quarter-scale: 512k edges)
        from sparse_tpu import nn as stnn

        Ls = 1 << 12
        degs_s = np.clip(rng.poisson(128, size=Ls), 1, 192)
        rows_s = np.repeat(np.arange(Ls, dtype=np.int32), degs_s)
        rows_sj = jnp.asarray(rows_s)
        scores_s = jnp.asarray(rng.standard_normal(rows_s.size).astype(np.float32))
        dt = device_bench(
            lambda s: stnn.segment_softmax(s, rows_sj, n_rows=Ls), (scores_s,), iters=30
        )
        emit("segment_softmax", "jit", dt, "medges_per_s", rows_s.size / dt / 1e6)

    if on("sparse_attention"):
        # r5 flagship: ELL-routed general COO attention (quarter-scale)
        from sparse_tpu import nn as stnn

        La2, Da2 = 1 << 12, 64
        degs_a = np.clip(rng.poisson(128, size=La2), 1, 192)
        rows_a2 = np.repeat(np.arange(La2, dtype=np.int32), degs_a)
        cols_a2 = rng.integers(0, La2, size=rows_a2.size).astype(np.int32)
        ord_a2 = np.lexsort((cols_a2, rows_a2))
        rows_a2, cols_a2 = rows_a2[ord_a2], cols_a2[ord_a2]
        k_a2 = rows_a2.astype(np.int64) * La2 + cols_a2
        u_a2 = np.concatenate([[True], np.diff(k_a2) > 0])
        rows_a2, cols_a2 = rows_a2[u_a2], cols_a2[u_a2]
        q_a2 = jnp.asarray(rng.standard_normal((La2, Da2)).astype(np.float32))
        kv_a2 = jnp.asarray(rng.standard_normal((La2, Da2)).astype(np.float32))
        dt = device_bench(
            lambda x: stnn.sparse_attention(x, kv_a2, kv_a2, rows_a2, cols_a2), (q_a2,), iters=20
        )
        emit("sparse_attention", "jit", dt, "medges_per_s", rows_a2.size / dt / 1e6)

    if on("elemwise"):
        from sparse_tpu.jitops import union_elemwise

        u1 = sparse.random((1024, 1024), density=0.05, random_state=4)
        u2 = sparse.random((1024, 1024), density=0.05, random_state=5)
        u1 = sparse.COO(np.asarray(u1.coords), np.asarray(u1.data, np.float32), shape=u1.shape)
        u2 = sparse.COO(np.asarray(u2.coords), np.asarray(u2.data, np.float32), shape=u2.shape)

        def g(a_, b_):
            out, nnz = union_elemwise(jnp.add, a_, b_)
            return jnp.asarray(out.data)

        def perturb_coo2(a, i):
            a_, b_ = a
            eps = i.astype(jnp.float32) * 1e-6
            a2 = type(a_)._make(a_.coords, jnp.asarray(a_.data) + eps, a_.shape, a_.fill_value)
            b2 = type(b_)._make(b_.coords, jnp.asarray(b_.data) + eps, b_.shape, b_.fill_value)
            return (a2, b2)

        dt = device_bench(g, (u1, u2), iters=10, perturb=perturb_coo2)
        emit("elemwise", "jit", dt)

    # ---- eager host families ----
    if on("elemwise"):
        e1 = sparse.random((10000, 10000), density=1e-3, random_state=5)
        e2 = sparse.random((10000, 10000), density=1e-3, random_state=6)
        emit("elemwise_add", "eager", host_bench(lambda: e1 + e2))
        emit("elemwise_mul", "eager", host_bench(lambda: e1 * e2))

    if on("spgemm"):
        a_e = sparse.random((100000, 100000), density=1e-5, random_state=3)
        b_e = sparse.random((100000, 100000), density=1e-5, random_state=4)
        emit("spgemm", "eager", host_bench(lambda: a_e @ b_e))

    if on("spmm"):
        g1 = sparse.random((20000, 20000), density=1e-3, random_state=7, format="gcxs")
        Dm = rng.random((20000, 32))
        emit("spmm_gcxs", "eager", host_bench(lambda: g1 @ Dm))

    if on("spmv"):
        gv = sparse.random((65536, 65536), density=5e-4, random_state=8)
        xv = rng.random(65536)
        emit("spmv_coo", "eager", host_bench(lambda: gv @ xv))

    if on("indexing"):
        ix = sparse.random((10000, 10000), density=1e-3, random_state=9)
        emit("indexing_slice", "eager", host_bench(lambda: ix[2000:8000, 1000:9000], iters=10))
        picks = rng.integers(0, 10000, 500)
        emit("indexing_fancy", "eager", host_bench(lambda: ix[picks], iters=10))
        gxi = ix.asformat("gcxs")
        emit("indexing_gcxs_rows", "eager", host_bench(lambda: gxi[picks], iters=10))

    if on("reduction"):
        rx = sparse.random((100000, 1000), density=1e-3, random_state=10)
        emit("reduction_sum_axis1", "eager", host_bench(lambda: rx.sum(axis=1), iters=10))
        emit("reduction_sum_axis0", "eager", host_bench(lambda: rx.sum(axis=0), iters=10))
        emit("reduction_max_all", "eager", host_bench(lambda: rx.max(), iters=10))

    if on("construction"):
        cr = rng.integers(0, 1 << 16, 3_000_000).astype(np.int64)
        cc = rng.integers(0, 1 << 16, 3_000_000).astype(np.int64)
        cv = rng.random(3_000_000)
        coords_c = np.stack([cr, cc])
        emit("construction_coo", "eager", host_bench(lambda: sparse.COO(coords_c, cv, shape=(1 << 16, 1 << 16)), iters=3))
        coo_c = sparse.COO(coords_c, cv, shape=(1 << 16, 1 << 16))
        emit("construction_gcxs", "eager", host_bench(lambda: sparse.GCXS.from_coo(coo_c, compressed_axes=(0,)), iters=3))
        emit("construction_transpose_csr", "eager", host_bench(lambda: coo_c.T.tocsr(), iters=3))

    if on("concat"):
        gparts = [
            sparse.random((20000, 5000), density=1e-3, random_state=11 + i).asformat("gcxs", compressed_axes=(0,))
            for i in range(4)
        ]
        emit("concat_gcxs_native", "eager", host_bench(lambda: sparse.concatenate(gparts, axis=0), iters=10))
        cparts = [p.tocoo() for p in gparts]
        # the pre-native route: COO concat + recompress
        emit(
            "concat_gcxs_via_coo", "eager",
            host_bench(lambda: sparse.GCXS.from_coo(sparse.concatenate(cparts, axis=0), compressed_axes=(0,)), iters=10),
        )
        emit("concat_coo", "eager", host_bench(lambda: sparse.concatenate(cparts, axis=0), iters=10))

    summary = {"metric": "bench_regression", "families": len(results), "backend": jax.default_backend()}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            for row in results:
                fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
