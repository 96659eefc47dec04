"""Extended benchmark suite — prints a table over all flagship workloads.

(`bench.py` remains the driver's single-line contract; this suite is the
human-facing breakdown.) On this box the default platform is the TPU
tunnel; pass --cpu to run on the host backend.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


_RTT = None


def _fetch_rtt():
    """The tunnel's fixed cost of one jitted-fetch round trip."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(0)))
            samples.append(time.perf_counter() - t0)
        _RTT = min(samples)
    return _RTT


def device_bench(fn, args, iters=50):
    """Time `iters` executions inside one jit, minus the calibrated fetch
    round-trip. The last (float) argument is perturbed per iteration so XLA
    cannot hoist the computation out of the loop."""

    @jax.jit
    def run(*a):
        def body(carry, i):
            perturbed = a[:-1] + (a[-1] + i.astype(a[-1].dtype) * 1e-6,)
            out = fn(*perturbed)
            # full-reduction consumer (DCE-proof, same as bench.py)
            return carry + jnp.asarray(out).sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    rtt = _fetch_rtt()
    float(run(*args))
    t = time.perf_counter()
    float(run(*args))
    total = time.perf_counter() - t
    return max(total - rtt, total * 0.05) / iters


def host_bench(fn, iters=5):
    fn()
    t = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t) / iters


HBM_BYTES_PER_S = 819e9  # v5e one core


def _vs_sol(dt, min_bytes):
    """Fraction of the HBM-bandwidth speed-of-light a kernel reaches: the
    same strictest-denominator roofline style bench.py uses (min_bytes =
    the bytes ANY scheme must stream)."""
    return f"{(min_bytes / HBM_BYTES_PER_S) / dt:.2f} SoL"


def main():
    import sparse_tpu as sparse
    from sparse_tpu.kernels import build_block_ell, ell_spmm, mttkrp, sddmm
    from sparse_tpu.kernels.bsr import BSR, bsr_spmm_pallas, build_bsr

    rows_out = []
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"

    # 1. unstructured SpMM (the bench.py workload) — row-ELL flagship
    from sparse_tpu.kernels import build_row_ell, row_ell_spmm, row_ell_spmv
    from sparse_tpu.kernels.row_ell import RowEll

    M = K = 1 << 16
    lin = np.unique(rng.integers(0, M * K, size=1 << 21, dtype=np.int64))
    r, c = (lin // K).astype(np.int32), (lin % K).astype(np.int32)
    d = rng.random(lin.size, dtype=np.float32)
    rell = build_row_ell(r, c, d, M, K)
    B = jnp.asarray(rng.random((K, 128), dtype=np.float32))

    def _rell_spmm(tiers, perm_inv, b):
        return row_ell_spmm(RowEll(tiers, perm_inv, rell.n_rows, rell.n_cols, rell.nz_rows), b)

    dt = device_bench(_rell_spmm, (rell.tiers, rell.perm_inv, B))
    spmm_bytes = lin.size * 128 * 4 + lin.size * 12 + M * 128 * 4
    rows_out.append(
        (
            "SpMM 65k^2 nnz=2.1M N=128 f32 (row-ELL)",
            f"{dt * 1e3:.2f} ms",
            f"{lin.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, spmm_bytes)}",
        )
    )

    # constant-embedded program (the production form for repeated products
    # against a fixed matrix — bench.py's metric path; r4)
    from sparse_tpu.kernels.row_ell import row_ell_spmm_program

    prog = row_ell_spmm_program(rell)
    dt = device_bench(lambda b: prog(b), (B,))
    rows_out.append(
        (
            "SpMM same (constant-embedded program)",
            f"{dt * 1e3:.2f} ms",
            f"{lin.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, spmm_bytes)}",
        )
    )

    ell = build_block_ell(r, c, d, M, K)
    dt = device_bench(lambda er, ec, ed, b: ell_spmm(er, ec, ed, b, n_rows=M), (ell.e_rows, ell.e_cols, ell.e_data, B))
    rows_out.append(("SpMM same (block-ELL one-hot, comparison)", f"{dt * 1e3:.2f} ms", f"{lin.size / dt / 1e6:.0f}M nnz/s"))

    # 2. SpMV — row-ELL lane-gather flagship
    x = jnp.asarray(rng.random(K, dtype=np.float32))

    def _rell_spmv(tiers, perm_inv, xx):
        return row_ell_spmv(RowEll(tiers, perm_inv, rell.n_rows, rell.n_cols, rell.nz_rows), xx)

    dt = device_bench(_rell_spmv, (rell.tiers, rell.perm_inv, x))
    spmv_bytes = lin.size * 12 + (M + K) * 4  # triplet stream + x + out
    rows_out.append(
        (
            "SpMV same matrix (row-ELL lane, exact)",
            f"{dt * 1e3:.2f} ms",
            f"{lin.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, spmv_bytes)}",
        )
    )

    if on_tpu:
        # throughput path: Pallas one-hot MXU pick, x VMEM-resident
        # (hi|lo split, relerr ~2e-6 — docs/spmm_roofline.md round 3)
        def _rell_spmv_oh(tiers, perm_inv, xx):
            return row_ell_spmv(
                RowEll(tiers, perm_inv, rell.n_rows, rell.n_cols, rell.nz_rows), xx, strategy="onehot"
            )

        dt = device_bench(_rell_spmv_oh, (rell.tiers, rell.perm_inv, x))
        rows_out.append(
            (
                "SpMV same (Pallas one-hot MXU pick)",
                f"{dt * 1e3:.2f} ms",
                f"{lin.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, spmv_bytes)}",
            )
        )

    # 3. SDDMM (10k^2 dense pair @ 1e-4 mask)
    n_s = 10000
    s = sparse.random((n_s, n_s), density=1e-4, random_state=1)
    sr = jnp.asarray(np.asarray(s.coords[0]))
    sc = jnp.asarray(np.asarray(s.coords[1]))
    sd = jnp.asarray(np.asarray(s.data).astype(np.float32))
    A1 = jnp.asarray(rng.random((n_s, 128), dtype=np.float32))
    B1 = jnp.asarray(rng.random((128, n_s), dtype=np.float32))
    dt = device_bench(sddmm, (sr, sc, sd, A1, B1))
    # any scheme must stream two K-vectors per sample plus the triplet
    sddmm_bytes = s.nnz * (2 * 128 * 4 + 16)
    rows_out.append(
        (
            "SDDMM 10k^2 K=128 mask@1e-4",
            f"{dt * 1e3:.2f} ms",
            f"{s.nnz / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, sddmm_bytes)}",
        )
    )

    # 3b. SDDMM at flagship scale (the SpMM bench mask: 65536^2, 2.1M nnz,
    # d=128) — phase split in docs/spmm_roofline.md "SDDMM (round 4)"
    if on_tpu:
        rngS = np.random.default_rng(0)
        linS = np.unique(rngS.integers(0, (1 << 16) * (1 << 16), size=1 << 21, dtype=np.int64))
        srL = jnp.asarray((linS // (1 << 16)).astype(np.int32))
        scL = jnp.asarray((linS % (1 << 16)).astype(np.int32))
        sdL = jnp.asarray(rngS.random(linS.size, dtype=np.float32))
        AL = jnp.asarray(rngS.random((1 << 16, 128), dtype=np.float32))
        BL = jnp.asarray(rngS.random((128, 1 << 16), dtype=np.float32))
        dt = device_bench(sddmm, (srL, scL, sdL, AL, BL), iters=20)
        sddmmL_bytes = linS.size * (2 * 128 * 4 + 16)
        rows_out.append(
            (
                "SDDMM 65k^2 K=128 2.1M nnz",
                f"{dt * 1e3:.2f} ms",
                f"{linS.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, sddmmL_bytes)}",
            )
        )
        del linS, srL, scL, sdL, AL, BL

    # 4. MTTKRP (reference example shape)
    t3 = sparse.random((1000, 1000, 100), density=1e-4, random_state=2)
    ci, cj, ck = (jnp.asarray(np.asarray(t3.coords[i])) for i in range(3))
    tv = jnp.asarray(np.asarray(t3.data).astype(np.float32))
    C = jnp.asarray(rng.random((1000, 25), dtype=np.float32))
    D = jnp.asarray(rng.random((100, 25), dtype=np.float32))
    dt = device_bench(lambda a, b, c_, v, e, f: mttkrp(a, b, c_, v, e, f, n_rows=1000), (ci, cj, ck, tv, C, D))
    # two J-vectors read + one J-vector accumulated per entry + triplet
    mttkrp_bytes = t3.nnz * (3 * 25 * 4 + 16)
    rows_out.append(
        (
            "MTTKRP 1000x1000x100 J=25 @1e-4",
            f"{dt * 1e3:.2f} ms",
            f"{t3.nnz / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, mttkrp_bytes)}",
        )
    )

    # 4b. large MTTKRP (the BASELINE workload scale: 100k x 2k x 2k, 10M
    # nnz, J=32) — exact and the r4 hi|lo fast mode (44.7 vs 67.5 ms on
    # v5e, relerr 1.7e-6; docs/spmm_roofline.md "MTTKRP round-4 campaign")
    if on_tpu:
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
        mttL_bytes = linL.size * (2 * 32 * 4 + 16) + I_ * 32 * 4
        for mode in ("exact", "hilo"):
            dt = device_bench(
                lambda c_, d_, _m=mode: ell_mttkrp(erL, ejL, ekL, edL, c_, d_, n_rows=I_, strategy=_m),
                (CL, DL),
                iters=10,
            )
            rows_out.append(
                (
                    f"MTTKRP 100kx2kx2k J=32 10M nnz [{mode}]",
                    f"{dt * 1e3:.2f} ms",
                    f"{linL.size / dt / 1e6:.0f}M nnz/s, {_vs_sol(dt, mttL_bytes)}",
                )
            )
        del erL, ejL, ekL, edL, linL, ciL, cjL, ckL, tvL

    # 5. BSR pallas (TPU only)
    if on_tpu:
        nb = (8192 // 128) ** 2
        sel = rng.random(nb) < 0.25
        bi = (np.arange(nb) // 64)[sel].astype(np.int64) * 128
        bj = (np.arange(nb) % 64)[sel].astype(np.int64) * 128
        bsr = build_bsr(bi, bj, np.ones(int(sel.sum()), np.float32), (8192, 8192))
        stored = np.asarray(bsr.blocks)
        mask = stored.reshape(stored.shape[0], -1).sum(axis=1) > 0
        full = np.zeros_like(stored)
        full[mask] = rng.random((int(mask.sum()), 128, 128), dtype=np.float32)
        bsr = BSR(jnp.asarray(full), bsr.block_rows, bsr.block_cols, bsr.shape, bsr.block_shape)
        Bd = jnp.asarray(rng.random((8192, 512), dtype=np.float32))
        dt = device_bench(
            lambda br, bc, bl, b: bsr_spmm_pallas(br, bc, bl, b, n_rows=8192), (bsr.block_rows, bsr.block_cols, bsr.blocks, Bd)
        )
        fl = 2 * int(mask.sum()) * 128 * 128 * 512
        rows_out.append(("BSR Pallas 8192^2 25% blocks N=512", f"{dt * 1e3:.2f} ms", f"{fl / dt / 1e12:.1f} TFLOP/s"))

    # 6. banded / longformer attention (TPU flagship for serving)
    if on_tpu:
        from sparse_tpu.nn import banded_attention, longformer_attention

        La, Wa, Da = 8192, 256, 64
        qa = jnp.asarray(rng.standard_normal((La, Da)).astype(np.float32))
        # self-attention on the perturbed tensor: every gather input varies
        # per iteration (hoist-proof; see the LICM note in CLAUDE.md)
        dt = device_bench(lambda x: banded_attention(x, x, x, window=Wa), (qa,), iters=30)
        edges = La * (2 * Wa + 1) - Wa * (Wa + 1)
        rows_out.append(
            (f"banded attention L={La} W={Wa} d={Da}", f"{dt * 1e3:.2f} ms", f"{edges / dt / 1e9:.1f}G edges/s")
        )
        dt = device_bench(
            lambda x: longformer_attention(x, x, x, window=Wa, n_global=8), (qa,), iters=30
        )
        rows_out.append(("longformer attention (+8 global)", f"{dt * 1e3:.2f} ms", ""))
        dt = device_bench(
            lambda x: jax.nn.softmax((x @ x.T) / np.sqrt(Da), axis=-1) @ x, (qa,), iters=30
        )
        rows_out.append(("dense attention (same shapes)", f"{dt * 1e3:.2f} ms", ""))

    # 6c. general COO sparse attention, 2.1M irregular edges (r5 flagship:
    # ELL route + rebuilt scan softmax; see docs/spmm_roofline.md)
    if on_tpu:
        from sparse_tpu import nn as stnn

        Lg, Dg = 1 << 14, 64
        degs = np.clip(rng.poisson(128, size=Lg), 1, 192)
        rows_g = np.repeat(np.arange(Lg, dtype=np.int32), degs)
        cols_g = rng.integers(0, Lg, size=rows_g.size).astype(np.int32)
        order_g = np.lexsort((cols_g, rows_g))
        rows_g, cols_g = rows_g[order_g], cols_g[order_g]
        keys_g = rows_g.astype(np.int64) * Lg + cols_g
        uniq_g = np.concatenate([[True], np.diff(keys_g) > 0])
        rows_g, cols_g = rows_g[uniq_g], cols_g[uniq_g]
        nnz_g = rows_g.size
        qg = jnp.asarray(rng.standard_normal((Lg, Dg)).astype(np.float32))
        kg = jnp.asarray(rng.standard_normal((Lg, Dg)).astype(np.float32))
        vg = jnp.asarray(rng.standard_normal((Lg, Dg)).astype(np.float32))
        dt = device_bench(lambda x: stnn.sparse_attention(x, kg, vg, rows_g, cols_g), (qg,), iters=20)
        rows_out.append(
            (f"sparse attention e2e {nnz_g / 1e6:.1f}M edges d={Dg} (ELL route)", f"{dt * 1e3:.2f} ms", f"{nnz_g / dt / 1e6:.0f}M edges/s")
        )
        rows_gj = jnp.asarray(rows_g)
        scores_g = jnp.asarray(rng.standard_normal(nnz_g).astype(np.float32))
        dt = device_bench(lambda s: stnn.segment_softmax(s, rows_gj, n_rows=Lg), (scores_g,), iters=30)
        rows_out.append((f"segment softmax {nnz_g / 1e6:.1f}M edges (bwd-scan)", f"{dt * 1e3:.2f} ms", f"{nnz_g / dt / 1e6:.0f}M edges/s"))

    # 6b. block-sparse training step (fully kernelized VJP)
    if on_tpu:
        from sparse_tpu.nn import block_sparse_linear, init_block_sparse_linear

        p_lin = init_block_sparse_linear(jax.random.PRNGKey(0), 8192, 8192, block_density=0.25)
        xb = jnp.asarray(rng.standard_normal((512, 8192)).astype(np.float32))
        grad_fn = jax.grad(
            lambda blocks, x_: block_sparse_linear(p_lin._replace(blocks=blocks), x_, use_pallas=True).sum(),
            argnums=(0, 1),
        )
        def _train_step(x_):
            gb, gx = grad_fn(p_lin.blocks, x_)
            return gb.ravel()[0] + gx.ravel()[0]  # keep BOTH grads live

        dt = device_bench(_train_step, (xb,), iters=20)
        rows_out.append(("block_sparse_linear fwd+bwd 8192^2@25% b=512", f"{dt * 1e3:.2f} ms", ""))

    # 6c. whole-loop CG solve on a 5-point Laplacian (on-device solver)
    if on_tpu:
        from sparse_tpu import linalg

        side = 256
        n_l = side * side
        ii = np.arange(n_l)
        gi, gj = ii // side, ii % side
        rows_l = [ii]
        cols_l = [ii]
        vals_l = [np.full(n_l, 4.0, np.float32)]
        for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            ni, nj = gi + di, gj + dj
            ok = (0 <= ni) & (ni < side) & (0 <= nj) & (nj < side)
            rows_l.append(ii[ok])
            cols_l.append((ni * side + nj)[ok])
            vals_l.append(np.full(int(ok.sum()), -1.0, np.float32))
        lap = sparse.COO(
            np.stack([np.concatenate(rows_l), np.concatenate(cols_l)]),
            np.concatenate(vals_l),
            shape=(n_l, n_l),
        )
        b_l = jnp.asarray(rng.standard_normal(n_l).astype(np.float32))
        # eager call first: builds + caches the DIA layout and the memoized
        # solve program, which the traced device_bench loop then reuses
        _, _, it = linalg.cg(lap, b_l, tol=1e-5, maxiter=600, return_iters=True)
        dt = device_bench(
            lambda bb: linalg.cg(lap, bb, tol=1e-5, maxiter=600)[0], (b_l,), iters=3
        )
        n_it = max(int(it), 1)
        rows_out.append(
            (
                f"CG solve 5-pt Laplacian {side}x{side} (whole-loop jit)",
                f"{dt * 1e3:.1f} ms",
                f"{n_it} iters, {dt / n_it * 1e3:.2f} ms/iter",
            )
        )

    # 6b. csgraph: multi-source Bellman-Ford to convergence on device
    # (per-destination ELL relaxation — 1.6x the scatter segment-min form)
    from sparse_tpu.csgraph import (
        _bellman_ford_device_ell,
        _bellman_ford_device_ell_tail,
        _build_dest_ell,
    )

    n_g, e_g, k_src = 1 << 17, 1 << 20, 8
    g_rows = rng.integers(0, n_g, e_g)
    g_cols = rng.integers(0, n_g, e_g)
    g_w = rng.random(e_g) + 0.05
    e_src, e_w, tail, perm = _build_dest_ell(g_rows, g_cols, g_w, n_g, np.int32, np.float32)
    d0 = np.full((k_src, n_g), np.inf, np.float32)
    srcs = np.arange(k_src)
    if perm is not None:
        inv = np.empty(n_g, np.int64)
        inv[perm] = np.arange(n_g)
        d0[np.arange(k_src), inv[srcs]] = 0.0
    else:
        d0[np.arange(k_src), srcs] = 0.0
    if tail is not None:
        t_src, t_w = (jnp.asarray(t) for t in tail)
        dt = device_bench(
            lambda es, dd0, ew: _bellman_ford_device_ell_tail(
                es, ew, t_src, t_w, dd0, maxiter=64
            )[0],
            (jnp.asarray(e_src), jnp.asarray(d0), jnp.asarray(e_w)),
            iters=10,
        )
    else:
        dt = device_bench(
            lambda es, dd0, ew: _bellman_ford_device_ell(es, ew, dd0, maxiter=64)[0],
            (jnp.asarray(e_src), jnp.asarray(d0), jnp.asarray(e_w)),
            iters=10,
        )
    rows_out.append(
        (
            "Bellman-Ford 131k nodes 1M edges 8 sources (to fixpoint)",
            f"{dt * 1e3:.2f} ms",
            f"{e_g * k_src / dt / 1e6:.0f}M edge-relax/s/round-bound",
        )
    )

    # 7. host workloads
    a = sparse.random((100000, 100000), density=1e-5, random_state=3)
    b = sparse.random((100000, 100000), density=1e-5, random_state=4)
    dt = host_bench(lambda: a @ b)
    rows_out.append(("SpGEMM 100k^2 @1e-5 (eager host)", f"{dt * 1e3:.1f} ms", ""))
    e1 = sparse.random((10000, 10000), density=1e-3, random_state=5)
    e2 = sparse.random((10000, 10000), density=1e-3, random_state=6)
    dt = host_bench(lambda: e1 + e2)
    rows_out.append(("elemwise add 10k^2 @1e-3 (eager host)", f"{dt * 1e3:.1f} ms", ""))
    cr = rng.integers(0, 1 << 16, 3_000_000).astype(np.int64)
    cc = rng.integers(0, 1 << 16, 3_000_000).astype(np.int64)
    cv = rng.random(3_000_000)
    coords_c = np.stack([cr, cc])
    dt = host_bench(lambda: sparse.COO(coords_c, cv, shape=(1 << 16, 1 << 16)), iters=3)
    rows_out.append(("COO construction 3M entries (eager host)", f"{dt * 1e3:.0f} ms", ""))
    g1 = sparse.random((20000, 20000), density=1e-3, random_state=7, format="gcxs")
    Dm = rng.random((20000, 32))
    dt = host_bench(lambda: g1 @ Dm)
    rows_out.append(("eager SpMM gcxs 20k^2@1e-3 x (20k,32)", f"{dt * 1e3:.1f} ms", ""))

    w = max(len(r[0]) for r in rows_out)
    print(f"\n{'workload':<{w}}  {'time':>10}  throughput")
    for name, t, thr in rows_out:
        print(f"{name:<{w}}  {t:>10}  {thr}")


if __name__ == "__main__":
    main()
