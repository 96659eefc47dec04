"""TPU-backend smoke test: run every device kernel on the default backend
(the real TPU when available) at modest sizes against numpy oracles.

The CPU test suite validates semantics; this catches TPU-only lowering
regressions (Mosaic layout rules, VMEM limits, precision defaults).

    python scripts/tpu_smoke.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def check(name, got, expected, tol=1e-4):
    got = np.asarray(got, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    err = np.max(np.abs(got - expected) / (np.abs(expected).max() + 1e-30))
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name:44s} relerr {err:.2e}")
    return err < tol


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    ok = True

    M, K, N = 4096, 4096, 128
    lin = np.unique(rng.integers(0, M * K, size=200_000, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    data = rng.random(lin.size, dtype=np.float32)
    B = rng.random((K, N), dtype=np.float32)
    x = rng.random(K, dtype=np.float32)
    dense_a = np.zeros((M, K), dtype=np.float64)
    dense_a[rows, cols] = data

    from sparse_tpu.kernels import (
        build_block_ell,
        coo_spmm,
        coo_spmv,
        ell_spmm,
        ell_spmv,
        mttkrp,
        sddmm,
    )

    ell = build_block_ell(rows, cols, data, M, K)
    ok &= check("ell_spmm", ell_spmm(ell.e_rows, ell.e_cols, ell.e_data, jnp.asarray(B), n_rows=M), dense_a @ B)
    ok &= check("ell_spmv", ell_spmv(ell.e_rows, ell.e_cols, ell.e_data, jnp.asarray(x), n_rows=M), dense_a @ x)
    rj, cj, dj = jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(data)
    ok &= check("coo_spmm (segment)", coo_spmm(rj, cj, dj, jnp.asarray(B), n_rows=M), dense_a @ B)
    ok &= check("coo_spmv lane", coo_spmv(rj, cj, dj, jnp.asarray(x), n_rows=M, lane_gather=True), dense_a @ x)
    ok &= check("coo_spmv scalar", coo_spmv(rj, cj, dj, jnp.asarray(x), n_rows=M, lane_gather=False), dense_a @ x)

    from sparse_tpu.kernels import build_row_ell, row_ell_spmm, row_ell_spmv

    rell = build_row_ell(rows, cols, data, M, K)
    ok &= check("row_ell_spmm", row_ell_spmm(rell, jnp.asarray(B)), dense_a @ B)
    ok &= check("row_ell_spmv exact", row_ell_spmv(rell, jnp.asarray(x)), dense_a @ x)
    ok &= check("row_ell_spmv onehot", row_ell_spmv(rell, jnp.asarray(x), strategy="onehot"), dense_a @ x, tol=1e-3)
    ok &= check("row_ell_spmv onehot3", row_ell_spmv(rell, jnp.asarray(x), strategy="onehot3"), dense_a @ x, tol=1e-4)

    lhs = rng.random((M, 32), dtype=np.float32)
    rhs = rng.random((32, K), dtype=np.float32)
    exp_sddmm = data * (lhs @ rhs)[rows, cols]
    ok &= check("sddmm", sddmm(rj, cj, dj, jnp.asarray(lhs), jnp.asarray(rhs)), exp_sddmm, tol=1e-3)

    t_lin = np.unique(rng.integers(0, 500 * 60 * 40, size=20_000, dtype=np.int64))
    ti, tj, tk = (t_lin // (60 * 40)).astype(np.int32), ((t_lin // 40) % 60).astype(np.int32), (t_lin % 40).astype(np.int32)
    tv = rng.random(t_lin.size, dtype=np.float32)
    C = rng.random((60, 16), dtype=np.float32)
    D = rng.random((40, 16), dtype=np.float32)
    dense_t = np.zeros((500, 60, 40))
    dense_t[ti, tj, tk] = tv
    ok &= check(
        "mttkrp",
        mttkrp(jnp.asarray(ti), jnp.asarray(tj), jnp.asarray(tk), jnp.asarray(tv), jnp.asarray(C), jnp.asarray(D), n_rows=500),
        np.einsum("ijk,jr,kr->ir", dense_t, C, D),
        tol=1e-3,
    )

    # BSR Pallas forward + grad through the custom VJP
    from sparse_tpu.nn import block_sparse_linear, init_block_sparse_linear

    params = init_block_sparse_linear(jax.random.PRNGKey(0), 512, 512, block_density=0.5)
    xb = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32))
    y = block_sparse_linear(params, xb)
    # dense oracle of the block-sparse weight
    Wd = np.zeros((512, 512), dtype=np.float64)
    br, bc, bl = np.asarray(params.block_rows), np.asarray(params.block_cols), np.asarray(params.blocks, np.float64)
    for i in range(bl.shape[0]):
        Wd[br[i] * 128 : br[i] * 128 + 128, bc[i] * 128 : bc[i] * 128 + 128] += bl[i]
    ok &= check("block_sparse_linear fwd", y, np.asarray(xb, np.float64) @ Wd.T, tol=1e-3)
    g = jax.grad(lambda blocks: block_sparse_linear(params._replace(blocks=blocks), xb).sum())(params.blocks)
    ok &= check("block_sparse_linear grad finite", np.isfinite(np.asarray(g)).all(), True, tol=0.5)

    # attention family
    from sparse_tpu.nn import (
        banded_attention,
        bigbird_block_pattern,
        block_sparse_attention,
        local_attention_pattern,
        longformer_attention,
        sparse_attention,
    )

    L, dh = 1024, 64
    q = jnp.asarray(rng.standard_normal((L, dh)).astype(np.float32))
    W = 64
    arows, acols = local_attention_pattern(L, W, 2)
    mask = np.full((L, L), -np.inf, np.float32)
    mask[arows, acols] = 0
    s = np.asarray(q, np.float64) @ np.asarray(q, np.float64).T / np.sqrt(dh) + mask
    a = np.exp(s - s.max(1, keepdims=True))
    a /= a.sum(1, keepdims=True)
    exp_attn = a @ np.asarray(q, np.float64)
    ok &= check("sparse_attention (COO)", sparse_attention(q, q, q, jnp.asarray(arows), jnp.asarray(acols)), exp_attn, tol=5e-3)
    ok &= check("longformer_attention", longformer_attention(q, q, q, window=W, n_global=2), exp_attn, tol=5e-3)
    ids, valid = bigbird_block_pattern(L, block=128, n_window=1, n_random=1, n_global=1)
    out_bb = block_sparse_attention(q, q, q, jnp.asarray(ids), jnp.asarray(valid))
    ok &= check("block_sparse_attention finite", np.isfinite(np.asarray(out_bb)).all(), True, tol=0.5)
    wrows, wcols = local_attention_pattern(L, W)
    maskw = np.full((L, L), -np.inf, np.float32)
    maskw[wrows, wcols] = 0
    sw = np.asarray(q, np.float64) @ np.asarray(q, np.float64).T / np.sqrt(dh) + maskw
    aw = np.exp(sw - sw.max(1, keepdims=True))
    aw /= aw.sum(1, keepdims=True)
    ok &= check("banded_attention", banded_attention(q, q, q, window=W), aw @ np.asarray(q, np.float64), tol=5e-3)

    # traceable capacity-bounded ops
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    sa = np.unique(rng.integers(0, 300 * 200, size=3000, dtype=np.int64))
    ra, ca = (sa // 200).astype(np.int32), (sa % 200).astype(np.int32)
    va = rng.random(sa.size, dtype=np.float32)
    sb = np.unique(rng.integers(0, 200 * 250, size=3000, dtype=np.int64))
    rb, cb = (sb // 250).astype(np.int32), (sb % 250).astype(np.int32)
    vb = rng.random(sb.size, dtype=np.float32)
    P = product_count(ca, rb, 200) + 1
    orow, ocol, odat, onnz = esc_spgemm(
        jnp.asarray(ra), jnp.asarray(ca), jnp.asarray(va), jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(vb),
        k=200, n=250, product_capacity=P, out_capacity=P,
    )
    n_out = int(onnz)
    got = np.zeros((300, 250))
    got[np.asarray(orow)[:n_out], np.asarray(ocol)[:n_out]] = np.asarray(odat)[:n_out]
    da = np.zeros((300, 200)); da[ra, ca] = va
    db = np.zeros((200, 250)); db[rb, cb] = vb
    ok &= check("esc_spgemm (traceable)", got, da @ db, tol=1e-3)

    # csgraph device loops (min-plus relaxation / label propagation)
    import scipy.sparse as sps
    import scipy.sparse.csgraph as sp_csgraph

    from sparse_tpu import COO, csgraph, linalg

    gs = sps.random(1500, 1500, density=0.004, random_state=3, data_rvs=lambda k: rng.random(k).astype(np.float32) + 0.1)
    gs.setdiag(0)
    gs.eliminate_zeros()
    gcoo = COO.from_scipy_sparse(gs.tocoo())
    ref_d = sp_csgraph.dijkstra(gs.tocsr(), indices=[0, 5, 11])
    got_d = csgraph.dijkstra(gcoo, indices=np.array([0, 5, 11]))
    fin = np.isfinite(ref_d)
    ok &= check("csgraph bellman-ford dists", np.where(fin, got_d, 0), np.where(fin, ref_d, 0), tol=1e-4)
    ok &= check("csgraph reach mask", np.isfinite(got_d), fin, tol=0.5)
    rn, rl = sp_csgraph.connected_components(gs.tocsr(), connection="weak")
    gn, gl = csgraph.connected_components(gcoo, connection="weak")
    ok &= check("csgraph components", np.array([gn] + list(gl)), np.array([rn] + list(rl)), tol=0.5)

    # linalg whole-loop solvers on device (f32)
    lap = sp_csgraph.laplacian((gs + gs.T).tocsr()).tocoo()
    Asolve = COO.from_scipy_sparse((lap + 0.5 * sps.eye(1500)).tocoo().astype(np.float32))
    bvec = rng.random(1500, dtype=np.float32)
    # expected vector is [1, 1] so the relative-error check is meaningful
    # (info and residual are shifted by 1: converged == exactly 1.0)
    xs, info = linalg.cg(Asolve, jnp.asarray(bvec), tol=1e-5)
    res = np.asarray(sparse_residual(Asolve, xs, bvec))
    ok &= check("linalg.cg f32 solve", np.array([1.0 + float(info), 1.0 + res]), np.array([1.0, 1.0]), tol=2e-4)
    xg, infog = linalg.gmres(Asolve, jnp.asarray(bvec), tol=1e-4, restart=30)
    resg = np.asarray(sparse_residual(Asolve, xg, bvec))
    ok &= check("linalg.gmres f32 solve", np.array([1.0 + float(infog), 1.0 + resg]), np.array([1.0, 1.0]), tol=2e-3)
    evals, _ = linalg.eigsh(Asolve, k=2, ncv=40)
    ref_ev = np.sort(spla_eigsh_top2(lap, 0.5))
    print("    eigsh got", np.asarray(evals), "ref", ref_ev)
    ok &= check("linalg.eigsh f32", np.asarray(evals), ref_ev, tol=1e-2)
    xc, infoc = linalg.cgs(Asolve, jnp.asarray(bvec), tol=1e-5)
    resc = np.asarray(sparse_residual(Asolve, xc, bvec))
    ok &= check("linalg.cgs f32 solve", np.array([1.0 + float(infoc), 1.0 + resc]), np.array([1.0, 1.0]), tol=2e-4)
    xt, infot = linalg.tfqmr(Asolve, jnp.asarray(bvec), tol=1e-5)
    rest = np.asarray(sparse_residual(Asolve, xt, bvec))
    ok &= check("linalg.tfqmr f32 solve", np.array([1.0 + float(infot), 1.0 + rest]), np.array([1.0, 1.0]), tol=2e-4)
    xl, infol = linalg.lsmr(Asolve, jnp.asarray(bvec), tol=1e-5)
    resl = np.asarray(sparse_residual(Asolve, xl, bvec))
    ok &= check("linalg.lsmr f32 solve", np.array([1.0 + float(infol), 1.0 + resl]), np.array([1.0, 1.0]), tol=2e-3)
    xb, infob = linalg.bicg(Asolve, jnp.asarray(bvec), tol=1e-5)
    resb = np.asarray(sparse_residual(Asolve, xb, bvec))
    ok &= check("linalg.bicg f32 solve", np.array([1.0 + float(infob), 1.0 + resb]), np.array([1.0, 1.0]), tol=2e-4)
    xlg, infolg = linalg.lgmres(Asolve, jnp.asarray(bvec), tol=1e-4, inner_m=20, outer_k=3)
    reslg = np.asarray(sparse_residual(Asolve, xlg, bvec))
    ok &= check("linalg.lgmres f32 solve", np.array([1.0 + float(infolg), 1.0 + reslg]), np.array([1.0, 1.0]), tol=2e-3)
    xgc, infogc = linalg.gcrotmk(Asolve, jnp.asarray(bvec), tol=1e-4, m=20, k=10)
    resgc = np.asarray(sparse_residual(Asolve, xgc, bvec))
    ok &= check("linalg.gcrotmk f32 solve", np.array([1.0 + float(infogc), 1.0 + resgc]), np.array([1.0, 1.0]), tol=2e-3)

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


def sparse_residual(A, x, b):
    """||Ax - b|| / ||b|| via the dense oracle on host."""
    Ad = A.todense().astype(np.float64)
    return np.linalg.norm(Ad @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)


def spla_eigsh_top2(lap, shift):
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    shifted = (lap + shift * sps.eye(lap.shape[0])).tocsr()
    return spla.eigsh(shifted, k=2, return_eigenvectors=False)


if __name__ == "__main__":
    main()
