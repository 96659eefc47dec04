"""TPU-native iterative solvers (sparse_tpu.linalg) vs scipy/dense oracles.

Role: the reference relies on scipy.sparse.linalg duck-typing
(`sparse/tests/test_backends.py:77-209`); here the solvers are whole-loop
jitted device programs over sparse pytrees.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax

import sparse_tpu as sparse
from sparse_tpu import linalg
from sparse_tpu.core.gcxs import GCXS


@pytest.fixture
def spd():
    rng = np.random.default_rng(0)
    n = 80
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1)
    dense = B @ B.T + n * np.eye(n)
    return sparse.COO.from_numpy(dense), dense


def test_cg_matches_scipy(spd):
    A, dense = spd
    rng = np.random.default_rng(1)
    b = rng.standard_normal(dense.shape[0])
    x, info = linalg.cg(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    x_sp, info_sp = spla.cg(dense, b, rtol=1e-10)
    assert info_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


def test_cg_jacobi_preconditioner_and_gcxs(spd):
    A, dense = spd
    b = np.random.default_rng(2).standard_normal(dense.shape[0])
    g = GCXS.from_coo(A)
    x, info = linalg.cg(g, b, M=np.diag(dense), tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_cg_whole_loop_jits(spd):
    A, dense = spd
    b = np.random.default_rng(3).standard_normal(dense.shape[0])
    f = jax.jit(lambda A_, b_: linalg.cg(A_, b_, tol=1e-10)[0])
    np.testing.assert_allclose(np.asarray(f(A, b)), np.linalg.solve(dense, b), rtol=1e-6)


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(4)
    n = 60
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = M + n * np.eye(n)  # diagonally dominant, nonsymmetric
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.bicgstab(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_cg_traced_then_eager_no_tracer_leak(spd):
    # regression: the block-ELL auto-upgrade used to build (and cache) the
    # layout while under an outer jit trace, leaking tracers into the COO's
    # cache; the next eager call then raised UnexpectedTracerError
    A, dense = spd
    b = np.random.default_rng(6).standard_normal(dense.shape[0])
    f = jax.jit(lambda b_: linalg.cg(A, b_, tol=1e-10)[0])
    x1 = f(b)
    x2, info = linalg.cg(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x1), np.linalg.solve(dense, b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x2), np.linalg.solve(dense, b), rtol=1e-6)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(7)
    n = 60
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = M + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.gmres(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    x_sp, info_sp = spla.gmres(dense, b, rtol=1e-10)
    assert info_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


def test_gmres_restart_and_preconditioner():
    rng = np.random.default_rng(8)
    n = 100
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1)
    dense = M + 4 * n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    # small restart forces multiple outer cycles; Jacobi preconditioner
    x, info = linalg.gmres(A, b, restart=8, M=np.diag(dense), tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_gmres_whole_loop_jits_and_matrix_free():
    rng = np.random.default_rng(9)
    n = 50
    dense = rng.standard_normal((n, n)) * 0.1 + n * np.eye(n)
    b = rng.standard_normal(n)
    dense_j = np.asarray(dense)
    mv = lambda v: dense_j @ v
    f = jax.jit(lambda b_: linalg.gmres(mv, b_, tol=1e-10)[0])
    np.testing.assert_allclose(np.asarray(f(b)), np.linalg.solve(dense, b), rtol=1e-6)


def test_gmres_converged_start_is_noop():
    rng = np.random.default_rng(10)
    n = 30
    dense = rng.standard_normal((n, n)) * 0.1 + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x_exact = np.linalg.solve(dense, b)
    x, info = linalg.gmres(A, b, x0=x_exact, tol=1e-8)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), x_exact, rtol=1e-10)


def test_zero_fill_memo_keyed_on_fill_value(spd):
    # regression: the zero-fill check memo survived GCXS's shallow-copy
    # constructor, letting a nonzero-fill matmul silently compute garbage
    A, dense = spd
    g = GCXS.from_coo(A)
    b = np.ones(dense.shape[0])
    g @ b  # seeds the memo with fill 0.0
    g2 = GCXS(g, fill_value=1.0)
    with pytest.raises(ValueError, match="fill value"):
        g2 @ b


def test_eigsh_degenerate_spectrum():
    # regression: a single zero-padded Lanczos build reported spurious ~0
    # eigenvalues when the Krylov space broke down early (multiplicity)
    A = sparse.COO.from_numpy(np.eye(10))
    vals, vecs = linalg.eigsh(A, k=2)
    np.testing.assert_allclose(np.asarray(vals), [1.0, 1.0], rtol=1e-10)
    # eigenvectors orthonormal and valid
    V = np.asarray(vecs)
    np.testing.assert_allclose(V.T @ V, np.eye(2), atol=1e-8)
    # repeated dominant eigenvalue in a non-trivial matrix
    D = np.diag([5.0, 5.0, 2.0, 1.0, 0.5, 0.25])
    vals2, _ = linalg.eigsh(sparse.COO.from_numpy(D), k=3)
    np.testing.assert_allclose(np.asarray(vals2), [2.0, 5.0, 5.0], rtol=1e-9)


def test_eigsh_clustered_spectrum_default_budget():
    # regression: the fixed-budget Lanczos silently returned Ritz values
    # ~1.5% off on the clustered 2-D Poisson spectrum; the residual-gated
    # restarts with adaptive budget doubling converge it
    side = 20
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows, cols, vals = [np.arange(n)], [np.arange(n)], [np.full(n, 4.0)]
    for di, dj in ((0, 1), (1, 0)):
        a = idx[: side - di, : side - dj].ravel()
        bb = idx[di:, dj:].ravel()
        rows += [a, bb]
        cols += [bb, a]
        vals += [np.full(a.size, -1.0)] * 2
    A = sparse.COO(
        np.stack([np.concatenate(rows), np.concatenate(cols)]), np.concatenate(vals), shape=(n, n)
    )
    got, _ = linalg.eigsh(A, k=4)
    ref = np.sort(np.linalg.eigvalsh(A.todense()))[-4:]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-8)


def test_eigsh_tiny_spectral_norm():
    # regression: the acceptance threshold had a 1.0 scale floor, making it
    # absolute — matrices with spectral norm << 1 accepted restart-0 Ritz
    # garbage at huge relative error
    rng = np.random.default_rng(30)
    n = 60
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    spd = (B @ B.T + n * np.eye(n)) * 1e-8
    A = sparse.COO.from_numpy(spd)
    vals, _ = linalg.eigsh(A, k=3)
    ref = np.sort(np.linalg.eigvalsh(spd))[-3:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-7)


def test_eigsh_interior_competitor_f32():
    # regression (captured from the TPU smoke): an isolated interior
    # eigenvalue (1.35) converges before the clustered second-top (17.26);
    # the restart loop must keep going while an unconverged Ritz candidate
    # beats the current k-th selected value, not stop at "k accepted"
    import os

    import scipy.sparse as sps

    path = os.path.join(os.path.dirname(__file__), "data", "eigsh_f32_interior_competitor.npz")
    S = sps.load_npz(path)
    A = sparse.COO.from_scipy_sparse(S.tocoo())
    assert A.dtype == np.float32
    vals, _ = linalg.eigsh(A, k=2, ncv=40)
    ref = np.sort(np.linalg.eigvalsh(S.toarray().astype(np.float64)))[-2:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-4)


def test_gmres_true_residual_termination():
    # regression: the GMRES-identity residual estimate undershot the true
    # residual by ~7x at small restarts, exiting with info!=0 at residuals
    # just above target; the loop now carries the true residual
    rng = np.random.default_rng(0)
    import scipy.sparse as sps

    for seed, nn, restart in [(1, 16, 11), (2, 76, 9), (3, 108, 10)]:
        g = sps.random(nn, nn, density=0.1, random_state=seed)
        g.setdiag(0)
        g.eliminate_zeros()
        g.data = rng.random(g.nnz) + 0.05
        und = g.maximum(g.T)
        spd = (und + (abs(und).sum(axis=1).max() + 1.0) * sps.eye(nn)).tocsr()
        As = sparse.COO.from_scipy_sparse(spd.tocoo())
        b = rng.standard_normal(nn)
        x, info = linalg.gmres(As, b, tol=1e-9, restart=restart)
        assert int(info) == 0
        np.testing.assert_allclose(spd @ np.asarray(x), b, atol=1e-8 * max(np.abs(b).max(), 1))


def test_svds_k_validation():
    A = sparse.random((10, 3), density=0.5, random_state=0)
    with pytest.raises(ValueError, match="k must be"):
        linalg.svds(A, k=6)
    with pytest.raises(ValueError, match="k must be"):
        linalg.svds(A, k=3)


def test_norm_spectral(spd):
    import scipy.sparse.linalg as spla2

    A, dense = spd
    got = linalg.norm(A, 2)
    ref = np.linalg.norm(dense, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-8)
    s = A.to_scipy_sparse().tocsr()
    np.testing.assert_allclose(got, spla2.norm(s, 2), rtol=1e-7)


def test_eigsh_matches_scipy(spd):
    A, dense = spd
    vals, vecs = linalg.eigsh(A, k=4)
    ref = np.sort(np.linalg.eigvalsh(dense))[-4:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-8)
    # Ritz vectors: A v = lambda v
    for i in range(4):
        v = np.asarray(vecs[:, i])
        np.testing.assert_allclose(dense @ v, float(vals[i]) * v, rtol=1e-6, atol=1e-8)
    vals_sp = spla.eigsh(dense, k=4, return_eigenvectors=False)
    np.testing.assert_allclose(np.asarray(vals), np.sort(vals_sp), rtol=1e-7)


def test_eigsh_smallest(spd):
    A, dense = spd
    vals, _ = linalg.eigsh(A, k=3, which="SA", ncv=dense.shape[0])
    ref = np.sort(np.linalg.eigvalsh(dense))[:3]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-7)


def test_eigsh_largest_magnitude_indefinite():
    rng = np.random.default_rng(11)
    n = 60
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    dense = (B + B.T) / 2  # symmetric indefinite
    A = sparse.COO.from_numpy(dense)
    vals, _ = linalg.eigsh(A, k=3, which="LM", ncv=n)
    ew = np.linalg.eigvalsh(dense)
    ref = np.sort(ew[np.argsort(np.abs(ew))[-3:]])
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-7)


def test_svds_matches_scipy():
    rng = np.random.default_rng(12)
    m, n = 80, 50
    dense = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.15)
    A = sparse.COO.from_numpy(dense)
    U, s, Vh = linalg.svds(A, k=3, ncv=n)
    ref = np.sort(np.linalg.svd(dense, compute_uv=False))[-3:]
    np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-7)
    # factorization property on the leading triplets
    for i in range(3):
        np.testing.assert_allclose(
            dense @ np.asarray(Vh[i]),
            float(s[i]) * np.asarray(U[:, i]),
            rtol=1e-6,
            atol=1e-8,
        )


def test_eigsh_gcxs_and_validation(spd):
    A, dense = spd
    g = GCXS.from_coo(A)
    vals, _ = linalg.eigsh(g, k=2)
    ref = np.sort(np.linalg.eigvalsh(dense))[-2:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-8)
    with pytest.raises(ValueError, match="k must be"):
        linalg.eigsh(A, k=dense.shape[0])
    with pytest.raises(ValueError, match="which"):
        linalg.eigsh(A, k=2, which="XX")


def test_lobpcg_top_eigenpairs(spd):
    A, dense = spd
    vals, vecs, iters = linalg.lobpcg(A, k=3, maxiter=200)
    ref = np.sort(np.linalg.eigvalsh(dense))[-3:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-6)
    for i in range(3):
        v = np.asarray(vecs[:, i])
        np.testing.assert_allclose(dense @ v, float(vals[i]) * v, rtol=1e-4, atol=1e-6)
    with pytest.raises(ValueError, match="lobpcg requires"):
        linalg.lobpcg(A, k=dense.shape[0])


def test_minres_symmetric_indefinite():
    rng = np.random.default_rng(23)
    n = 70
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    w, V = np.linalg.eigh((B + B.T) / 2)
    w = np.sign(w) * (np.abs(w) + 2.0)  # indefinite, bounded away from 0
    dense = (V * w) @ V.T
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.minres(A, b, tol=1e-11)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-7)
    x_sp, i_sp = spla.minres(dense, b, rtol=1e-11)
    assert i_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


def test_minres_spd_agrees_with_cg(spd):
    A, dense = spd
    b = np.random.default_rng(24).standard_normal(dense.shape[0])
    xm, im = linalg.minres(A, b, tol=1e-10)
    xc, ic = linalg.cg(A, b, tol=1e-10)
    assert int(im) == 0 and int(ic) == 0
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xc), rtol=1e-6)


def test_lsqr_overdetermined():
    rng = np.random.default_rng(21)
    m, n = 120, 40
    dense = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.2)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(m)
    x, info = linalg.lsqr(A, b, tol=1e-12)
    assert int(info) == 0
    ref, *_ = np.linalg.lstsq(dense, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-7, atol=1e-10)
    x_sp = spla.lsqr(scipy_csr_rect(dense), b, atol=1e-12, btol=1e-12)[0]
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5, atol=1e-8)


def scipy_csr_rect(dense):
    import scipy.sparse

    return scipy.sparse.csr_matrix(dense)


def test_lsqr_consistent_square(spd):
    A, dense = spd
    b = np.random.default_rng(22).standard_normal(dense.shape[0])
    x, info = linalg.lsqr(A, b, tol=1e-12)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_expm_multiply_matches_scipy():
    rng = np.random.default_rng(13)
    n = 60
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1) * 0.3
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    got = linalg.expm_multiply(A, b, m=n)
    ref = spla.expm_multiply(scipy_csr(dense), b)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-8)
    # scaled time, truncated Krylov
    got_t = linalg.expm_multiply(A, b, t=0.5, m=40)
    ref_t = spla.expm_multiply(0.5 * scipy_csr(dense), b)
    np.testing.assert_allclose(np.asarray(got_t), ref_t, rtol=1e-6)


def test_expm_multiply_long_krylov_stays_orthogonal():
    # regression: single-pass classical Gram-Schmidt lost orthogonality by
    # m≈80 on a graph Laplacian and exp(tH) blew up by 1e15; CGS2 holds
    import scipy.sparse as sps

    from sparse_tpu import csgraph

    g = sps.random(200, 200, density=0.04, random_state=5)
    g = g.maximum(g.T)
    L = csgraph.laplacian(sparse.COO.from_scipy_sparse(g.tocoo()))
    sig = np.random.default_rng(0).standard_normal(200)
    got = linalg.expm_multiply(L, sig, t=-1.0, m=80)
    ref = spla.expm_multiply(-1.0 * L.to_scipy_sparse().tocsr(), sig)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-10)


def scipy_csr(dense):
    import scipy.sparse

    return scipy.sparse.csr_matrix(dense)


def test_norm_matches_scipy():
    rng = np.random.default_rng(14)
    dense = rng.standard_normal((40, 30)) * (rng.random((40, 30)) < 0.2)
    A = sparse.COO.from_numpy(dense)
    s = scipy_csr(dense)
    np.testing.assert_allclose(linalg.norm(A), spla.norm(s))
    np.testing.assert_allclose(linalg.norm(A, 1), spla.norm(s, 1))
    np.testing.assert_allclose(linalg.norm(A, np.inf), spla.norm(s, np.inf))
    np.testing.assert_allclose(linalg.norm(A, 1, axis=0), spla.norm(s, 1, axis=0))
    np.testing.assert_allclose(linalg.norm(A, np.inf, axis=1), spla.norm(s, np.inf, axis=1))
    with pytest.raises(ValueError, match="zero fill"):
        linalg.norm(sparse.full((3, 3), 1.0))


def test_spsolve_bridge(spd):
    A, dense = spd
    b = np.random.default_rng(15).standard_normal(dense.shape[0])
    x = linalg.spsolve(A, b)
    np.testing.assert_allclose(x, np.linalg.solve(dense, b), rtol=1e-8)
    g = GCXS.from_coo(A)
    np.testing.assert_allclose(linalg.spsolve(g, b), x, rtol=1e-10)


def test_power_iteration_dominant_pair():
    rng = np.random.default_rng(5)
    n = 70
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    dense = B @ B.T
    A = sparse.COO.from_numpy(dense)
    lam, v, it = linalg.power_iteration(A, tol=1e-12, maxiter=5000)
    w = np.linalg.eigvalsh(dense)
    np.testing.assert_allclose(float(lam), w[-1], rtol=1e-6)
    np.testing.assert_allclose(dense @ np.asarray(v), float(lam) * np.asarray(v), rtol=1e-4, atol=1e-6)


def test_matrix_free_operator():
    n = 50
    diag = np.linspace(1.0, 2.0, n)
    x, info = linalg.cg(lambda v: diag * v, np.ones(n), tol=1e-12, maxiter=200)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), 1.0 / diag, rtol=1e-8)


def test_cg_with_mesh_sharded_matrix():
    # the matrix lives sharded across an 8-device mesh; the CG loop runs
    # on the replicated vector with a sharded matvec
    from sparse_tpu import parallel

    rng = np.random.default_rng(7)
    n = 64
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = B @ B.T + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    mesh = parallel.make_mesh(8)
    p = parallel.partition_coo_rows(A, 8, mesh=mesh)
    mv = linalg.partitioned_matvec(p, mesh)
    b = rng.standard_normal(n)
    x, info = linalg.cg(mv, b, tol=1e-10, maxiter=500)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    lam, v, _ = linalg.power_iteration(mv, tol=1e-12, maxiter=5000)
    np.testing.assert_allclose(float(lam), np.linalg.eigvalsh(dense)[-1], rtol=1e-6)


# ---------------------------------------------------------------------------
# transpose-free Krylov, LSMR, LinearOperator, and the host bridges
# ---------------------------------------------------------------------------


@pytest.fixture
def nonsym():
    rng = np.random.default_rng(10)
    n = 60
    B = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = B + n * np.eye(n)  # diagonally dominant -> well-conditioned
    return sparse.COO.from_numpy(dense), dense


def test_cgs_matches_dense_solve(nonsym):
    A, dense = nonsym
    rng = np.random.default_rng(11)
    b = rng.standard_normal(dense.shape[0])
    x, info = linalg.cgs(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_tfqmr_matches_dense_solve(nonsym):
    A, dense = nonsym
    rng = np.random.default_rng(12)
    b = rng.standard_normal(dense.shape[0])
    x, info = linalg.tfqmr(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_cgs_tfqmr_under_jit(nonsym):
    A, dense = nonsym
    b = np.ones(dense.shape[0])

    @jax.jit
    def solve(A, b):
        x1, _ = linalg.cgs(A, b, tol=1e-9, maxiter=500)
        x2, _ = linalg.tfqmr(A, b, tol=1e-9, maxiter=500)
        return x1, x2

    x1, x2 = solve(A, b)
    ref = np.linalg.solve(dense, b)
    np.testing.assert_allclose(np.asarray(x1), ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), ref, rtol=1e-5)


@pytest.mark.parametrize("shape", [(80, 50), (50, 50)])
def test_lsmr_least_squares(shape):
    rng = np.random.default_rng(13)
    m, n = shape
    dense = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
    dense += np.eye(m, n)  # full column rank
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(m)
    x, info = linalg.lsmr(A, b, tol=1e-12)
    assert int(info) == 0
    ref, *_ = np.linalg.lstsq(dense, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-6, atol=1e-8)


def test_lsmr_matches_scipy(nonsym):
    A, dense = nonsym
    b = np.ones(dense.shape[0])
    x, info = linalg.lsmr(A, b, tol=1e-12)
    ref = spla.lsmr(dense, b, atol=1e-12, btol=1e-12)[0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-6, atol=1e-8)


def test_linearoperator_matvec_rmatvec(nonsym):
    A, dense = nonsym
    op = linalg.aslinearoperator(A)
    v = np.arange(dense.shape[1], dtype=np.float64)
    np.testing.assert_allclose(np.asarray(op.matvec(v)), dense @ v, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(op.rmatvec(v)), dense.T @ v, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(op.T.matvec(v)), dense.T @ v, rtol=1e-10)
    # solvers accept the operator directly
    b = np.ones(dense.shape[0])
    x, info = linalg.gmres(op, b, tol=1e-10, restart=30)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-5)
    x2, info2 = linalg.lsmr(op, b, tol=1e-10)
    np.testing.assert_allclose(np.asarray(x2), np.linalg.solve(dense, b), rtol=1e-5)


def test_linearoperator_matrix_free():
    n = 30
    d = np.arange(1, n + 1, dtype=np.float64)
    op = linalg.LinearOperator((n, n), lambda x: d * x, lambda x: d * x)
    b = np.ones(n)
    x, info = linalg.cg(op, b, tol=1e-12)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), 1.0 / d, rtol=1e-8)


def test_onenormest_matches_exact():
    for seed in (0, 1, 2, 3):
        rng = np.random.default_rng(seed)
        dense = rng.standard_normal((40, 40)) * (rng.random((40, 40)) < 0.2)
        A = sparse.COO.from_numpy(dense)
        exact = np.abs(dense).sum(axis=0).max()
        est = linalg.onenormest(A, t=4)
        assert est <= exact * (1 + 1e-10)
        assert est >= 0.5 * exact  # Higham-Tisseur is near-exact in practice
    # and exact on this fixed instance
    np.testing.assert_allclose(linalg.onenormest(A, t=8, itmax=8), exact, rtol=1e-12)


def test_inv_expm_bridges():
    rng = np.random.default_rng(14)
    n = 25
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2) + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    got = linalg.inv(A)
    assert isinstance(got, sparse.COO)
    np.testing.assert_allclose(got.todense(), np.linalg.inv(dense), rtol=1e-8, atol=1e-10)
    B = sparse.COO.from_numpy(dense / n)
    import scipy.linalg

    got_e = linalg.expm(B)
    assert isinstance(got_e, sparse.COO)
    np.testing.assert_allclose(got_e.todense(), scipy.linalg.expm(dense / n), rtol=1e-8, atol=1e-10)


def test_matrix_power():
    rng = np.random.default_rng(15)
    dense = (rng.random((20, 20)) < 0.15) * rng.standard_normal((20, 20))
    A = sparse.COO.from_numpy(dense)
    for p in (0, 1, 2, 3, 5):
        got = linalg.matrix_power(A, p)
        np.testing.assert_allclose(got.todense(), np.linalg.matrix_power(dense, p), rtol=1e-10, atol=1e-12)
    with pytest.raises(ValueError):
        linalg.matrix_power(A, -1)


def test_spsolve_triangular_bridge():
    rng = np.random.default_rng(16)
    n = 30
    dense = np.tril(rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3)) + 2 * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x = linalg.spsolve_triangular(A, b, lower=True)
    np.testing.assert_allclose(x, np.linalg.solve(dense, b), rtol=1e-10)


def test_splu_spilu_factorized(spd):
    A, dense = spd
    b = np.arange(dense.shape[0], dtype=np.float64)
    lu = linalg.splu(A)
    np.testing.assert_allclose(lu.solve(b), np.linalg.solve(dense, b), rtol=1e-8)
    np.testing.assert_allclose(linalg.factorized(A)(b), np.linalg.solve(dense, b), rtol=1e-8)
    # L/U constituents come back as sparse arrays
    assert isinstance(lu.L, sparse.COO) and isinstance(lu.U, sparse.COO)
    # spilu factors solve approximately (preconditioner quality)
    ilu = linalg.spilu(A, drop_tol=1e-8)
    np.testing.assert_allclose(ilu.solve(b), np.linalg.solve(dense, b), rtol=1e-4)


def test_eigs_dominant_real():
    rng = np.random.default_rng(20)
    n = 60
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    dense += np.diag(np.linspace(1.0, 30.0, n))  # well-separated dominant reals
    A = sparse.COO.from_numpy(dense)
    w, X = linalg.eigs(A, k=3, which="LM", ncv=30, tol=1e-8)
    ref = np.linalg.eigvals(dense)
    ref = ref[np.argsort(-np.abs(ref))][:3]
    np.testing.assert_allclose(np.sort(np.abs(w)), np.sort(np.abs(ref)), rtol=1e-6)
    # Ritz residuals
    for i in range(3):
        r = dense @ X[:, i] - w[i] * X[:, i]
        assert np.linalg.norm(r) < 1e-5 * abs(w[i])


def test_eigs_complex_pair():
    # rotation-like block embedded in a diagonal matrix -> complex pair
    n = 40
    dense = np.diag(np.linspace(0.1, 1.0, n))
    dense[0, 1] = -5.0
    dense[1, 0] = 5.0
    dense[0, 0] = dense[1, 1] = 2.0
    A = sparse.COO.from_numpy(dense)
    w, X = linalg.eigs(A, k=2, which="LM", ncv=20, tol=1e-9)
    ref = np.linalg.eigvals(dense)
    ref = ref[np.argsort(-np.abs(ref))][:2]
    np.testing.assert_allclose(np.sort_complex(w), np.sort_complex(ref), rtol=1e-7)
    assert np.abs(w.imag).max() > 1.0  # genuinely complex


def test_eigs_which_smallest_real():
    rng = np.random.default_rng(21)
    n = 50
    d = np.linspace(-10.0, 10.0, n)
    dense = np.diag(d) + rng.standard_normal((n, n)) * 0.01 * (rng.random((n, n)) < 0.1)
    A = sparse.COO.from_numpy(dense)
    w, _ = linalg.eigs(A, k=2, which="SR", ncv=40, maxiter=30, tol=1e-6)
    ref = np.linalg.eigvals(dense)
    np.testing.assert_allclose(np.sort(w.real), np.sort(ref.real)[:2], rtol=1e-3)


def test_eigsh_shift_invert_matches_scipy():
    # interior/smallest eigenvalues of the 1-D Laplacian via sigma
    n = 80
    dense = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    A = sparse.COO.from_numpy(dense)
    ref = np.sort(np.linalg.eigvalsh(dense))
    w, X = linalg.eigsh(A, k=3, sigma=0.0, ncv=30)
    np.testing.assert_allclose(np.asarray(w), ref[:3], rtol=1e-8)
    # residuals of the returned pairs
    for i in range(3):
        x = np.asarray(X[:, i])
        r = dense @ x - float(w[i]) * x
        assert np.linalg.norm(r) < 1e-6
    # interior target: eigenvalues nearest 0.9 (1.0 is exactly an
    # eigenvalue of this operator -> singular shift)
    w_i, _ = linalg.eigsh(A, k=2, sigma=0.9, ncv=40)
    nearest = ref[np.argsort(np.abs(ref - 0.9))][:2]
    np.testing.assert_allclose(np.sort(np.asarray(w_i)), np.sort(nearest), rtol=1e-8)
    ref_sp = spla.eigsh(dense, k=2, sigma=0.9, return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(np.asarray(w_i)), np.sort(ref_sp), rtol=1e-8)


def test_eigs_shift_invert():
    rng = np.random.default_rng(22)
    n = 60
    dense = np.diag(np.linspace(0.5, 30.0, n)) + rng.standard_normal((n, n)) * 0.05 * (
        rng.random((n, n)) < 0.1
    )
    A = sparse.COO.from_numpy(dense)
    w, _ = linalg.eigs(A, k=2, sigma=5.0, ncv=30)
    ref = np.linalg.eigvals(dense)
    nearest = ref[np.argsort(np.abs(ref - 5.0))][:2]
    np.testing.assert_allclose(np.sort(w.real), np.sort(nearest.real), rtol=1e-6)
    with pytest.raises(ValueError):
        linalg.eigs(A, k=2, sigma=5.0, which="SR")


def test_qmr_matches_dense_solve(nonsym):
    A, dense = nonsym
    rng = np.random.default_rng(23)
    b = rng.standard_normal(dense.shape[0])
    x, info = linalg.qmr(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    ref, ref_info = spla.qmr(dense, b, rtol=1e-10)
    assert ref_info == 0
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-5)


def test_qmr_spd(spd):
    A, dense = spd
    b = np.ones(dense.shape[0])
    x, info = linalg.qmr(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_bicg_nonsymmetric():
    rng = np.random.default_rng(21)
    n = 60
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = M + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.bicg(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    x_sp, info_sp = spla.bicg(dense, b, rtol=1e-10)
    assert info_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


@pytest.mark.parametrize("kw", [{}, {"inner_m": 8, "outer_k": 2}])
def test_lgmres_nonsymmetric(kw):
    rng = np.random.default_rng(22)
    n = 60
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = M + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.lgmres(A, b, tol=1e-10, **kw)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    x_sp, info_sp = spla.lgmres(dense, b, rtol=1e-10)
    assert info_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


def test_lgmres_jacobi_preconditioner(spd):
    A, dense = spd
    b = np.ones(dense.shape[0])
    x, info = linalg.lgmres(A, b, M=np.diag(dense), tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)


def test_lgmres_augmentation_beats_plain_restart():
    # a matrix engineered to cycle plain GMRES(m) at small m: the augmented
    # corrections must still converge within the outer budget
    rng = np.random.default_rng(23)
    n = 80
    S = np.eye(n) + 0.6 * np.triu(rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.12), 1)
    A = sparse.COO.from_numpy(S)
    b = rng.standard_normal(n)
    x, info = linalg.lgmres(A, b, inner_m=6, outer_k=3, tol=1e-10, maxiter=200)
    assert int(info) == 0
    np.testing.assert_allclose(S @ np.asarray(x), b, atol=1e-7)


@pytest.mark.parametrize("kw", [{}, {"m": 8, "k": 4}])
def test_gcrotmk_nonsymmetric(kw):
    rng = np.random.default_rng(24)
    n = 60
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    dense = M + n * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x, info = linalg.gcrotmk(A, b, tol=1e-10, **kw)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), rtol=1e-6)
    x_sp, info_sp = spla.gcrotmk(dense, b, rtol=1e-10)
    assert info_sp == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-5)


def test_gcrotmk_recycling_small_m():
    rng = np.random.default_rng(25)
    n = 80
    S = np.eye(n) + 0.6 * np.triu(rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.12), 1)
    A = sparse.COO.from_numpy(S)
    b = rng.standard_normal(n)
    x, info = linalg.gcrotmk(A, b, m=6, k=6, tol=1e-10, maxiter=300)
    assert int(info) == 0
    np.testing.assert_allclose(S @ np.asarray(x), b, atol=1e-7)
