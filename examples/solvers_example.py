"""Iterative solvers and spectral routines on sparse operators — the
scipy.sparse.linalg workflows (reference ``sparse/tests/test_backends.py``:
spsolve/eigsh) as whole-loop-jitted device programs, validated against
dense numpy oracles."""

import numpy as np
import scipy.sparse

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import jax
import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu import linalg

SIDE = 24 if CI_MODE else 128  # Poisson grid side; n = SIDE^2
ITERS = 3


def poisson_2d(side):
    """5-point Laplacian of a side x side grid, SPD after sign flip."""
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows, cols, vals = [np.arange(n)], [np.arange(n)], [np.full(n, 4.0)]
    for di, dj in ((0, 1), (1, 0)):
        a = idx[: side - di, : side - dj].ravel()
        b = idx[di:, dj:].ravel()
        rows += [a, b]
        cols += [b, a]
        vals += [np.full(a.size, -1.0), np.full(a.size, -1.0)]
    return sparse.COO(
        np.stack([np.concatenate(rows), np.concatenate(cols)]),
        np.concatenate(vals),
        shape=(n, n),
    )


def main():
    rng = np.random.default_rng(0)
    A = poisson_2d(SIDE)
    n = A.shape[0]
    b = rng.standard_normal(n)
    dense = A.todense()

    # CG: whole solve = one device program
    x, info = linalg.cg(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-7 * np.abs(b).max())

    # GMRES on a nonsymmetric advection-diffusion-like perturbation
    P = dense + 0.3 * np.triu(np.abs(dense) > 0, 1)
    Asp = sparse.COO.from_numpy(P)
    xg, infog = linalg.gmres(Asp, b, tol=1e-10, restart=40)
    assert int(infog) == 0
    np.testing.assert_allclose(P @ np.asarray(xg), b, atol=1e-6 * np.abs(b).max())

    # spectral: top eigenpairs vs dense eigh — the Poisson spectrum is
    # heavily clustered near 8 (gaps ~ 1/n); the residual-gated deflated
    # restarts resolve it with the default budget
    vals, vecs = linalg.eigsh(A, k=4)
    ref = np.sort(np.linalg.eigvalsh(dense))[-4:]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-8)

    # transpose-free Krylov on the same nonsymmetric operator
    xt, infot = linalg.tfqmr(Asp, b, tol=1e-10)
    assert int(infot) == 0
    np.testing.assert_allclose(P @ np.asarray(xt), b, atol=1e-6 * np.abs(b).max())

    # LSMR least squares on a rectangular slice of the operator
    rect = sparse.COO.from_numpy(P[:, : n // 2])
    xl, _ = linalg.lsmr(rect, b, tol=1e-12)
    ref_ls, *_ = np.linalg.lstsq(P[:, : n // 2], b, rcond=None)
    np.testing.assert_allclose(np.asarray(xl), ref_ls, rtol=1e-5, atol=1e-7)

    # nonsymmetric Arnoldi eigenpairs (device Arnoldi, host small eig)
    we, _ = linalg.eigs(Asp, k=2, which="LM", ncv=30)
    ref_e = np.linalg.eigvals(P)
    ref_e = ref_e[np.argsort(-np.abs(ref_e))][:2]
    np.testing.assert_allclose(np.sort(np.abs(we)), np.sort(np.abs(ref_e)), rtol=1e-4)

    # one LU factorization, many solves (host SuperLU bridge)
    solve = linalg.factorized(A)
    np.testing.assert_allclose(solve(b), np.asarray(x), rtol=1e-6, atol=1e-9)

    # direct-solve bridge agrees with the iterative path
    xd = linalg.spsolve(A, b)
    np.testing.assert_allclose(xd, np.asarray(x), rtol=1e-6, atol=1e-9)

    print(f"solver oracles OK (n={n}: CG, GMRES, TFQMR, LSMR, eigsh, eigs, LU, spsolve)")

    if not CI_MODE:
        bj = jnp.asarray(b)
        benchmark(
            jax.jit(lambda bb: linalg.cg(A, bb, tol=1e-8)[0]),
            (bj,),
            f"CG 5-pt Poisson {SIDE}x{SIDE} (whole-loop jit)",
            ITERS,
        )


if __name__ == "__main__":
    main()
