"""HITS hubs/authorities power iteration on a random directed graph —
the workload of reference ``examples/hits_example.py``."""

import numpy as np
import scipy.sparse

from utils import benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse

N_NODES = 200
ITERS = 3


def hits(A, max_iter=50, tol=1e-8):
    n = A.shape[0]
    h = np.ones(n) / n
    a = np.ones(n) / n
    for _ in range(max_iter):
        a_new = A.T @ h
        a_new = a_new / a_new.max()
        h_new = A @ a_new
        h_new = h_new / h_new.max()
        if np.abs(h_new - h).sum() < tol:
            h, a = h_new, a_new
            break
        h, a = h_new, a_new
    return h / h.sum(), a / a.sum()


def hits_jit(A, max_iter=50, tol=1e-8):
    """The same power iteration compiled to ONE device program: transpose,
    both SpMVs, normalization, and the convergence test all run inside
    ``lax.while_loop`` — no host round-trips between iterations."""
    import jax.numpy as jnp
    from jax import lax

    from sparse_tpu import jitops

    @sparse.compiled
    def run(A):
        At = jitops.transpose(A)
        n = A.shape[0]
        h0 = jnp.ones(n, dtype=jnp.asarray(A.data).dtype) / n
        a0 = jnp.ones_like(h0) / n

        def cond(state):
            _, _, delta, it = state
            return (delta >= tol) & (it < max_iter)

        def body(state):
            h, a, _, it = state
            a_new = jitops.spmv(At, h)
            a_new = a_new / a_new.max()
            h_new = jitops.spmv(A, a_new)
            h_new = h_new / h_new.max()
            return h_new, a_new, jnp.abs(h_new - h).sum(), it + 1

        h, a, _, _ = lax.while_loop(cond, body, (h0, a0, jnp.asarray(jnp.inf, h0.dtype), 0))
        return h / h.sum(), a / a.sum()

    return run(A)


def main():
    rng = np.random.default_rng(0)
    g = scipy.sparse.random(N_NODES, N_NODES, density=0.05, random_state=0, data_rvs=lambda n: np.ones(n))
    A = sparse.COO.from_scipy_sparse(g)

    h, a = benchmark(lambda A: hits(A), (A,), f"sparse_tpu HITS n={N_NODES}", ITERS)

    h_ref, a_ref = hits(g.toarray())
    np.testing.assert_allclose(h, h_ref, rtol=1e-6)
    np.testing.assert_allclose(a, a_ref, rtol=1e-6)

    hj, aj = benchmark(lambda A: tuple(np.asarray(v) for v in hits_jit(A)), (A,), f"sparse_tpu HITS (whole-loop jit) n={N_NODES}", ITERS)
    np.testing.assert_allclose(hj, h_ref, rtol=1e-6)
    np.testing.assert_allclose(aj, a_ref, rtol=1e-6)
    print("OK: matches dense HITS")


if __name__ == "__main__":
    main()
