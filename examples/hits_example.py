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


def main():
    rng = np.random.default_rng(0)
    g = scipy.sparse.random(N_NODES, N_NODES, density=0.05, random_state=0, data_rvs=lambda n: np.ones(n))
    A = sparse.COO.from_scipy_sparse(g)

    h, a = benchmark(lambda A: hits(A), (A,), f"sparse_tpu HITS n={N_NODES}", ITERS)

    h_ref, a_ref = hits(g.toarray())
    np.testing.assert_allclose(h, h_ref, rtol=1e-6)
    np.testing.assert_allclose(a, a_ref, rtol=1e-6)
    print("OK: matches dense HITS")


if __name__ == "__main__":
    main()
