"""Triangle count ``sum(A @ A * A) / 6`` on an undirected gnp graph —
the workload of reference ``examples/triangles_example.py``."""

import numpy as np
import scipy.sparse

from utils import benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse

N_NODES = 200
ITERS = 3


def count_triangles(A):
    return float((A @ A * A).sum().todense()) / 6


def main():
    rng = np.random.default_rng(0)
    dense = (rng.random((N_NODES, N_NODES)) < 0.1).astype(np.float64)
    dense = np.triu(dense, 1)
    dense = dense + dense.T  # symmetric, no self loops
    A = sparse.COO.from_numpy(dense)

    tri = benchmark(lambda A: count_triangles(A), (A,), f"sparse_tpu triangles n={N_NODES}", ITERS)

    expected = np.trace(dense @ dense @ dense) / 6
    assert abs(tri - expected) < 1e-9, (tri, expected)
    print(f"OK: {int(tri)} triangles, matches dense trace formula")


if __name__ == "__main__":
    main()
