"""Sparse elementwise workload: ``(a + b) * (a > b)`` over two large random
sparse matrices — the workload of reference ``examples/elemwise_example.py``."""

import numpy as np

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse

LEN = 1_000 if CI_MODE else 10_000
DENSITY = 0.001
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    a = sparse.random((LEN, LEN), density=DENSITY, random_state=rng)
    b = sparse.random((LEN, LEN), density=DENSITY, random_state=rng)

    def work(a, b):
        return (a + b) * (a > b)

    result = benchmark(lambda a, b: work(a, b), (a, b), f"sparse_tpu elemwise LEN={LEN}", ITERS)

    sub = min(LEN, 2000)
    ad = a[:sub, :sub].todense()
    bd = b[:sub, :sub].todense()
    np.testing.assert_allclose(result[:sub, :sub].todense(), (ad + bd) * (ad > bd))
    print("OK: matches dense oracle on sub-block")


if __name__ == "__main__":
    main()
