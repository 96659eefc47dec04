"""SpGEMM: ``a @ b`` for two 100,000² sparse matrices @ 1e-5 — the workload
of reference ``examples/matmul_example.py:11-62``, validated against scipy."""

import numpy as np

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse

LEN = 10_000 if CI_MODE else 100_000
DENSITY = 0.00001
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    a = sparse.random((LEN, LEN), density=DENSITY, random_state=rng, format="gcxs")
    b = sparse.random((LEN, LEN), density=DENSITY, random_state=rng, format="gcxs")

    def matmul(a, b):
        return a @ b

    result = benchmark(lambda a, b: matmul(a, b), (a, b), f"sparse_tpu SpGEMM LEN={LEN}", ITERS)

    a_sp = a.to_scipy_sparse().tocsr()
    b_sp = b.to_scipy_sparse().tocsr()
    expected = (a_sp @ b_sp).toarray() if LEN <= 10_000 else a_sp @ b_sp
    if LEN <= 10_000:
        np.testing.assert_allclose(result.todense(), expected, rtol=1e-10)
    else:
        got = result.to_scipy_sparse().tocsr()
        diff = (got - expected)
        assert abs(diff).max() < 1e-10
    print("OK: matches scipy oracle")


if __name__ == "__main__":
    main()
