"""SpMV + add: ``A @ x + y`` — the workload of reference
``examples/spmv_add_example.py:11-66`` (A: 99,990 × 100,000 @ 1e-6),
validated against scipy and timed as one fused jitted kernel."""

import numpy as np
import scipy.sparse

import jax
import jax.numpy as jnp

from utils import benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse
from sparse_tpu.kernels import coo_spmv

LEN = 100_000
DENSITY = 0.000001
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    a = sparse.random((LEN - 10, LEN), density=DENSITY, random_state=rng)
    x = rng.random(LEN, dtype=np.float64)
    y = rng.random(LEN - 10, dtype=np.float64)

    # eager API path
    result_eager = a @ x + y

    # fused jitted kernel path
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    data = jnp.asarray(np.asarray(a.data))
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def spmv_add(rows, cols, data, x, y):
        return coo_spmv(rows, cols, data, x, n_rows=LEN - 10) + y

    result = benchmark(spmv_add, (rows, cols, data, xj, yj), f"sparse_tpu SpMV+add LEN={LEN}", ITERS)

    # scipy oracle
    a_sp = a.to_scipy_sparse().tocsc()
    expected = a_sp @ x + y
    np.testing.assert_allclose(np.asarray(result), expected, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(result_eager), expected, rtol=1e-10)
    print("OK: matches scipy oracle")


if __name__ == "__main__":
    main()
