"""SDDMM: ``s * (a @ b)`` on a sparse mask — the workload of reference
``examples/sddmm_example.py:11-69`` (10,000² dense pair, coo mask @ 1e-5),
run as a fused gather-dot kernel that never forms ``a @ b``."""

import numpy as np

import jax
import jax.numpy as jnp

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse
from sparse_tpu.kernels import sddmm as sddmm_kernel

LEN = 1_000 if CI_MODE else 10_000
DENSITY = 0.00001
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    a = rng.random((LEN, LEN))
    b = rng.random((LEN, LEN))
    s = sparse.random((LEN, LEN), density=DENSITY, random_state=rng)

    # eager API
    result_eager = sparse.sddmm(s, a, b)

    rows = jnp.asarray(np.asarray(s.coords[0]))
    cols = jnp.asarray(np.asarray(s.coords[1]))
    data = jnp.asarray(np.asarray(s.data))
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    fused = jax.jit(sddmm_kernel)
    vals = benchmark(fused, (rows, cols, data, aj, bj), f"sparse_tpu SDDMM LEN={LEN}", ITERS)

    # oracle at the stored coordinates only
    r = np.asarray(s.coords[0])
    c = np.asarray(s.coords[1])
    expected = np.asarray(s.data) * np.einsum("ek,ek->e", a[r], b.T[c])
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(result_eager.data), expected, rtol=1e-8)
    print("OK: matches dense oracle at mask coordinates")


if __name__ == "__main__":
    main()
