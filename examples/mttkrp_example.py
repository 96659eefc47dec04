"""MTTKRP: ``sum(B[:, :, :, None] * D[None, None, :, :] * C[None, :, None, :], axis=(1, 2))``
— the CP-decomposition workload of reference ``examples/mttkrp_example.py:10-58``
(B: 1000×1000×100 @ 1e-4, J=25), run as a fused segment kernel."""

import numpy as np

import jax
import jax.numpy as jnp

from utils import benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse
from sparse_tpu.kernels import mttkrp

I_, K_, L_ = 1000, 1000, 100
J_ = 25
DENSITY = 0.0001
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    b = sparse.random((I_, K_, L_), density=DENSITY, random_state=rng)
    d = rng.random((L_, J_))
    c = rng.random((K_, J_))

    ci = jnp.asarray(np.asarray(b.coords[0]))
    cj = jnp.asarray(np.asarray(b.coords[1]))
    ck = jnp.asarray(np.asarray(b.coords[2]))
    data = jnp.asarray(np.asarray(b.data))
    cjx, djx = jnp.asarray(c), jnp.asarray(d)

    fused = jax.jit(lambda ci, cj, ck, v, c_, d_: mttkrp(ci, cj, ck, v, c_, d_, n_rows=I_))
    result = benchmark(fused, (ci, cj, ck, data, cjx, djx), f"sparse_tpu MTTKRP {I_}x{K_}x{L_} J={J_}", ITERS)

    # elemwise+reduce API path (the reference's formulation)
    api_result = (b[:, :, :, None] * d[None, None, :, :] * c[None, :, None, :]).sum(axis=(1, 2))

    expected = np.einsum("ikl,kj,lj->ij", b.todense(), c, d)
    np.testing.assert_allclose(np.asarray(result), expected, rtol=1e-8)
    np.testing.assert_allclose(api_result.todense(), expected, rtol=1e-8)
    print("OK: fused kernel and elemwise API both match dense oracle")


if __name__ == "__main__":
    main()
