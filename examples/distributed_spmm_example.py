"""Distributed SpMM end-to-end: the multi-chip deployment pipeline
(BASELINE config #5's "multi-host partitioned" pattern, applied to the
matmul workload of reference ``examples/matmul_example.py``).

Runs on an 8-virtual-device CPU mesh by default (the same code drives a
real TPU pod — only the mesh construction changes):

1. row-partition a sparse matrix over the mesh (nnz-balanced),
2. replicated-dense SpMM (data-parallel rows),
3. the scatter-free production form (one-hot MXU block kernel per shard),
4. ring SpMM (K-sharded dense, ``ppermute`` rotations, ELL form),
5. sharded checkpoint save + elastic restore, then recompute.

Every step is checked against the dense oracle.
"""

import os

import numpy as np

# the virtual mesh must be configured before jax initializes
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax
import jax.numpy as jnp

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse
from sparse_tpu import checkpoint
from sparse_tpu.parallel import (
    bucket_columns_ell,
    make_mesh,
    partition_coo_rows,
    partition_spmm_ell,
    spmm_replicated,
    spmm_ring_ell,
    spmm_sharded_ell,
)

M, K, N = (4000, 3000, 16) if CI_MODE else (20000, 16000, 64)
DENSITY = 0.002
ITERS = 3


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    n_devices = len(jax.devices())
    mesh = make_mesh(n_devices)
    a = sparse.random((M, K), density=DENSITY, random_state=0)
    a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, np.float32), shape=a.shape)
    b = rng.random((K, N)).astype(np.float32)
    oracle = a.todense() @ b

    # 1-2. nnz-balanced row partition + replicated SpMM
    pcoo = partition_coo_rows(a, n_devices, mesh=mesh, balance="nnz")
    out = spmm_replicated(pcoo, jnp.asarray(b), mesh)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)

    # 3. scatter-free production form (one-hot MXU block kernel per shard)
    er, ec, ed, _br = partition_spmm_ell(a, n_devices)
    f_ell = lambda b_: spmm_sharded_ell(er, ec, ed, b_, M, mesh)
    out = benchmark(jax.jit(f_ell), (jnp.asarray(b),), "sharded ELL SpMM", ITERS)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)

    # 4. ring SpMM: dense K-sharded, ppermute rotations (ELL form)
    bucketed = bucket_columns_ell(a, n_devices)
    block_cols = bucketed[4]
    b_pad = np.zeros((n_devices * block_cols, N), dtype=np.float32)
    b_pad[:K] = b
    b_sh = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    out = spmm_ring_ell(bucketed, M, b_sh, mesh)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)

    # 5. sharded checkpoint round trip, then recompute on the restored operand
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        checkpoint.save_partitioned(path, pcoo)
        restored = checkpoint.load_partitioned(path, mesh=mesh)
        out = spmm_replicated(restored, jnp.asarray(b), mesh)
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)

    print(f"distributed SpMM oracles OK ({n_devices}-device mesh, M={M}, K={K}, N={N})")


if __name__ == "__main__":
    main()
