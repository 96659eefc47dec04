"""Weak-scaling harness for the distributed SpMM/MTTKRP paths.

Runs the ring SpMM on 1..N devices with the per-device problem size held
constant (weak scaling) and reports parallel efficiency. On this box only
one TPU chip is attached, so the default run uses N virtual CPU devices
(``--xla_force_host_platform_device_count``) to validate the scaling
*structure* (the BASELINE.json ≥70% weak-scaling target needs real
multi-chip ICI to measure meaningfully — virtual CPU devices share memory
bandwidth, so the numbers here are a lower bound on collective overhead
only, not a hardware measurement).

Usage: python parallel_scaling_bench.py [max_devices]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import numpy as np

import jax

# force the CPU backend (8 virtual devices) unless explicitly told to use
# real hardware — note jax.default_backend() would lock the platform choice
if os.environ.get("SCALING_ON_HW", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import sparse_tpu as sparse
from sparse_tpu.parallel import bucket_columns, make_mesh, partition_coo_rows, spmm_ring

ROWS_PER_DEV = 4096
K = 8192
N = 64
NNZ_PER_DEV = 1 << 17
ITERS = 5


def run_on(n_dev):
    mesh = make_mesh(n_dev)
    m = ROWS_PER_DEV * n_dev
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, m * K, size=NNZ_PER_DEV * n_dev, dtype=np.int64))
    rows = (lin // K).astype(np.int64)
    cols = (lin % K).astype(np.int64)
    data = rng.random(lin.size).astype(np.float32)
    a = sparse.COO._make(np.stack([rows, cols]), data, (m, K), np.float32(0))
    b = rng.random((K, N)).astype(np.float32)

    pcoo = partition_coo_rows(a, n_dev)
    bucketed = bucket_columns(pcoo, n_dev)
    block_cols = bucketed[3]
    b_pad = np.zeros((n_dev * block_cols, N), dtype=np.float32)
    b_pad[:K] = b
    b_sharded = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    args = (tuple(jnp.asarray(x) for x in bucketed[:3]) + (block_cols,), (m, K), pcoo.block_rows, b_sharded, mesh)

    out = spmm_ring(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(ITERS):
        out = spmm_ring(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / ITERS

    # correctness vs scipy oracle
    import scipy.sparse

    oracle = scipy.sparse.coo_matrix((data, (rows, cols)), shape=(m, K)) @ b
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-4)
    return dt, lin.size


def main():
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else min(8, len(jax.devices()))
    results = {}
    for n in (1, 2, 4, 8):
        if n > max_dev:
            break
        dt, nnz = run_on(n)
        results[n] = dt
        base = results[1]
        eff = base / dt  # weak scaling: ideal = constant time
        print(f"devices={n}: {dt * 1e3:8.2f} ms/iter  nnz={nnz}  weak-scaling eff={eff * 100:6.1f}%")


if __name__ == "__main__":
    main()
