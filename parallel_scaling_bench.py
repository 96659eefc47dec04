"""Weak-scaling harness for the distributed SpMM paths.

Drives the PRODUCTION scatter-free kernels (`spmm_ring_ell` — the ring
schedule with the one-hot MXU block-ELL shard kernel — and
`spmm_sharded_ell`, the replicated-B form) on 1..N devices with the
per-device problem size held constant (weak scaling) and reports parallel
efficiency, emitting a JSON artifact per run. On this box only one TPU
chip is attached, so the default run uses N virtual CPU devices
(``--xla_force_host_platform_device_count``) to validate the scaling
*structure* (the BASELINE.json ≥70% weak-scaling target needs real
multi-chip ICI to measure meaningfully — virtual CPU devices share memory
bandwidth, so the numbers here are a lower bound on collective overhead
only, not a hardware measurement; docs/scaling.md carries the projection
from measured single-chip ELL shard constants).

Usage: python parallel_scaling_bench.py [max_devices] [--out artifact.json]
"""

from __future__ import annotations

import json
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
from sparse_tpu.parallel import (
    bucket_columns_ell,
    make_mesh,
    partition_spmm_ell,
    spmm_ring_ell,
    spmm_sharded_ell,
)

ROWS_PER_DEV = 4096
K = 8192
N = 64
NNZ_PER_DEV = 1 << 17
ITERS = 5


def _problem(n_dev):
    m = ROWS_PER_DEV * n_dev
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, m * K, size=NNZ_PER_DEV * n_dev, dtype=np.int64))
    rows = (lin // K).astype(np.int64)
    cols = (lin % K).astype(np.int64)
    data = rng.random(lin.size).astype(np.float32)
    a = sparse.COO._make(np.stack([rows, cols]), data, (m, K), np.float32(0))
    b = rng.random((K, N)).astype(np.float32)
    import scipy.sparse

    oracle = scipy.sparse.coo_matrix((data, (rows, cols)), shape=(m, K)) @ b
    return a, b, oracle, lin.size


def run_ring_ell(n_dev):
    """Ring schedule: B K-sharded, block-ELL bucket contracted per rotation."""
    mesh = make_mesh(n_dev)
    a, b, oracle, nnz = _problem(n_dev)
    bucketed = bucket_columns_ell(a, n_dev)
    block_cols = bucketed[4]
    b_pad = np.zeros((n_dev * block_cols, N), dtype=np.float32)
    b_pad[:K] = b
    b_sharded = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    args = (bucketed, a.shape[0], b_sharded, mesh)

    out = spmm_ring_ell(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(ITERS):
        out = spmm_ring_ell(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / ITERS
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-4)
    return dt, nnz


def run_sharded_ell(n_dev):
    """Replicated-B form: zero steady-state communication."""
    mesh = make_mesh(n_dev)
    a, b, oracle, nnz = _problem(n_dev)
    e_rows, e_cols, e_data, block_rows = partition_spmm_ell(a, n_dev)
    args = (e_rows, e_cols, e_data, jnp.asarray(b), a.shape[0], mesh)

    out = spmm_sharded_ell(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(ITERS):
        out = spmm_sharded_ell(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / ITERS
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-4)
    return dt, nnz


def main():
    argv = list(sys.argv[1:])
    out_path = "benchmarks/scaling_ell.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    max_dev = int(argv[0]) if argv else min(8, len(jax.devices()))

    artifact = {
        "backend": jax.default_backend(),
        "rows_per_dev": ROWS_PER_DEV,
        "k": K,
        "n": N,
        "nnz_per_dev_target": NNZ_PER_DEV,
        "kernels": {},
    }
    for name, runner in (("spmm_ring_ell", run_ring_ell), ("spmm_sharded_ell", run_sharded_ell)):
        results = {}
        print(f"-- {name} --")
        for n in (1, 2, 4, 8):
            if n > max_dev:
                break
            dt, nnz = runner(n)
            results[n] = {"ms_per_iter": dt * 1e3, "nnz": nnz}
            eff = results[1]["ms_per_iter"] / (dt * 1e3)  # weak scaling: ideal = constant time
            results[n]["weak_scaling_eff"] = eff
            print(f"devices={n}: {dt * 1e3:8.2f} ms/iter  nnz={nnz}  weak-scaling eff={eff * 100:6.1f}%")
        artifact["kernels"][name] = results
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
