"""True multi-PROCESS distributed execution, wired with
``jax.distributed.initialize`` (CPU cross-process collectives over Gloo) —
the code path a real multi-host pod runs, which the in-process
8-virtual-device harness cannot reach (VERDICT r2 item 4).

Split per feature (VERDICT r3 item 7) so a failure reports which stage
broke, and run on TWO topologies: 2 processes x 4 devices (every feature)
and 4 processes x 2 devices (placement + the ring, whose ppermute crosses
three process boundaries there).

The worker body runs in spawned subprocesses because ``jax.distributed``
can only be initialized once per process.  All assertions run against
dense oracles computed from allgathered shards.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
feature = sys.argv[4]; n_procs = int(sys.argv[5]); local_dev = int(sys.argv[6])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_dev}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=n_procs, process_id=pid)
sys.path.insert(0, r"{repo}")
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P
import sparse_tpu as sparse
from sparse_tpu.parallel import (
    bucket_columns, make_mesh, mttkrp_sharded, partition_coo_rows,
    spmm_replicated, spmm_ring,
)

n_devices = n_procs * local_dev
assert len(jax.local_devices()) == local_dev and len(jax.devices()) == n_devices
mesh = make_mesh(n_devices)
m, k, n = 64, 48, 8

# both processes build the same host matrix (same seed), so device_put of
# the full value onto the process-spanning sharding is consistent
a = sparse.random((m, k), density=0.2, random_state=0)
a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, dtype=np.float32), shape=a.shape)
dense_a = a.todense()
b = np.random.default_rng(1).random((k, n), dtype=np.float32)

pcoo = partition_coo_rows(a, n_devices, mesh=mesh)

if feature == "placement":
    # shards landed on the process-spanning sharding with the right values
    assert pcoo.rows.sharding.is_equivalent_to(NamedSharding(mesh, P("x", None)), pcoo.rows.ndim)
    host_pcoo = partition_coo_rows(a, n_devices)
    got_rows = np.asarray(multihost_utils.process_allgather(pcoo.rows, tiled=True))
    np.testing.assert_array_equal(got_rows, np.asarray(host_pcoo.rows))

elif feature == "spmm":
    out = spmm_replicated(pcoo, jnp.asarray(b), mesh)
    got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    np.testing.assert_allclose(got, dense_a @ b, rtol=1e-4)

elif feature == "ring":
    # ring SpMM: the ppermute rotation crosses the process boundary
    host_pcoo = partition_coo_rows(a, n_devices)
    out_rows, out_cols, out_data, block_cols = bucket_columns(host_pcoo, n_devices)
    b_pad = np.zeros((n_devices * block_cols, n), dtype=np.float32)
    b_pad[:k] = b
    b_sharded = jax.device_put(jnp.asarray(b_pad), NamedSharding(mesh, P("x", None)))
    ring = spmm_ring(
        (out_rows, out_cols, out_data, block_cols), (m, k), host_pcoo.block_rows, b_sharded, mesh
    )
    got = np.asarray(multihost_utils.process_allgather(ring, tiled=True))
    np.testing.assert_allclose(got, dense_a @ b, rtol=1e-4)

elif feature == "mttkrp":
    t = sparse.random((m, 8, 8), density=0.1, random_state=2)
    coords = np.asarray(t.coords); data = np.asarray(t.data, dtype=np.float32)
    block_rows = -(-m // n_devices)
    shard_of = coords[0] // block_rows
    cap = max(int(np.bincount(shard_of, minlength=n_devices).max()), 1)
    ci = np.zeros((n_devices, cap), np.int32); cj = np.zeros((n_devices, cap), np.int32)
    ck = np.zeros((n_devices, cap), np.int32); cv = np.zeros((n_devices, cap), np.float32)
    for s in range(n_devices):
        sel = shard_of == s; cnt = int(sel.sum())
        ci[s, :cnt] = coords[0][sel] - s * block_rows
        cj[s, :cnt] = coords[1][sel]; ck[s, :cnt] = coords[2][sel]; cv[s, :cnt] = data[sel]
    c = np.random.default_rng(3).random((8, 4), dtype=np.float32)
    d = np.random.default_rng(4).random((8, 4), dtype=np.float32)
    sh = NamedSharding(mesh, P("x", None))
    res = mttkrp_sharded(
        jax.device_put(jnp.asarray(ci), sh), jax.device_put(jnp.asarray(cj), sh),
        jax.device_put(jnp.asarray(ck), sh), jax.device_put(jnp.asarray(cv), sh),
        jnp.asarray(c), jnp.asarray(d), m, mesh,
    )
    got = np.asarray(multihost_utils.process_allgather(res, tiled=True))
    np.testing.assert_allclose(
        got, np.einsum("ijk,jr,kr->ir", t.todense().astype(np.float32), c, d), rtol=1e-4
    )

elif feature == "checkpoint":
    from sparse_tpu import checkpoint
    path = os.path.join(tmp, "ckpt")
    checkpoint.save_partitioned(path, pcoo)
    restored = checkpoint.load_partitioned(path, mesh=mesh)
    out2 = spmm_replicated(restored, jnp.asarray(b), mesh)
    got = np.asarray(multihost_utils.process_allgather(out2, tiled=True))
    np.testing.assert_allclose(got, dense_a @ b, rtol=1e-4)

else:
    raise SystemExit(f"unknown feature {feature!r}")

print(f"WORKER {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, feature, n_procs, local_dev):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("{repo}", repo))
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(worker),
                str(i),
                str(port),
                str(tmp_path),
                feature,
                str(n_procs),
                str(local_dev),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} ({feature}) failed:\n{out[-4000:]}"
        assert f"WORKER {i} OK" in out, f"worker {i} ({feature}) missing OK:\n{out[-4000:]}"


@pytest.mark.parametrize("feature", ["placement", "spmm", "ring", "mttkrp", "checkpoint"])
def test_two_process_four_device(tmp_path, feature):
    _run_workers(tmp_path, feature, n_procs=2, local_dev=4)


@pytest.mark.parametrize("feature", ["placement", "ring"])
def test_four_process_two_device(tmp_path, feature):
    # second topology (VERDICT r3 #7): the ring's ppermute crosses THREE
    # process boundaries here, and placement spans four hosts
    _run_workers(tmp_path, feature, n_procs=4, local_dev=2)
