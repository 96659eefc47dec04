"""True multi-PROCESS distributed execution: 2 processes x 4 CPU devices
each, wired with ``jax.distributed.initialize`` (CPU cross-process
collectives over Gloo) — the code path a real multi-host pod runs, which
the in-process 8-virtual-device harness cannot reach (VERDICT r2 item 4).

The worker body runs in spawned subprocesses because ``jax.distributed``
can only be initialized once per process.  It drives, against dense
oracles computed from allgathered shards:

- a global 8-device mesh spanning both processes;
- ``partition_coo_rows`` placement via ``jax.device_put`` onto the
  process-spanning sharding;
- ``spmm_replicated`` (shard-local compute, sharded output);
- ``spmm_ring`` (``ppermute`` rotations crossing the process boundary);
- ``mttkrp_sharded``;
- ``checkpoint.save_partitioned``/``load_partitioned`` round-trip.
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
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
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

assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8
mesh = make_mesh(8)
n_devices = 8
m, k, n = 64, 48, 8

# both processes build the same host matrix (same seed), so device_put of
# the full value onto the process-spanning sharding is consistent
a = sparse.random((m, k), density=0.2, random_state=0)
a = sparse.COO(np.asarray(a.coords), np.asarray(a.data, dtype=np.float32), shape=a.shape)
dense_a = a.todense()
b = np.random.default_rng(1).random((k, n), dtype=np.float32)

pcoo = partition_coo_rows(a, n_devices, mesh=mesh)
out = spmm_replicated(pcoo, jnp.asarray(b), mesh)
got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
np.testing.assert_allclose(got, dense_a @ b, rtol=1e-4)

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

# sharded MTTKRP on a 3-D tensor
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

# checkpoint round trip across the process-spanning mesh
from sparse_tpu import checkpoint
path = os.path.join(tmp, "ckpt")
checkpoint.save_partitioned(path, pcoo)
restored = checkpoint.load_partitioned(path, mesh=mesh)
out2 = spmm_replicated(restored, jnp.asarray(b), mesh)
got = np.asarray(multihost_utils.process_allgather(out2, tiled=True))
np.testing.assert_allclose(got, dense_a @ b, rtol=1e-4)

print(f"WORKER {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
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
            [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER {i} OK" in out, f"worker {i} missing OK:\n{out[-4000:]}"
