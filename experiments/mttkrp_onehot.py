"""Round-3 prototype: MTTKRP via transposed one-hot MXU factor picks.

ell_mttkrp's gathers+product phase costs 58.4 of 67.5 ms (row-gather
issue bound + the (...,32) lane-padding tax — experiments/mttkrp_phases.py).
Here both factor picks run as in-VMEM one-hot MXU contractions with the
factors resident as transposed hi|lo bf16 tables, entries in lanes
(the SpMV round-3 formulation), and the scatter stays the one-hot einsum.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiments.pallas_spmv_onehot import bench
from sparse_tpu.kernels.ell import build_block_ell_3d, ell_mttkrp


def split_t(M):
    """(rows, r) f32 -> transposed hi|lo bf16 (2r, rows_pad)."""
    rows, r = M.shape
    Tp = -(-rows // 128) * 128
    Mp = np.zeros((Tp, r), np.float32)
    Mp[:rows] = M
    hi = Mp.astype(jnp.bfloat16)
    lo = (Mp - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([jnp.asarray(hi).T, jnp.asarray(lo).T], axis=0)  # (2r, Tp)


def products_call(n_entries, r, Tc, Td, blk=2048):
    def kernel(ct_ref, dt_ref, j_ref, k_ref, v_ref, out_ref):
        j = j_ref[:].reshape(1, blk)
        k = k_ref[:].reshape(1, blk)
        ohj = (jax.lax.broadcasted_iota(jnp.int32, (Tc, blk), 0) == j).astype(jnp.bfloat16)
        ohk = (jax.lax.broadcasted_iota(jnp.int32, (Td, blk), 0) == k).astype(jnp.bfloat16)
        pc = jnp.dot(ct_ref[:], ohj, preferred_element_type=jnp.float32)  # (2r, blk)
        pd = jnp.dot(dt_ref[:], ohk, preferred_element_type=jnp.float32)
        cfold = pc[:r, :] + pc[r:, :]
        dfold = pd[:r, :] + pd[r:, :]
        out_ref[:] = cfold * dfold * v_ref[:].reshape(1, blk)

    def call(ct, dtb, ej, ek, ev):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((r, n_entries), jnp.float32),
                grid=(n_entries // blk,),
                in_specs=[
                    pl.BlockSpec((2 * r, Tc), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * r, Td), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            )(ct, dtb, ej, ek, ev)

    return call


def main():
    rng = np.random.default_rng(0)
    I, J, K, r = 100_000, 2000, 2000, 32
    lin = np.unique(rng.integers(0, I * J * K, size=10_000_000, dtype=np.int64))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size, dtype=np.float32)
    nnz = lin.size
    C = rng.random((J, r), dtype=np.float32)
    D = rng.random((K, r), dtype=np.float32)

    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
    n_blocks, cap = ej.shape
    blk = 2048
    n_pad = -(-(n_blocks * cap) // blk) * blk
    fj = np.zeros(n_pad, np.int32); fk = np.zeros(n_pad, np.int32); fv = np.zeros(n_pad, np.float32)
    fj[: n_blocks * cap] = np.asarray(ej).ravel()
    fk[: n_blocks * cap] = np.asarray(ek).ravel()
    fv[: n_blocks * cap] = np.asarray(ed).ravel()
    ct = split_t(C)
    dtb = split_t(D)
    Tc, Td = ct.shape[1], dtb.shape[1]
    call = products_call(n_pad, r, Tc, Td, blk)
    fjj, fkk, fvv = jnp.asarray(fj), jnp.asarray(fk), jnp.asarray(fv)

    erj = jnp.asarray(np.asarray(er))

    def full(ctv, dtv):
        prodT = call(ctv, dtv, fjj, fkk, fvv)  # (r, n_pad)
        p3 = prodT[:, : n_blocks * cap].reshape(r, n_blocks, cap)
        # one-hot built IN-GRAPH so XLA fuses the compare into the einsum
        # loop (materialized it would be 5.3 GB)
        onehot = (erj[:, :, None] == jnp.arange(128, dtype=erj.dtype)[None, None, :]).astype(jnp.float32)
        out = jnp.einsum(
            "rbe,bek->bkr", p3, onehot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(n_blocks * 128, r)[:I]

    # correctness
    out = np.asarray(full(ct, dtb))
    dense_exp = np.zeros((I, r))
    np.add.at(dense_exp, ci, (tv[:, None] * C[cj] * D[ck]).astype(np.float64))
    rel = np.abs(out - dense_exp).max() / np.abs(dense_exp).max()
    print(f"onehot mttkrp relerr {rel:.2e}", flush=True)

    dt = bench(jax.jit(full), (ct, dtb), iters=20)
    print(f"onehot mttkrp: {dt*1e3:.2f} ms = {nnz/dt/1e6:.0f} M nnz/s", flush=True)

    dt = bench(
        jax.jit(lambda Cv, Dv: ell_mttkrp(er, ej, ek, ed, Cv, Dv, n_rows=I)),
        (jnp.asarray(C), jnp.asarray(D)), iters=20,
    )
    print(f"ell_mttkrp (current): {dt*1e3:.2f} ms = {nnz/dt/1e6:.0f} M nnz/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
