"""Round-3 experiment, part 2: matched-shape Mosaic dynamic_gather.

Part 1 (pallas_vmem.py) found:
  - Mosaic's gather lowering REQUIRES idx.shape == table.shape:
    out[i, l] = table[idx[i, l], l]  (per-lane sublane gather).
  - one-hot MXU row pick (S=512): 1142 M rows/s incl. the HBM write.
  - (1,128) output blocks / scalar SMEM outputs are rejected (tile rules).

This part measures the matched-shape gather itself:
  G1  per-lane gather (SpMV form): idx (T,128) random per lane, T in
      {512, 8192}; throughput with the table VMEM-resident and idx/out
      streamed.  The SpMV pick: x2d (512,128) with entries lane-bucketed.
  G2  broadcast-idx FULL-ROW pick (SpMM form): idx[i,:] = c_i for all l
      picks strip[c_i, :] in one gather row.  Table (8192,128) f32 = 4 MB
      VMEM.  Output is reduced in-kernel to (8,128) per block so the probe
      measures the gather, not an HBM write of the picked rows.
  G3  G2 + per-entry scale + w-sum — the inner loop of a real SpMM cell
      (row-major entries, register accumulation over w).

Run: timeout 1800 python experiments/pallas_vmem2.py [g1|g2|g3|all]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RTT = None


def bench(fn, args, iters=50, perturb_idx=0):
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)

    @jax.jit
    def run(*a):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            aa = list(a)
            aa[perturb_idx] = aa[perturb_idx] + eps.astype(aa[perturb_idx].dtype)
            out = fn(*aa)
            return carry + out.ravel()[0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    total = time.perf_counter() - t0
    return max(total - _RTT, total * 0.1) / iters


def g1(T=512, n_blocks=36, label="g1"):
    """Per-lane matched-shape gather, table (T,128) resident."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((T, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(n_blocks * T, 128), dtype=np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        picked = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
        out_ref[:] = jnp.sum(picked, axis=0, keepdims=True) + jnp.zeros((8, 128), jnp.float32)

    def call(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(table, idx)

    try:
        out = np.asarray(call(table, idx))
        tb = np.asarray(table)
        ib = np.asarray(idx[:T])
        exp = tb[ib, np.arange(128)[None, :]].sum(axis=0)
        np.testing.assert_allclose(out[0], exp, rtol=1e-4)
        print(f"{label}: CAPABLE (correct) T={T}", flush=True)
    except Exception as e:
        print(f"{label}: T={T} REJECTED/WRONG: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return

    dt = bench(call, (table, idx))
    n = n_blocks * T * 128
    print(f"{label}: T={T} {n/1e6:.2f}M lane-gathers: {dt*1e3:.3f} ms = {n/dt/1e9:.2f} G/s", flush=True)


def g2(T=8192, n_blocks=285, label="g2"):
    """Broadcast-idx full-row pick from a (T,128) f32 VMEM strip.

    n_blocks*T ~ 2.33M rows = the bench-scale pick count."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.random((T, 128), dtype=np.float32))
    cols = jnp.asarray(rng.integers(0, T, size=(n_blocks * T,), dtype=np.int32))

    def kernel(tab_ref, col_ref, out_ref):
        idx = jnp.broadcast_to(col_ref[:].reshape(T, 1), (T, 128))
        picked = jnp.take_along_axis(tab_ref[:], idx, axis=0)
        out_ref[:] = jnp.sum(picked, axis=0, keepdims=True) + jnp.zeros((8, 128), jnp.float32)

    def call(table, cols):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(table, cols)

    try:
        out = np.asarray(call(table, cols))
        exp = np.asarray(table)[np.asarray(cols[:T])].sum(axis=0)
        np.testing.assert_allclose(out[0], exp, rtol=1e-4)
        print(f"{label}: CAPABLE (correct) T={T}", flush=True)
    except Exception as e:
        print(f"{label}: T={T} REJECTED/WRONG: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return

    dt = bench(call, (table, cols))
    n = n_blocks * T
    print(f"{label}: T={T} {n/1e6:.2f}M row picks: {dt*1e3:.3f} ms = {n/dt/1e6:.1f} M rows/s", flush=True)


def g3(T=8192, W=4, n_cells=285, label="g3"):
    """Row-pick + scale + w-accumulate: the real SpMM cell inner loop.

    Per cell: W gathers of T rows each (layout (T, W)), entries'
    cols index the resident (T,128) strip.  R*W = T rows picked per cell,
    accumulated over W into a (R,128) out block.  n_cells*T ~ 2.33M."""
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.random((T, 128), dtype=np.float32))

    # take_along_axis requires idx.shape == table.shape, so each gather is
    # (T,128)-shaped: per cell, W gathers of T rows each (layout (T, W)).
    def kernel2(tab_ref, col_ref, dat_ref, out_ref):
        acc = jnp.zeros((T, 128), jnp.float32)
        for w in range(W):
            idx = jnp.broadcast_to(col_ref[0, :, w].reshape(T, 1), (T, 128))
            picked = jnp.take_along_axis(tab_ref[:], idx, axis=0)
            acc = acc + picked * dat_ref[0, :, w].reshape(T, 1)
        out_ref[:] = jnp.sum(acc.reshape(64, 128, 128), axis=0)[:8, :]

    cols2 = jnp.asarray(rng.integers(0, T, size=(n_cells // W, T, W), dtype=np.int32))
    data2 = jnp.asarray(rng.random((n_cells // W, T, W), dtype=np.float32))

    def call(table, cols2, data2):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct(((n_cells // W) * 8, 128), jnp.float32),
            grid=(n_cells // W,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(table, cols2, data2)

    try:
        out = np.asarray(call(table, cols2, data2))
        tb, cb, db = np.asarray(table), np.asarray(cols2[0]), np.asarray(data2[0])
        acc = np.zeros((T, 128), np.float32)
        for w in range(W):
            acc += tb[cb[:, w]] * db[:, w][:, None]
        exp = acc.reshape(64, 128, 128).sum(axis=0)[:8]
        np.testing.assert_allclose(out[:8], exp, rtol=1e-3)
        print(f"{label}: CAPABLE (correct) T={T} W={W}", flush=True)
    except Exception as e:
        print(f"{label}: REJECTED/WRONG: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return

    dt = bench(call, (table, cols2, data2), perturb_idx=0)
    n = (n_cells // W) * T * W
    print(f"{label}: {n/1e6:.2f}M pick+fma: {dt*1e3:.3f} ms = {n/dt/1e6:.1f} M rows/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), flush=True)
    if which in ("g1", "all"):
        g1(512, n_blocks=36)
    if which in ("g1b", "all"):
        g1(8192, n_blocks=4, label="g1b")
    if which in ("g2", "all"):
        g2()
    if which in ("g3", "all"):
        g3()
