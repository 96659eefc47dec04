"""Round-3 experiment: random reads from a VMEM-RESIDENT table inside a
Pallas kernel — the one unmeasured cell of the SpMM/SpMV roofline
(docs/spmm_roofline.md; VERDICT r2 item 1).

Measures the PRIMITIVES first, at SpMV scale (table = x: 256 KB; nnz ~2.33M
padded), then the SpMM strip variant (table = an 8192x128 f32 strip of B):

  P1  sublane dynamic_gather   out[i,l] = table[idx[i,l], l]   (take_along_axis)
      -- the only vectorized random-read Mosaic can express; capability +
      throughput at table heights 512 (one x view) and 8192 (a B strip).
  P2  per-row dynamic VMEM load loop: acc += b[pl.ds(idx,1), :]
      -- the scalar-issue formulation; measures the load issue rate.
  P3  in-VMEM one-hot MXU row pick: onehot(idx, S) @ strip
      -- burns MXU FLOPs instead of issue slots; bf16 operands, f32 accum.
  P4  scalar SMEM-indexed element load loop (expected dead slow; bound check).

Methodology: scan-loop timing with per-iteration TABLE perturbation
(hoist-proof, CLAUDE.md), tunnel RTT subtracted.  Run on the real TPU:
    timeout 1200 python experiments/pallas_vmem.py [p1|p1b|p2|p3|p4|all]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


_RTT = None


def bench(fn, args, iters=50, perturb_idx=0):
    """Time fn(*args) in a scan loop; args[perturb_idx] (float array) is
    perturbed per iteration so nothing hoists."""
    global _RTT
    if _RTT is None:
        _RTT = rtt()

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

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    total = time.perf_counter() - t0
    return max(total - _RTT, total * 0.1) / iters


# ---------------------------------------------------------------- P1
def p1(table_h=512, n_idx_rows=18432, blk=512, label="p1"):
    """take_along_axis from a VMEM-resident (table_h, 128) table."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((table_h, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, table_h, size=(n_idx_rows, 128), dtype=np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    grid = n_idx_rows // blk

    def call(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx_rows, 128), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((table_h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(table, idx)

    # capability probe on a tiny instance first
    try:
        small = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table[: min(table_h, 512)], idx[:8] % min(table_h, 512))
        ok = np.asarray(small)
        exp = np.asarray(table[: min(table_h, 512)])[np.asarray(idx[:8] % min(table_h, 512)), np.arange(128)[None, :]]
        np.testing.assert_allclose(ok, exp)
        print(f"{label}: CAPABLE (correct) table_h={table_h}")
    except Exception as e:
        print(f"{label}: REJECTED table_h={table_h}: {type(e).__name__}: {str(e)[:300]}")
        return

    dt = bench(call, (table, idx))
    n = n_idx_rows * 128
    print(f"{label}: table=({table_h},128) n={n/1e6:.2f}M gathers: {dt*1e3:.3f} ms = {n/dt/1e9:.2f} G gathers/s")


# ---------------------------------------------------------------- P2
def p2(strip_h=8192, n_loads=131072, per_step=1024):
    """Per-row dynamic VMEM loads: acc += strip[pl.ds(idx[w], 1), :]."""
    rng = np.random.default_rng(1)
    strip = jnp.asarray(rng.random((strip_h, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, strip_h, size=(n_loads,), dtype=np.int32))

    grid = n_loads // per_step

    def kernel(idx_ref, strip_ref, out_ref):
        def body(w, acc):
            return acc + strip_ref[pl.ds(idx_ref[w], 1), :]

        out_ref[:] = jax.lax.fori_loop(0, per_step, body, jnp.zeros((1, 128), jnp.float32))

    def call(strip, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((per_step,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((strip_h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, 128), jnp.float32),
            grid_spec=grid_spec,
        )(idx, strip)

    try:
        out = call(strip, idx)
        # spot-check first block
        exp = np.asarray(strip)[np.asarray(idx[:per_step])].sum(axis=0)
        np.testing.assert_allclose(np.asarray(out)[0], exp, rtol=1e-4)
        print("p2: CAPABLE (correct)")
    except Exception as e:
        print(f"p2: REJECTED: {type(e).__name__}: {str(e)[:300]}")
        return

    dt = bench(call, (strip, idx), perturb_idx=0)
    print(f"p2: {n_loads/1e3:.0f}k row loads: {dt*1e3:.3f} ms = {n_loads/dt/1e6:.1f} M rows/s")


# ---------------------------------------------------------------- P3
def p3(strip_h=512, n_entries=1 << 21, blk=1024, dtype=jnp.bfloat16):
    """In-VMEM one-hot MXU row pick: onehot(idx, S) @ strip -> (blk, 128)."""
    rng = np.random.default_rng(2)
    strip = jnp.asarray(rng.random((strip_h, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, strip_h, size=(n_entries,), dtype=np.int32))

    grid = n_entries // blk

    def kernel(idx_ref, strip_ref, out_ref):
        ids = idx_ref[:].reshape(blk, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, strip_h), 1)
        onehot = (ids == cols).astype(dtype)
        out_ref[:] = jnp.dot(onehot, strip_ref[:].astype(dtype), preferred_element_type=jnp.float32)

    def call(strip, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_entries, 128), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((strip_h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(idx, strip)

    try:
        out = call(strip, idx)
        exp = np.asarray(strip)[np.asarray(idx[:4])]
        np.testing.assert_allclose(np.asarray(out)[:4], exp, rtol=1e-2)
        print("p3: CAPABLE (correct)")
    except Exception as e:
        print(f"p3: REJECTED: {type(e).__name__}: {str(e)[:300]}")
        return

    dt = bench(call, (strip, idx), perturb_idx=0)
    print(
        f"p3: onehot-MXU S={strip_h} blk={blk}: {n_entries/1e6:.2f}M row picks: "
        f"{dt*1e3:.3f} ms = {n_entries/dt/1e6:.1f} M rows/s"
    )


# ---------------------------------------------------------------- P4
def p4(n_loads=65536, per_step=1024):
    """Scalar element loads x_ref[i, j] at SMEM-held indices."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((512, 128), dtype=np.float32))
    qi = jnp.asarray(rng.integers(0, 512, size=(n_loads,), dtype=np.int32))
    qj = jnp.asarray(rng.integers(0, 128, size=(n_loads,), dtype=np.int32))
    grid = n_loads // per_step

    def kernel(qi_ref, qj_ref, x_ref, out_ref):
        def body(w, acc):
            return acc + x_ref[qi_ref[w], qj_ref[w]]

        out_ref[0, 0] = jax.lax.fori_loop(0, per_step, body, jnp.float32(0))

    def call(x, qi, qj):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, 1), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((per_step,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((per_step,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((512, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        )(qi, qj, x)

    try:
        out = call(x, qi, qj)
        exp = np.asarray(x)[np.asarray(qi[:per_step]), np.asarray(qj[:per_step])].sum()
        np.testing.assert_allclose(np.asarray(out)[0, 0], exp, rtol=1e-4)
        print("p4: CAPABLE (correct)")
    except Exception as e:
        print(f"p4: REJECTED: {type(e).__name__}: {str(e)[:300]}")
        return

    dt = bench(call, (x, qi, qj), perturb_idx=0)
    print(f"p4: {n_loads/1e3:.0f}k scalar loads: {dt*1e3:.3f} ms = {n_loads/dt/1e6:.1f} M loads/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), flush=True)
    if which in ("p1", "all"):
        p1(512, label="p1(512)")
    if which in ("p1b", "all"):
        p1(8192, label="p1b(8192)")
    if which in ("p2", "all"):
        p2()
    if which in ("p3", "all"):
        p3()
    if which in ("p4", "all"):
        p4()
