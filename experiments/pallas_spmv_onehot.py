"""Round-3 experiment: SpMV via the in-VMEM one-hot MXU row pick.

pallas_vmem.py P3 measured the one-hot pick (S=512) at 1142 M rows/s —
faster than the take-based gather's 706 M rows/s issue bound — and x fits
VMEM entirely (256 KB).  The full SpMV:

  per entry e (streamed in row-ELL layout order, blocks of BLK):
    q = c >> 7, m = c & 127
    picked = onehot(q, 512) @ x2            # MXU, x2 resident in VMEM
    sel    = sum(picked_folded * onehot(m, 128), axis=1)   # VPU lane pick
    prod   = sel * data
  kernel writes the (nnz,) products stream (9.3 MB — NOT the 1.19 GB
  gathered block the take-based path round-trips); the per-row segment
  reduce stays in XLA over the row-ELL tier layout.

Two table precisions:
  hilo: x2 = [bf16(x) | bf16(x - bf16(x))] (512, 256) — relerr ~1e-5
  bf16: x2 = bf16(x) (512, 128) — half the MXU FLOPs, relerr ~2e-3

Run: timeout 1800 python experiments/pallas_spmv_onehot.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = K = 1 << 16
NNZ = 1 << 21

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
            aa[perturb_idx] = (aa[perturb_idx] + eps.astype(aa[perturb_idx].dtype)).astype(
                a[perturb_idx].dtype
            )
            out = fn(*aa)
            return carry + out.ravel()[0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    total = time.perf_counter() - t0
    return max(total - _RTT, total * 0.1) / iters


def products_kernel(hilo, blk):
    """pallas_call producing the per-entry products stream."""
    n_tab_cols = 256 if hilo else 128

    def kernel(x2_ref, col_ref, dat_ref, out_ref):
        c = col_ref[:].reshape(blk, 1)
        q = c // 128
        m = c - q * 128
        oh = (q == jax.lax.broadcasted_iota(jnp.int32, (blk, 512), 1)).astype(jnp.bfloat16)
        picked = jnp.dot(oh, x2_ref[:], preferred_element_type=jnp.float32)  # (blk, 256|128)
        folded = picked[:, :128] + picked[:, 128:] if hilo else picked
        mask = m == jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
        sel = jnp.sum(jnp.where(mask, folded, 0.0), axis=1, keepdims=True)  # (blk, 1)
        out_ref[:] = sel * dat_ref[:].reshape(blk, 1)

    def call(x2, cols, data):
        # Mosaic rejects kernels traced in x64 mode (the package enables
        # x64 for numpy parity) — same wrap as kernels/bsr.py
        n = cols.shape[0]
        with jax.enable_x64(False):
            return _call(x2, cols, data, n)

    def _call(x2, cols, data, n):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
            grid=(n // blk,),
            in_specs=[
                pl.BlockSpec((512, n_tab_cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x2, cols, data)

    return call


def main():
    from sparse_tpu.kernels import build_row_ell, row_ell_spmv
    from sparse_tpu.kernels.row_ell import RowEll

    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    data = rng.random(lin.size, dtype=np.float32)
    x = rng.random(K, dtype=np.float32)
    nnz = lin.size

    re = build_row_ell(rows, cols, data, M, K)

    # flatten the tiers into one padded stream (pad to BLK multiple)
    BLK = 2048
    flat_cols = np.concatenate([np.asarray(c).ravel() for c, _ in re.tiers])
    flat_data = np.concatenate([np.asarray(d).ravel() for _, d in re.tiers])
    n_pad = -(-flat_cols.size // BLK) * BLK
    fc = np.zeros(n_pad, dtype=np.int32)
    fd = np.zeros(n_pad, dtype=np.float32)
    fc[: flat_cols.size] = flat_cols
    fd[: flat_data.size] = flat_data
    print(f"entries {flat_cols.size} padded {n_pad}", flush=True)

    # hi/lo split table
    x_hi = x.astype(np.float32).astype(jnp.bfloat16)
    x_lo = (x - np.asarray(x_hi, dtype=np.float32)).astype(jnp.bfloat16)
    x2_hilo = jnp.concatenate(
        [jnp.asarray(x_hi).reshape(512, 128), jnp.asarray(x_lo).reshape(512, 128)], axis=1
    )
    x2_bf16 = jnp.asarray(x_hi).reshape(512, 128)

    # per-tier slices for the XLA segment reduce
    slices = []
    off = 0
    for c, d in re.tiers:
        sz = int(np.prod(c.shape))
        slices.append((off, c.shape))
        off += sz

    def full_spmv(call):
        def f(x2, fcols, fdata, perm_inv):
            prods = call(x2, fcols, fdata).ravel()
            outs = []
            for (o, shp) in slices:
                t = prods[o : o + int(np.prod(shp))].reshape(shp)  # (r/G, w, G)
                outs.append(t.sum(axis=1).reshape(-1))
            pad = jnp.zeros(re.n_rows - re.nz_rows, jnp.float32)
            out_sorted = jnp.concatenate(outs + [pad])
            return jnp.take(out_sorted, perm_inv)

        return f

    oracle = np.zeros(M, dtype=np.float64)
    np.add.at(oracle, rows, data.astype(np.float64) * x.astype(np.float64)[cols])

    fcj = jnp.asarray(fc)
    fdj = jnp.asarray(fd)

    for hilo, x2 in ((True, x2_hilo), (False, x2_bf16)):
        for blk in (2048, 4096):
            label = f"{'hilo' if hilo else 'bf16'} blk={blk}"
            try:
                call = products_kernel(hilo, blk)
                f = full_spmv(call)
                out = np.asarray(f(x2, fcj, fdj, re.perm_inv))
                rel = np.abs(out - oracle).max() / np.abs(oracle).max()
                dt = bench(jax.jit(f), (x2, fcj, fdj, re.perm_inv))
                print(
                    f"{label}: {dt*1e3:.3f} ms = {nnz/dt/1e6:.1f} M nnz/s, relerr {rel:.2e}",
                    flush=True,
                )
            except Exception as e:
                print(f"{label}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)

    # reference: current row-ELL lane-gather SpMV
    xj = jnp.asarray(x)
    dt = bench(lambda tiers, pinv, xx: row_ell_spmv(RowEll(tiers, pinv, re.n_rows, re.n_cols, re.nz_rows), xx), (re.tiers, re.perm_inv, xj), perturb_idx=2)
    print(f"row_ell_spmv (current): {dt*1e3:.3f} ms = {nnz/dt/1e6:.1f} M nnz/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
