"""Round-4 experiment: MTTKRP layout redesign (VERDICT r3 #1).

Phase split (r3): 67.5 ms total = 58.4 ms gathers+product + ~9 ms one-hot
scatter.  Taxes: 2x10.3M row gathers of 128-byte factor rows (~29 ms at
the 706 M rows/s issue bound) and (…, 32) intermediates physically padded
to 128 lanes (4x bytes on every materialized tensor).

Variants measured here (all vs the f64 host oracle):

  A. current ``ell_mttkrp`` (re-measure with a full-sum consumer)
  B. fold ``data`` into the one-hot scatter operand
     (W[b,e,n] = onehot * data): the materialized ``prod`` pass
     disappears (~13 ms of padded traffic)
  C. pair-product table: T2[j*K + k] = C[j] * D[k] built as one broadcast
     multiply (J*K rows, 32 lanes), ONE gather per entry instead of two,
     + the B fold.  Table build is timed inside the kernel (C/D change
     every ALS iteration).
  D. C with the product folded differently: g = take(C)[,]*take(D) fused,
     einsum directly (no prod materialization check).

Run: timeout 3600 python experiments/mttkrp_packed.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp

from sparse_tpu.kernels.ell import build_block_ell_3d, ell_mttkrp

_RTT = None


def bench(fn, args, iters=20, perturb_idx=0):
    """Scan-loop timing with a FULL-SUM consumer (no DCE slicing)."""
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
            return carry + out.sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        samples.append(max(total - _RTT, total * 0.1) / iters)
    return sorted(samples)[1]


def main():
    rng = np.random.default_rng(0)
    I, J, K, r = 100_000, 2000, 2000, 32
    lin = np.unique(rng.integers(0, I * J * K, size=10_000_000, dtype=np.int64))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size, dtype=np.float32)
    nnz = lin.size
    C = jnp.asarray(rng.random((J, r), dtype=np.float32))
    D = jnp.asarray(rng.random((K, r), dtype=np.float32))
    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
    n_blocks, cap = ej.shape
    block_rows = 128
    print(f"nnz={nnz} blocks={n_blocks} cap={cap}", flush=True)

    # f64 oracle
    ref = np.zeros((I, r), dtype=np.float64)
    Cn = np.asarray(C, dtype=np.float64)
    Dn = np.asarray(D, dtype=np.float64)
    np.add.at(ref, ci, tv[:, None].astype(np.float64) * Cn[cj] * Dn[ck])

    onehot_f = (
        np.asarray(er)[:, :, None] == np.arange(block_rows, dtype=np.int32)[None, None, :]
    ).astype(np.float32)

    # pair index for variant C
    pair = (np.asarray(ej).astype(np.int64) * K + np.asarray(ek)).astype(np.int32)
    pair_j = jnp.asarray(pair)

    def variant_a(Cv, Dv):
        return ell_mttkrp(er, ej, ek, ed, Cv, Dv, n_rows=I)

    def variant_b(Cv, Dv):
        g = (jnp.take(Cv, ej.reshape(-1), axis=0) * jnp.take(Dv, ek.reshape(-1), axis=0)).reshape(
            n_blocks, cap, r
        )
        onehot = (
            er[:, :, None] == jnp.arange(block_rows, dtype=er.dtype)[None, None, :]
        ).astype(ed.dtype)
        w = onehot * ed[:, :, None]
        out = jnp.einsum(
            "ben,ber->bnr", w, g, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(n_blocks * block_rows, r)[:I]

    def variant_c(Cv, Dv):
        # pair-product table: (J*K, r) — one broadcast multiply, then ONE
        # row gather per entry
        t2 = (Cv[:, None, :] * Dv[None, :, :]).reshape(J * K, r)
        g = jnp.take(t2, pair_j.reshape(-1), axis=0).reshape(n_blocks, cap, r)
        onehot = (
            er[:, :, None] == jnp.arange(block_rows, dtype=er.dtype)[None, None, :]
        ).astype(ed.dtype)
        w = onehot * ed[:, :, None]
        out = jnp.einsum(
            "ben,ber->bnr", w, g, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(n_blocks * block_rows, r)[:I]

    for name, f in [("A current", variant_a), ("B fold-data", variant_b), ("C pairtable", variant_c)]:
        out = np.asarray(jax.jit(f)(C, D))
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-30)
        dt = bench(jax.jit(f), (C, D))
        print(f"{name}: {dt*1e3:.2f} ms = {nnz/dt/1e6:.0f} M nnz/s  relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
