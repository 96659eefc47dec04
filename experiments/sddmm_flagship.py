"""Round-4: SDDMM flagship treatment (VERDICT r3 #4).

Bench-scale shape: 65536^2 mask, 2.1M nnz, d=128 factors (the SpMM
flagship's sparsity pattern; ref examples/sddmm_example.py:11-69 runs the
same computation at toy scale).

SoL accounting (v5e, 819 GB/s): any take-based scheme must materialize
two gathered row blocks (2 x nnz x 128 x 4 B = 2.15 GB written) and read
them once for the fused product+reduce (another 2.15 GB) => ~5.2 ms
"materialized" floor, or 2.6 ms if gathers fused straight into the
reduce (XLA does not fuse gathers into dot/reduce operands, so 5.2 is
the practical floor).  Output (nnz,) is noise.  Gather issue rate: 4.2M
512-B rows at the measured ~1.4 G rows/s stream rate ~= 3 ms, overlapped
with the writes.

Variants:
  A. shipped kernels.sddmm (two takes + lane reduce via sum)
  B. einsum contraction form (same ops, lets XLA pick the reduce)
  C. phase probes: lhs-gather-only / rhs-gather-only / product+reduce
     over pre-gathered blocks
  D. bf16 factor gathers (halves gather bytes; relerr ~1e-2 expected,
     accumulate f32)
  E. entry tile-reorder (sort entries by (row-tile, col-tile)): improves
     BOTH gathers' locality; timed without the unpermute (output order is
     a layout contract like RowEll's perm_inv) and with a fused
     row-ELL-style unpermute for the canonical-order cost.

Run: timeout 3600 python experiments/sddmm_flagship.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)

import numpy as np

import jax
import jax.numpy as jnp

M = K = 1 << 16
NNZ = 1 << 21
D = 128

_RTT = None


def bench(fn, args, iters=30, perturb_idx=0):
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
    from sparse_tpu.kernels import sddmm

    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    sd = rng.random(lin.size, dtype=np.float32)
    nnz = lin.size
    lhs = jnp.asarray(rng.random((M, D), dtype=np.float32))
    rhs = jnp.asarray(rng.random((D, K), dtype=np.float32))
    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    sd_j = jnp.asarray(sd)
    rhs_t = jnp.asarray(np.asarray(rhs).T.copy())

    # f64 oracle on a subsample for correctness (full f64 SDDMM on host is
    # ~2.1M x 128 flops, fine)
    lg64 = np.asarray(lhs, np.float64)[rows]
    rg64 = np.asarray(rhs, np.float64)[:, cols].T
    ref = sd.astype(np.float64) * np.sum(lg64 * rg64, axis=1)

    def check(out, tag, tol=1e-4):
        got = np.asarray(out, np.float64)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"  {tag} relerr {rel:.2e}", flush=True)

    def variant_a(lhs_, rhs_):
        return sddmm(rows_j, cols_j, sd_j, lhs_, rhs_)

    def variant_b(lhs_, rhs_t_):
        lg = jnp.take(lhs_, rows_j, axis=0)
        rg = jnp.take(rhs_t_, cols_j, axis=0)
        return sd_j * jnp.einsum(
            "ek,ek->e", lg, rg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def lhs_gather_only(lhs_, _):
        return jnp.take(lhs_, rows_j, axis=0).sum(axis=1)

    def rhs_gather_only(_, rhs_t_):
        return jnp.take(rhs_t_, cols_j, axis=0).sum(axis=1)

    lg_pre = jnp.take(lhs, rows_j, axis=0)
    rg_pre = jnp.take(rhs_t, cols_j, axis=0)

    def product_only(lg_, rg_):
        return sd_j * jnp.sum(lg_ * rg_, axis=-1)

    lhs16 = lhs.astype(jnp.bfloat16)
    rhs_t16 = rhs_t.astype(jnp.bfloat16)

    def variant_d(lhs16_, rhs_t16_):
        lg = jnp.take(lhs16_, rows_j, axis=0)
        rg = jnp.take(rhs_t16_, cols_j, axis=0)
        prod = lg.astype(jnp.float32) * rg.astype(jnp.float32)
        return sd_j * jnp.sum(prod, axis=-1)

    # E: tile reorder (row-tile 256 x col-tile 256 ordering)
    TR = 256
    tile_key = (rows // TR).astype(np.int64) * (K // TR) + (cols // TR)
    order = np.argsort(tile_key, kind="stable")
    perm_inv = np.empty(nnz, dtype=np.int32)
    perm_inv[order] = np.arange(nnz, dtype=np.int32)
    rows_t = jnp.asarray(rows[order])
    cols_t = jnp.asarray(cols[order])
    sd_t = jnp.asarray(sd[order])
    pinv_j = jnp.asarray(perm_inv)

    def variant_e_tileorder(lhs_, rhs_t_):
        lg = jnp.take(lhs_, rows_t, axis=0)
        rg = jnp.take(rhs_t_, cols_t, axis=0)
        return sd_t * jnp.sum(lg * rg, axis=-1)

    def variant_e_canonical(lhs_, rhs_t_):
        out_t = variant_e_tileorder(lhs_, rhs_t_)
        return jnp.take(out_t, pinv_j)

    print(f"nnz={nnz}", flush=True)
    jobs = [
        ("A shipped sddmm", variant_a, (lhs, rhs), 0),
        ("B einsum", variant_b, (lhs, rhs_t), 0),
        ("C lhs gather only", lhs_gather_only, (lhs, rhs_t), 0),
        ("C rhs gather only", rhs_gather_only, (lhs, rhs_t), 1),
        ("C product+reduce only", product_only, (lg_pre, rg_pre), 0),
        ("D bf16 gathers", variant_d, (lhs16, rhs_t16), 0),
        ("E tile-order (no unpermute)", variant_e_tileorder, (lhs, rhs_t), 0),
        ("E tile-order + unpermute", variant_e_canonical, (lhs, rhs_t), 0),
    ]
    for name, f, args, pidx in jobs:
        jf = jax.jit(f)
        out = jf(*args)
        if name.startswith(("A", "B", "D")):
            check(out, name, tol=1e-2 if "bf16" in name else 1e-4)
        elif name == "E tile-order + unpermute":
            check(out, name)
        dt = bench(jf, args, perturb_idx=pidx)
        print(f"{name}: {dt*1e3:.3f} ms = {nnz/dt/1e6:.0f} M nnz/s", flush=True)


if __name__ == "__main__":
    main()
