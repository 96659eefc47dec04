"""Round-5 SpMM campaign: close 3.78 ms toward the 2.97 ms gather-issue
floor, or pin the residual per-lever (VERDICT r4 #1).

Shipped r4 point: grouped row-ELL + w-split2 + constant-embedded program
= 3.78 ms at the bench shape (65k^2, 2.1M nnz, N=128, exact f32).  The
residual ~0.8 ms over the gather floor is the gathered block's HBM round
trip that the reduce pays (XLA refuses gather->reduce operand fusion, so
G materializes).

Variants:
  A  shipped program (session baseline)
  B1 w-UNROLLED fused-add chain: acc += d_w * take(dense, c_w) per
     single w (elementwise adds DO fuse into gather consumers — if the
     whole chain fuses, G never round-trips HBM and the floor is the
     gather issue rate)
  B4 same with w-chunks of 4 (gather + small sum per step)
  C  asymmetric w-splits [1/4, 3/4] and [1/8, 3/8, 1/2]
  D  hi|lo bf16 dense table (integer-bit split, fold-proof): two bf16
     gather streams reconstructing ~f32 — VERDICT's opt-in lever; the
     per-row byte halving is paid back by double issue count, so predict
     negative; record the number either way
  E  phase probes: gather-only (512 B rows), gather-only N=64 (256 B
     rows — is the issue rate per-row or per-byte?), reduce-only on a
     pre-gathered block

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     timeout 5400 python experiments/spmm_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

M = K = 1 << 16
NNZ = 1 << 21
N = 128

_RTT = None


def bench(fn, args, iters=30, perturb_idx=0, label=""):
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
            aa[perturb_idx] = aa[perturb_idx] + eps
            out = fn(*aa)
            w = (jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) % 977 + 1) * 1e-6
            return carry + (out * w).sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        samples.append(max(total - _RTT, total * 0.1) / iters)
    med = sorted(samples)[1]
    print(f"{label:46s} {med * 1e3:8.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return med


def main():
    from sparse_tpu.kernels.row_ell import build_row_ell, row_ell_spmm_program

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, M * K, size=NNZ, dtype=np.int64))
    rows = (lin // K).astype(np.int32)
    cols = (lin % K).astype(np.int32)
    data = rng.random(lin.size, dtype=np.float32)
    nnz = lin.size
    dense = jnp.asarray(rng.random((K, N), dtype=np.float32))
    re = build_row_ell(rows, cols, data, M, K)
    widths = [int(c.shape[1]) for c, _ in re.tiers]
    print(f"nnz={nnz} tiers={len(re.tiers)} widths={widths} sum_w={sum(widths)}")

    # oracle
    import scipy.sparse as sp

    oracle = sp.coo_array((data, (rows, cols)), shape=(M, K)) @ np.asarray(dense, np.float64)

    def check(out, tag, tol=5e-5):
        got = np.asarray(out, np.float64)
        rel = np.abs(got - oracle).max() / np.abs(oracle).max()
        print(f"    {tag} relerr {rel:.2e}")
        assert rel < tol, (tag, rel)

    # A shipped
    prog = row_ell_spmm_program(re)
    check(prog(dense), "A")
    tA = bench(prog, (dense,), label="A shipped program (w-split2)")

    tiers, perm_inv, n_rows, nz_rows = re.tiers, re.perm_inv, re.n_rows, re.nz_rows

    def unrolled(chunk):
        @jax.jit
        def f(dn):
            outs = []
            for c, d in tiers:
                w = c.shape[1]
                o = None
                for s in range(0, w, chunk):
                    e = min(s + chunk, w)
                    g = jnp.take(dn, c[:, s:e], axis=0)  # (r/G, e-s, G, N)
                    p = (d[:, s:e, :, None] * g).sum(axis=1)
                    o = p if o is None else o + p
                outs.append(o.reshape(-1, N))
            pad = jnp.zeros((n_rows - nz_rows, N), jnp.float32)
            out_sorted = jnp.concatenate(outs + [pad], axis=0)
            return jnp.take(out_sorted, perm_inv, axis=0)

        return f

    for chunk, tag in [(4, "B4 w-unrolled chunk4"), (1, "B1 w-unrolled chunk1")]:
        if sum(-(-w // chunk) for w in widths) > 3000:
            print(f"    {tag}: skipped (too many steps)")
            continue
        f = unrolled(chunk)
        check(f(dense), tag)
        bench(f, (dense,), label=tag)

    # C asymmetric splits
    def asym(fracs):
        @jax.jit
        def f(dn):
            outs = []
            for c, d in tiers:
                w = c.shape[1]
                bnds = [0] + [max(1, int(w * x)) for x in np.cumsum(fracs[:-1])] + [w]
                bnds = sorted(set(min(b, w) for b in bnds))
                o = None
                for s0, s1 in zip(bnds[:-1], bnds[1:]):
                    g = jnp.take(dn, c[:, s0:s1], axis=0)
                    p = (d[:, s0:s1, :, None] * g).sum(axis=1)
                    o = p if o is None else o + p
                outs.append(o.reshape(-1, N))
            pad = jnp.zeros((n_rows - nz_rows, N), jnp.float32)
            return jnp.take(jnp.concatenate(outs + [pad], axis=0), perm_inv, axis=0)

        return f

    for fr, tag in [((0.25, 0.75), "C asym [1/4,3/4]"), ((0.125, 0.375, 0.5), "C asym [1/8,3/8,1/2]"), ((0.5, 0.5), "C sym [1/2,1/2] (ship-equal)")]:
        f = asym(fr)
        check(f(dense), tag)
        bench(f, (dense,), label=tag)

    # D hi|lo bf16 dense table (integer-bit hi split; fold-proof)
    bits = jax.lax.bitcast_convert_type(dense, jnp.int32)
    hi_bits = jax.lax.bitwise_and(bits + jnp.int32(0x8000), jnp.int32(~0xFFFF))
    hi = jax.lax.bitcast_convert_type(hi_bits, jnp.float32).astype(jnp.bfloat16)
    lo = (dense - jax.lax.bitcast_convert_type(hi_bits, jnp.float32)).astype(jnp.bfloat16)

    @jax.jit
    def hilo(hi_t, lo_t):
        outs = []
        for c, d in tiers:
            gh = jnp.take(hi_t, c, axis=0).astype(jnp.float32)
            gl = jnp.take(lo_t, c, axis=0).astype(jnp.float32)
            o = (d[:, :, :, None] * (gh + gl)).sum(axis=1)
            outs.append(o.reshape(-1, N))
        pad = jnp.zeros((n_rows - nz_rows, N), jnp.float32)
        return jnp.take(jnp.concatenate(outs + [pad], axis=0), perm_inv, axis=0)

    check(hilo(hi, lo), "D hilo", tol=5e-5)
    bench(hilo, (hi, lo), label="D hi|lo bf16 dual gather (exact-ish)")

    # E phase probes
    big_c = max(tiers, key=lambda t: t[0].size)[0]

    @jax.jit
    def gather_only(dn):
        g = jnp.take(dn, big_c, axis=0)
        return g

    bench(gather_only, (dense,), label=f"E gather-only biggest tier ({big_c.size} rows, 512B)")

    dense64 = dense[:, :64].copy()

    @jax.jit
    def gather_only64(dn):
        return jnp.take(dn, big_c, axis=0)

    bench(gather_only64, (dense64,), label="E gather-only same tier, N=64 (256B rows)")

    g_blk = jnp.take(dense, big_c, axis=0)
    big_d = max(tiers, key=lambda t: t[0].size)[1]

    @jax.jit
    def reduce_only(g):
        return (big_d[:, :, :, None] * g).sum(axis=1)

    bench(reduce_only, (g_blk,), label="E reduce-only on pre-gathered block")


if __name__ == "__main__":
    main()
