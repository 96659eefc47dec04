"""Round-5 MTTKRP: exact analogue of the hilo byte-halving (VERDICT r4 #7).

The exact path's factor gathers materialize 4x-lane-padded (E, r=32) f32
streams (512 B/row after tile padding).  The r4 hilo mode halves that
with (J, 2r) bf16 split tables (256 B/row) at relerr 1.7e-6.  The EXACT
equivalent: split each f32 into its two 16-bit halves stored as an
(J, 2r) int16 table — same 256 B/row gathers, and
``(hi << 16) | (lo & 0xffff)`` reconstructs the ORIGINAL f32 bitwise, so
results are bit-identical to the exact path.

Variants (bench shape: 100k x 2k x 2k, 10M nnz, J=32):
  A exact scan-over-blocks (shipped r4: 51.8 ms)
  B int16-split monolithic
  C int16-split + scan-over-blocks
  D hilo bf16 (shipped r4 reference: 44.7 ms, relerr ~1e-6)

Run: timeout 5400 python experiments/mttkrp_exact16_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

I_, J_, K_ = 100_000, 2000, 2000
NNZ = 10_000_000
R = 32

_RTT = None


def bench(fn, args, iters=10, perturb_idx=0, label=""):
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
            aa = list(a)
            aa[perturb_idx] = aa[perturb_idx] + i.astype(jnp.float32) * 1e-6
            out = fn(*aa)
            w = (jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) % 977 + 1) * 1e-6
            return carry + (out * w).sum().astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(run(*args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        samples.append(max(total - _RTT, total * 0.1) / iters)
    med = sorted(samples)[1]
    print(f"{label:40s} {med * 1e3:8.2f} ms", flush=True)
    return med


def split16(t):
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    hi = (bits >> 16).astype(jnp.int16)
    lo = bits.astype(jnp.int16)  # wraps: low 16 bits
    return jnp.concatenate([hi, lo], axis=1)  # (J, 2r) int16


def recon16(g, r):
    hi = g[..., :r].astype(jnp.int32) << 16
    lo = g[..., r:].astype(jnp.int32) & jnp.int32(0xFFFF)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def main():
    from sparse_tpu.kernels.ell import MTTKRP_SCAN_GROUP, build_block_ell_3d, ell_mttkrp

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    lin = np.unique(rng.integers(0, I_ * J_ * K_, size=NNZ, dtype=np.int64))
    ci = (lin // (J_ * K_)).astype(np.int32)
    cj = (lin // K_ % J_).astype(np.int32)
    ck = (lin % K_).astype(np.int32)
    tv = rng.random(lin.size, dtype=np.float32)
    print(f"nnz={lin.size}")
    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I_)
    er, ej, ek, ed = map(jnp.asarray, (er, ej, ek, ed))
    C = jnp.asarray(rng.random((J_, R), dtype=np.float32))
    D = jnp.asarray(rng.random((K_, R), dtype=np.float32))
    n_blocks, cap = ej.shape
    block_rows = 128

    # exact reference output (shipped path)
    ref = np.asarray(ell_mttkrp(er, ej, ek, ed, C, D, n_rows=I_), np.float64)

    def check(out, tag, exact=True):
        got = np.asarray(out, np.float64)
        if exact:
            same = np.array_equal(got, ref)
            rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
            print(f"    {tag}: bit-identical={same} relerr={rel:.2e}")
        else:
            rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
            print(f"    {tag}: relerr={rel:.2e}")

    check(ell_mttkrp(er, ej, ek, ed, C, D, n_rows=I_, strategy="exact"), "A")
    bench(lambda c_, d_: ell_mttkrp(er, ej, ek, ed, c_, d_, n_rows=I_, strategy="exact"), (C, D), label="A exact scan (shipped)")

    # B int16-split monolithic
    def mono16(c_, d_):
        c2 = split16(c_)
        d2 = split16(d_)
        gc = jnp.take(c2, ej.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * R)
        gd = jnp.take(d2, ek.reshape(-1), axis=0).reshape(n_blocks, cap, 2 * R)
        g = recon16(gc, R) * recon16(gd, R)
        prod = ed[:, :, None] * g
        oh = (er[:, :, None] == jnp.arange(block_rows, dtype=er.dtype)[None, None, :]).astype(prod.dtype)
        out = jnp.einsum("ber,ben->bnr", prod, oh, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return out.reshape(n_blocks * block_rows, R)[:I_]

    check(mono16(C, D), "B", exact=True)
    bench(mono16, (C, D), label="B int16-split monolithic")

    # C int16-split + scan over block groups
    group = MTTKRP_SCAN_GROUP
    nb = -(-n_blocks // group) * group
    pb = nb - n_blocks

    def padb(x):
        if pb == 0:
            return x
        return jnp.concatenate([x, jnp.zeros((pb,) + x.shape[1:], x.dtype)], axis=0)

    erp = padb(er).reshape(nb // group, group, cap)
    ejp = padb(ej).reshape(nb // group, group, cap)
    ekp = padb(ek).reshape(nb // group, group, cap)
    edp = padb(ed).reshape(nb // group, group, cap)

    def scan16(c_, d_):
        c2 = split16(c_)
        d2 = split16(d_)

        def body(_, x):
            erx, ejx, ekx, edx = x
            gc = jnp.take(c2, ejx.reshape(-1), axis=0).reshape(group, cap, 2 * R)
            gd = jnp.take(d2, ekx.reshape(-1), axis=0).reshape(group, cap, 2 * R)
            g_ = recon16(gc, R) * recon16(gd, R)
            prod_ = edx[:, :, None] * g_
            oh = (erx[:, :, None] == jnp.arange(block_rows, dtype=erx.dtype)[None, None, :]).astype(prod_.dtype)
            out_ = jnp.einsum("ben,ber->bnr", oh, prod_, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            return None, out_

        _, outs = jax.lax.scan(body, None, (erp, ejp, ekp, edp))
        return outs.reshape(nb * block_rows, R)[:I_]

    check(scan16(C, D), "C", exact=True)
    bench(scan16, (C, D), label="C int16-split + scan")

    # D hilo reference
    check(ell_mttkrp(er, ej, ek, ed, C, D, n_rows=I_, strategy="hilo"), "D", exact=False)
    bench(lambda c_, d_: ell_mttkrp(er, ej, ek, ed, c_, d_, n_rows=I_, strategy="hilo"), (C, D), label="D hilo bf16 (shipped)")


if __name__ == "__main__":
    main()
