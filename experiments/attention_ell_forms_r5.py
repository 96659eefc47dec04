"""Round-5: sparse_attention_ell formulation probe.

The shipped ELL route measured 54.6 ms / maxerr 7.7e-3 at 2.1M edges:
(a) its einsums ran at DEFAULT precision (TPU truncates f32 matmul
operands to bf16 — the repo's own HIGHEST rule, CLAUDE.md), and (b)
"ld,lcd->lc" is a batch-16384 matvec — poor MXU shape.  Variants:

  A shipped einsum (DEFAULT precision)      — baseline / error demo
  B einsum with precision=HIGHEST
  C VPU form: (q[:,None,:]*gk).sum(-1) and (attn[:,:,None]*gv).sum(1)
  D C + phase probes (gathers only / softmax only)

Run: timeout 4800 python experiments/attention_ell_forms_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

L = 1 << 14
DEG_MEAN = 128
D = 64

_RTT = None


def bench(fn, args, iters=20, label=""):
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
            aa[0] = aa[0] + i.astype(jnp.float32) * 1e-6
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
    print(f"{label:44s} {med * 1e3:8.2f} ms", flush=True)
    return med


def main():
    from sparse_tpu.nn import build_attention_ell

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    degs = np.clip(rng.poisson(DEG_MEAN, size=L), 1, 192)
    rows = np.repeat(np.arange(L, dtype=np.int32), degs)
    cols = rng.integers(0, L, size=rows.size).astype(np.int32)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keys = rows.astype(np.int64) * L + cols
    uniq = np.concatenate([[True], np.diff(keys) > 0])
    rows, cols = rows[uniq], cols[uniq]
    e_cols_np, valid_np = build_attention_ell(rows, cols, L)
    e_cols = jnp.asarray(e_cols_np)
    valid = jnp.asarray(valid_np)
    cap = e_cols_np.shape[1]
    print(f"edges={rows.size} cap={cap}")

    q = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    scale = jnp.float32(1.0 / np.sqrt(D))

    # oracle
    qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
    mask = np.zeros((L, L), bool)
    mask[rows, cols] = True
    oracle = np.empty((L, D))
    for i0 in range(0, L, 2048):
        s = (qn[i0 : i0 + 2048] @ kn.T) * float(scale)
        s[~mask[i0 : i0 + 2048]] = -np.inf
        m = s.max(axis=1, keepdims=True)
        e = np.exp(s - np.where(np.isfinite(m), m, 0))
        e[~mask[i0 : i0 + 2048]] = 0
        den = e.sum(axis=1, keepdims=True)
        oracle[i0 : i0 + 2048] = (e / np.where(den == 0, 1, den)) @ vn

    def softmax_part(scores):
        neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
        scores = jnp.where(valid, scores, neg_inf)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
        e = jnp.where(valid, e, 0)
        denom = e.sum(axis=1, keepdims=True)
        return e / jnp.where(denom == 0, 1, denom)

    def form_einsum(q_, prec):
        gk = jnp.take(k, e_cols, axis=0)
        scores = jnp.einsum("ld,lcd->lc", q_, gk, precision=prec) * scale
        attn = softmax_part(scores)
        gv = jnp.take(v, e_cols, axis=0)
        return jnp.einsum("lc,lcd->ld", attn, gv, precision=prec)

    def form_vpu(q_):
        gk = jnp.take(k, e_cols, axis=0)
        scores = (q_[:, None, :] * gk).sum(axis=-1) * scale
        attn = softmax_part(scores)
        gv = jnp.take(v, e_cols, axis=0)
        return (attn[:, :, None] * gv).sum(axis=1)

    for tag, fn in [
        ("A einsum DEFAULT (shipped)", lambda q_: form_einsum(q_, jax.lax.Precision.DEFAULT)),
        ("B einsum HIGHEST", lambda q_: form_einsum(q_, jax.lax.Precision.HIGHEST)),
        ("C VPU mul+sum", form_vpu),
    ]:
        out = np.asarray(fn(q))
        err = np.abs(out - oracle).max()
        t = bench(fn, (q,), label=tag)
        print(f"    maxerr {err:.2e}")

    # D phase probes
    bench(lambda q_: jnp.take(k, e_cols, axis=0) + q_[:1, None, :], (q,), label="D k-gather only (L,cap,64)")
    scores0 = (q[:, None, :] * jnp.take(k, e_cols, axis=0)).sum(axis=-1) * scale
    bench(softmax_part, (scores0,), label="D dense masked softmax only")


if __name__ == "__main__":
    main()
