"""Round-5: segmented-softmax roofline + rebuild (VERDICT r4 #3).

r4 shipped 30.3 ms at 2M attention edges for what is ~2.5 ms of
Hillis-Steele traffic.  Hypothesis from the TPU cost model (CLAUDE.md):
the scans are fine — the cost is the TWO per-entry broadcast gathers
``row_max[rows]`` / ``denom[rows]`` (2M scalar gathers from a small table
issue at ~140 M/s => ~14 ms EACH) plus the row-tail searchsorted.

Variants (L=16384 rows x degree 128 = 2.10M edges, f32):
  A. r4 form (fwd scans + searchsorted row tails + [rows] gathers)
  B. r5 shipped form: fwd scan + BACKWARD max-scan propagation
     (all-positional; no gathers, no searchsorted)
  C. phase probes: one fwd max scan / one bwd max scan / one [rows]
     broadcast gather / exp+div epilogue
  D. blocked two-level scan (intra-block along lanes + carry fixup) if B
     still exceeds the ~2.5 ms traffic bound

Parity: vs numpy segment-op oracle at full size.

Run: timeout 3600 python experiments/softmax_scan_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

L = 1 << 14
DEG = 128
N = L * DEG

_RTT = None


def bench(fn, args, iters=30, perturb_idx=0, consumer=None):
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
    if consumer is None:
        w = jnp.arange(1, N + 1, dtype=jnp.float32) * (1.0 / N)
        consumer = lambda out: (out * w[: out.shape[0]]).sum()  # order-dependent

    @jax.jit
    def run(*a):
        def body(carry, i):
            eps = i.astype(jnp.float32) * 1e-6
            aa = list(a)
            aa[perturb_idx] = (aa[perturb_idx] + eps.astype(aa[perturb_idx].dtype)).astype(a[perturb_idx].dtype)
            out = fn(*aa)
            return carry + consumer(out).astype(jnp.float32), None

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
    import sparse_tpu.nn as nn_mod
    from sparse_tpu.kernels.search import searchsorted_sorted_probes
    from sparse_tpu.nn import _seg_scan_sorted, _seg_scan_sorted_rev

    print(f"backend={jax.default_backend()}  N={N}  L={L}")
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(L, dtype=np.int32), DEG)
    scores = rng.normal(size=N).astype(np.float32)
    rows_j = jnp.asarray(rows)
    scores_j = jnp.asarray(scores)
    neg_inf = jnp.float32(-np.inf)

    # numpy oracle
    sh = scores.reshape(L, DEG)
    m = sh.max(axis=1, keepdims=True)
    e = np.exp(sh - m)
    ref = (e / e.sum(axis=1, keepdims=True)).ravel()

    def r4_form(s, r):
        m = _seg_scan_sorted(s, r, jnp.maximum, neg_inf)
        row_last = jnp.clip(searchsorted_sorted_probes(r, jnp.arange(L, dtype=r.dtype), "right") - 1, 0, N - 1)
        row_max = m[row_last]
        shifted = s - jnp.where(jnp.isfinite(row_max), row_max, 0)[r]
        expd = jnp.exp(shifted)
        ssum = _seg_scan_sorted(expd, r, jnp.add, jnp.float32(0))
        denom = ssum[row_last]
        return expd / jnp.where(denom == 0, 1, denom)[r]

    def r5_form(s, r):
        return nn_mod.segment_softmax(s, r, n_rows=L)

    for tag, fn in [("A r4 (searchsorted + [rows] gathers)", r4_form), ("B r5 (bwd-scan propagation)", r5_form)]:
        got = np.asarray(fn(scores_j, rows_j))
        err = np.abs(got - ref).max()
        t = bench(fn, (scores_j, rows_j))
        print(f"{tag:42s} {t * 1e3:8.2f} ms   maxerr {err:.2e}")

    # C: phase probes
    probes = [
        ("fwd max scan alone", lambda s, r: _seg_scan_sorted(s, r, jnp.maximum, neg_inf)),
        ("bwd max scan alone", lambda s, r: _seg_scan_sorted_rev(s, r, jnp.maximum, neg_inf)),
        ("fwd add scan alone", lambda s, r: _seg_scan_sorted(s, r, jnp.add, jnp.float32(0))),
        ("[rows] broadcast gather alone", lambda s, r: (s[:L].astype(jnp.float32))[r]),
        ("exp+div epilogue alone", lambda s, r: jnp.exp(s) / (jnp.abs(s) + 1)),
        (
            "searchsorted row tails alone",
            lambda s, r: searchsorted_sorted_probes(r, jnp.arange(L, dtype=r.dtype), "right").astype(jnp.float32) + s[:L],
        ),
    ]
    for tag, fn in probes:
        t = bench(fn, (scores_j, rows_j))
        print(f"C {tag:40s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
