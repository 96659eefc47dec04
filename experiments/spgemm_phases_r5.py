"""Round-5 SpGEMM v2 phase breakdown.

v2 (blocked-count expansion + backward scan + one-sort compaction) moved
the flagship shape 105.7 -> 90.1 ms but REGRESSED the ref shape
2.38 -> 3.94 ms.  Break the pipeline into cumulative prefixes to find
where both numbers live, and re-pin the true sort floor with a perturbed
(hoist-proof) probe.

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     timeout 5400 python experiments/spgemm_phases_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

_RTT = None


def bench(fn, args, iters=20, perturb=None, label=""):
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
            if perturb is not None:
                aa[perturb] = (
                    aa[perturb] + i.astype(jnp.float32).astype(aa[perturb].dtype)
                    if jnp.issubdtype(aa[perturb].dtype, jnp.integer)
                    else aa[perturb] + i.astype(jnp.float32) * 1e-6
                )
            out = fn(*aa)
            leaves = jax.tree_util.tree_leaves(out)
            acc = carry
            for leaf in leaves:
                w = (jnp.arange(leaf.size, dtype=jnp.float32).reshape(leaf.shape) % 977 + 1) * 1e-9
                acc = acc + (leaf.astype(jnp.float32) * w).sum()
            return acc, None

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
    print(f"  {label:44s} {med * 1e3:8.3f} ms", flush=True)
    return med


def run_shape(m, kk, n, density, tag):
    from sparse_tpu.kernels.search import searchsorted_sorted_probes
    from sparse_tpu.kernels.spgemm import _blocked_rank_grid, _f32_bits, _bits_f32, product_count

    def make(mm, kk_, seed):
        r = np.random.default_rng(seed)
        nnz = int(mm * kk_ * density)
        lin = np.unique(r.integers(0, mm * kk_, size=nnz, dtype=np.int64))
        return (lin // kk_).astype(np.int32), (lin % kk_).astype(np.int32), r.random(lin.size, dtype=np.float32)

    ra, ca, va = make(m, kk, 1)
    rb, cb, vb = make(kk, n, 2)
    P = product_count(ca, rb, kk)
    pcap = max(int(P * 1.02) + 256, 1024)
    print(f"[{tag}] nnz_a={va.size} nnz_b={vb.size} P={P} pcap={pcap}", flush=True)
    nnz_a, nnz_b = va.size, vb.size
    raj, caj, vaj = map(jnp.asarray, (ra, ca, va))
    rbj, cbj, vbj = map(jnp.asarray, (rb, cb, vb))

    # true sort floors (hoist-proof: integer perturbation)
    keys64 = jnp.asarray(np.random.default_rng(0).integers(0, m * n, size=pcap, dtype=np.int64))
    vals = jnp.asarray(np.random.default_rng(1).random(pcap, dtype=np.float32))
    bench(lambda ks: jnp.sort(ks), (keys64,), perturb=0, label="sort floor: 1x int64 sort")
    bench(
        lambda ks, v: jax.lax.sort((ks, v), num_keys=1),
        (keys64, vals),
        perturb=0,
        label="sort floor: co-sort (int64, f32)",
    )

    # cumulative pipeline prefixes
    def p1(va_):
        edges = searchsorted_sorted_probes(rbj, jnp.arange(kk + 1, dtype=rbj.dtype), side="left")
        counts_b = jnp.diff(edges)
        starts_b = edges[:-1]
        repeats = counts_b[caj]
        startsb_a = starts_b[caj]
        return repeats + startsb_a + va_.astype(jnp.int64).sum()

    bench(p1, (vaj,), perturb=0, label="P1 B-seg searchsorted + per-A gathers")

    def stages(va_, upto):
        edges = searchsorted_sorted_probes(rbj, jnp.arange(kk + 1, dtype=rbj.dtype), side="left")
        counts_b = jnp.diff(edges)
        starts_b = edges[:-1]
        repeats = counts_b[caj]
        startsb_a = starts_b[caj]
        zkey = (repeats == 0).astype(jnp.int32)
        _, repeats, startsb_a, rows_az, data_bits = jax.lax.sort(
            (zkey, repeats, startsb_a.astype(jnp.int64), raj.astype(jnp.int32), _f32_bits(va_)),
            num_keys=1,
            is_stable=True,
        )
        ends = jnp.cumsum(repeats)
        starts_prod = ends - repeats
        total = ends[-1]
        if upto == 2:
            return ends
        e = _blocked_rank_grid(ends.astype(jnp.int64), pcap)
        if upto == 3:
            return e
        p_idx = jnp.arange(pcap, dtype=jnp.int64)
        e_c = jnp.clip(e, 0, nnz_a - 1)
        valid = p_idx < total
        a_tab = jnp.stack([rows_az.astype(jnp.int32), starts_prod.astype(jnp.int32), startsb_a.astype(jnp.int32), data_bits], axis=1)
        ga = jnp.take(a_tab, e_c, axis=0)
        within = p_idx.astype(jnp.int32) - ga[:, 1]
        b_idx = jnp.clip(ga[:, 2] + within, 0, nnz_b - 1)
        b_tab = jnp.stack([cbj.astype(jnp.int32), _f32_bits(vbj)], axis=1)
        gb = jnp.take(b_tab, b_idx, axis=0)
        out_i = jnp.where(valid, ga[:, 0], jnp.iinfo(jnp.int32).max).astype(jnp.int64)
        out_j = jnp.where(valid, gb[:, 0], 0).astype(jnp.int64)
        v = jnp.where(valid, _bits_f32(ga[:, 3]) * _bits_f32(gb[:, 1]), 0.0)
        if upto == 4:
            return v + out_i.astype(jnp.float32) + out_j.astype(jnp.float32)
        key = out_i * n + out_j
        key_s, v_s = jax.lax.sort((key, v), num_keys=1)
        if upto == 5:
            return v_s
        is_new = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]]) & (
            key_s < jnp.asarray(jnp.iinfo(jnp.int32).max, key.dtype) * n
        )
        seg = jnp.cumsum(is_new) - 1
        x = v_s
        d = 1
        while d < pcap:
            same = seg[d:] == seg[:-d]
            x = x + jnp.concatenate([jnp.where(same, x[d:], 0), jnp.zeros(d, x.dtype)])
            d *= 2
        if upto == 6:
            return x
        big = jnp.asarray(np.iinfo(np.int64).max, key.dtype)
        ck = jnp.where(is_new, key_s, big)
        cv = jnp.where(is_new, x, 0)
        ck_s, cv_s = jax.lax.sort((ck, cv), num_keys=1)
        return ck_s[:pcap], cv_s[:pcap]

    for u, lbl in [
        (2, "P2 + zero-tail co-sort + cumsum"),
        (3, "P3 + blocked-count e grid"),
        (4, "P4 + packed product gathers"),
        (5, "P5 + (key,v) co-sort"),
        (6, "P6 + backward segmented scan"),
        (7, "P7 + compaction co-sort (FULL)"),
    ]:
        bench(lambda va_, u=u: stages(va_, u), (vaj,), perturb=0, label=lbl)


def main():
    print(f"backend={jax.default_backend()}")
    run_shape(100_000, 100_000, 100_000, 1e-5, "ref-100k@1e-5")
    run_shape(65_536, 65_536, 65_536, 1e-4, "flagship-65k@1e-4")


if __name__ == "__main__":
    main()
