"""Round-5 SpGEMM v3 probe: the product gathers are the post-v2
bottleneck (~15-32 ms of the 55 ms flagship).  Split a-side vs b-side,
and try the WINDOW-SELECT for the a-side: e is non-decreasing, so each
64-product block's a-entries live in a 65-rank window — fetch 2 aligned
64-lane rows per field (row gathers) and one-hot-select per product
(VPU int select: exact for all bit patterns incl. NaN data), instead of
a (P, 4) row gather whose 4-lane rows tile-pad to 128 lanes (the
1.47 GB hidden stream; CLAUDE.md's (n,1)-padding trap at (n,4)).

Also probes a 3-field a-table (shift = startsb - starts_prod folds two
fields; b_idx = shift[e] + p).

Run: timeout 5400 python experiments/spgemm_gathers_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

_RTT = None


def bench(fn, args, iters=20, perturb=0, label=""):
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
            if jnp.issubdtype(aa[perturb].dtype, jnp.integer):
                aa[perturb] = aa[perturb] + i.astype(aa[perturb].dtype) * 0 + i.astype(aa[perturb].dtype) % 2
            else:
                aa[perturb] = aa[perturb] + i.astype(jnp.float32) * 1e-6
            out = fn(*aa)
            acc = carry
            for leaf in jax.tree_util.tree_leaves(out):
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
    print(f"{label:48s} {med * 1e3:8.3f} ms", flush=True)
    return med


def main():
    from sparse_tpu.kernels.search import searchsorted_sorted_probes
    from sparse_tpu.kernels.spgemm import _blocked_rank_grid, _f32_bits, product_count

    print(f"backend={jax.default_backend()}")
    m = kk = n = 65_536
    density = 1e-4
    rng = np.random.default_rng(0)

    def make(mm, kk_, seed):
        r = np.random.default_rng(seed)
        nnz = int(mm * kk_ * density)
        lin = np.unique(r.integers(0, mm * kk_, size=nnz, dtype=np.int64))
        return (lin // kk_).astype(np.int32), (lin % kk_).astype(np.int32), r.random(lin.size, dtype=np.float32)

    ra, ca, va = make(m, kk, 1)
    rb, cb, vb = make(kk, n, 2)
    P = product_count(ca, rb, kk)
    pcap = -(-max(int(P * 1.02) + 256, 1024) // 64) * 64
    nnz_a, nnz_b = va.size, vb.size
    print(f"nnz_a={nnz_a} nnz_b={nnz_b} P={P} pcap={pcap}")

    # host-side replication of the v2 prologue (fixed operands -> fixed e)
    counts_b = np.bincount(rb, minlength=kk)
    starts_b = np.concatenate([[0], np.cumsum(counts_b)[:-1]])
    repeats = counts_b[ca]
    startsb_a = starts_b[ca]
    order = np.argsort(repeats == 0, kind="stable")
    repeats, startsb_a, rows_az, data_az = repeats[order], startsb_a[order], ra[order], va[order]
    ends = np.cumsum(repeats)
    starts_prod = ends - repeats
    total = int(ends[-1])
    e_np = np.searchsorted(ends, np.arange(pcap), side="right").clip(0, nnz_a - 1)

    e_j = jnp.asarray(e_np.astype(np.int32))
    p_idx32 = jnp.arange(pcap, dtype=jnp.int32)
    valid = jnp.asarray((np.arange(pcap) < total))

    a_tab4 = jnp.asarray(
        np.stack([rows_az, starts_prod.astype(np.int32), startsb_a.astype(np.int32), data_az.view(np.int32)], axis=1)
    )
    shift = (startsb_a - starts_prod).astype(np.int32)
    a_tab3 = jnp.asarray(np.stack([rows_az, shift, data_az.view(np.int32)], axis=1))
    b_tab = jnp.asarray(np.stack([cb, vb.view(np.int32)], axis=1))
    b_idx_np = (shift[e_np] + np.arange(pcap)).clip(0, nnz_b - 1)
    b_idx = jnp.asarray(b_idx_np.astype(np.int32))

    # A1: (P,4) packed a-gather (v2 form)
    bench(lambda e_: jnp.take(a_tab4, e_, axis=0), (e_j,), label="A1 a-side (P,4) row gather")
    # A2: (P,3)
    bench(lambda e_: jnp.take(a_tab3, e_, axis=0), (e_j,), label="A2 a-side (P,3) row gather")

    # A3: window-select (VPU int one-hot over 2 aligned rows per block)
    nblk = pcap // 64
    npad = nnz_a // 64 + 2

    def field_tbl(f):
        return jnp.asarray(np.concatenate([f, np.zeros(npad * 64 - nnz_a, f.dtype)]).reshape(npad, 64))

    f_rows = field_tbl(rows_az.astype(np.int32))
    f_shift = field_tbl(shift)
    f_data = field_tbl(data_az.view(np.int32))
    e_blk0 = jnp.asarray(e_np.reshape(nblk, 64)[:, 0].astype(np.int32))  # first product's rank per block

    def window_select(e_):
        e2 = e_.reshape(nblk, 64)
        row0 = e_blk0 // 64
        li = e2 - (row0 * 64)[:, None]  # lane index in [0, 128)
        lanes = jnp.arange(128, dtype=jnp.int32)
        oh = (li[:, :, None] == lanes[None, None, :]).astype(jnp.int32)

        def sel(ft):
            g = jnp.concatenate([jnp.take(ft, row0, axis=0), jnp.take(ft, row0 + 1, axis=0)], axis=1)  # (nblk,128)
            return jnp.sum(oh * g[:, None, :], axis=2, dtype=jnp.int32).reshape(-1)

        return sel(f_rows), sel(f_shift), sel(f_data)

    out = window_select(e_j)
    # compare the VALID region only: past `total` the zero-repeat tie pile
    # makes e jump beyond the 2-row window (those products are masked off
    # in the kernel)
    vmask = np.arange(pcap) < total
    np.testing.assert_array_equal(np.asarray(out[0])[vmask], rows_az[e_np][vmask])
    np.testing.assert_array_equal(np.asarray(out[1])[vmask], shift[e_np][vmask])
    np.testing.assert_array_equal(np.asarray(out[2])[vmask], data_az.view(np.int32)[e_np][vmask])
    print("    window-select parity OK")
    bench(window_select, (e_j,), label="A3 a-side window-select (3 int fields, VPU)")

    # A4: window-select via one-hot f32 MXU einsum (index fields)
    def window_select_mxu(e_):
        e2 = e_.reshape(nblk, 64)
        row0 = e_blk0 // 64
        li = e2 - (row0 * 64)[:, None]
        lanes = jnp.arange(128, dtype=jnp.int32)
        oh = (li[:, :, None] == lanes[None, None, :]).astype(jnp.float32)

        def sel(ft):
            g = jnp.concatenate([jnp.take(ft, row0, axis=0), jnp.take(ft, row0 + 1, axis=0)], axis=1).astype(
                jnp.float32
            )
            return jnp.einsum("tpl,tl->tp", oh, g, precision=jax.lax.Precision.HIGHEST).reshape(-1)

        return sel(f_rows), sel(f_shift)

    bench(window_select_mxu, (e_j,), label="A4 a-side window-select (2 idx fields, MXU)")

    # B: b-side (P,2) gather
    bench(lambda bi: jnp.take(b_tab, bi, axis=0), (b_idx,), label="B1 b-side (P,2) row gather")

    # B2: b-side as 1-D int64 packed scalar gather (issue-bound reference)
    b_packed = jnp.asarray((cb.astype(np.int64) << 32) | (vb.view(np.uint32).astype(np.int64)))
    bench(lambda bi: jnp.take(b_packed, bi), (b_idx,), label="B2 b-side 1-D int64 scalar gather")


if __name__ == "__main__":
    main()
