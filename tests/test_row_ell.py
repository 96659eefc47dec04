"""Row-ELL (degree-sorted tiered) SpMM/SpMV kernel tests (CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu.kernels import build_row_ell, row_ell_spmm, row_ell_spmv


def _random_problem(m, k, density, seed, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # hub rows: Zipf-ish degree distribution
        raw = rng.zipf(1.4, size=int(m * k * density * 3))
        rows = (raw[raw <= m] - 1).astype(np.int64)
        cols = rng.integers(0, k, size=rows.size)
        lin = np.unique(rows * k + cols)
    else:
        lin = np.unique(rng.integers(0, m * k, size=int(m * k * density), dtype=np.int64))
    rows, cols = (lin // k).astype(np.int64), (lin % k).astype(np.int64)
    data = rng.standard_normal(lin.size)
    return rows, cols, data


@pytest.mark.parametrize("shape,density", [((300, 200), 0.02), ((64, 512), 0.05), ((1000, 128), 0.005)])
@pytest.mark.parametrize("skew", [False, True])
def test_row_ell_spmm_matches_dense(shape, density, skew):
    m, k = shape
    rows, cols, data = _random_problem(m, k, density, seed=hash((m, k, skew)) % 2**31, skew=skew)
    dense = np.random.default_rng(1).standard_normal((k, 16))
    expected = np.zeros((m, 16))
    np.add.at(expected, rows, data[:, None] * dense[cols])

    re = build_row_ell(rows, cols, data, m, k)
    out = row_ell_spmm(re, jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10, atol=1e-12)

    x = dense[:, 0].copy()
    ref_v = np.zeros(m)
    np.add.at(ref_v, rows, data * x[cols])
    for lane in (False, True):
        outv = row_ell_spmv(re, jnp.asarray(x), lane_gather=lane)
        np.testing.assert_allclose(np.asarray(outv), ref_v, rtol=1e-10, atol=1e-12)


def _tier_problem():
    rng = np.random.default_rng(0)
    m, k = 500, 400
    rows = np.repeat(np.arange(m), rng.integers(0, 40, size=m))
    cols = rng.integers(0, k, size=rows.size)
    lin = np.unique(rows * k + cols)
    rows, cols = lin // k, lin % k
    data = rng.standard_normal(lin.size)
    return m, k, rows, cols, data


def test_row_ell_tier_structure_legacy():
    # legacy (r, w): widths quantized to multiples of min_pad; merge-capped
    m, k, rows, cols, data = _tier_problem()
    re = build_row_ell(rows, cols, data, m, k, min_pad=8, max_tiers=4, group=0)
    assert len(re.tiers) <= 4
    counts = np.bincount(rows, minlength=m)
    for c2, d2 in re.tiers:
        assert c2.ndim == 2 and c2.shape[1] % 8 == 0
        assert c2.shape == d2.shape
    # every row's entries survive with padding zero-valued
    total_nnz = sum(int((np.asarray(d2) != 0).sum()) for _, d2 in re.tiers)
    assert total_nnz == int((data != 0).sum())
    # tier capacity >= the widest row it holds
    start = 0
    sorted_counts = np.sort(counts)[::-1]
    for c2, _ in re.tiers:
        r, w = c2.shape
        assert w >= sorted_counts[start]
        start += r


def test_row_ell_tier_structure_grouped():
    # grouped (r/G, w, G): exact tier widths, rows padded to the group
    m, k, rows, cols, data = _tier_problem()
    re = build_row_ell(rows, cols, data, m, k, max_tiers=6, group=16)
    assert len(re.tiers) <= 6
    counts = np.bincount(rows, minlength=m)
    sorted_counts = np.sort(counts)[::-1]
    start = 0
    for c3, d3 in re.tiers:
        assert c3.ndim == 3 and c3.shape[2] == 16
        assert c3.shape == d3.shape
        w = c3.shape[1]
        assert w >= sorted_counts[start]
        start += c3.shape[0] * c3.shape[2]
    total_nnz = sum(int((np.asarray(d3) != 0).sum()) for _, d3 in re.tiers)
    assert total_nnz == int((data != 0).sum())
    # matvec correctness through the grouped layout
    x = np.random.default_rng(5).standard_normal(k)
    ref = np.zeros(m)
    np.add.at(ref, rows, data * x[cols])
    out = row_ell_spmv(re, jnp.asarray(x), lane_gather=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-12)


def test_row_ell_empty_and_degenerate():
    re = build_row_ell(np.array([], dtype=np.int64), np.array([], dtype=np.int64), np.array([]), 10, 7)
    out = row_ell_spmm(re, jnp.ones((7, 3)))
    np.testing.assert_array_equal(np.asarray(out), np.zeros((10, 3)))
    outv = row_ell_spmv(re, jnp.ones(7), lane_gather=False)
    np.testing.assert_array_equal(np.asarray(outv), np.zeros(10))

    # single dense-ish row
    rows = np.zeros(5, dtype=np.int64)
    cols = np.arange(5, dtype=np.int64)
    data = np.arange(1.0, 6.0)
    re = build_row_ell(rows, cols, data, 3, 5)
    out = row_ell_spmv(re, jnp.ones(5), lane_gather=True)
    np.testing.assert_allclose(np.asarray(out), [15.0, 0, 0])


def test_coo_to_row_ell_cached():
    a = sparse.random((128, 96), density=0.05, random_state=3)
    a.enable_caching()
    re1 = a.to_row_ell()
    re2 = a.to_row_ell()
    assert re1 is re2
    b = np.random.default_rng(0).standard_normal((96, 8))
    out = row_ell_spmm(re1, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a.todense() @ b, rtol=1e-10)


def test_row_ell_spmv_unaligned_k():
    # K not a multiple of 128 exercises the lane-gather pad path
    rows, cols, data = _random_problem(90, 200, 0.05, seed=7)
    re = build_row_ell(rows, cols, data, 90, 200)
    x = np.random.default_rng(2).standard_normal(200)
    ref = np.zeros(90)
    np.add.at(ref, rows, data * x[cols])
    out = row_ell_spmv(re, jnp.asarray(x), lane_gather=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-12)


def test_spmv_onehot_strategy_interpret():
    """The Pallas one-hot MXU SpMV (throughput path; hi|lo split ~1e-5
    relerr) vs the dense oracle, via the interpreter on CPU."""
    rng = np.random.default_rng(11)
    m, k = 150, 300
    dense = (rng.random((m, k)) * (rng.random((m, k)) < 0.05)).astype(np.float32)
    r, c = np.nonzero(dense)
    re = build_row_ell(r.astype(np.int32), c.astype(np.int32), dense[r, c], m, k)
    x = rng.random(k, dtype=np.float32)
    out = np.asarray(row_ell_spmv(re, jnp.asarray(x), strategy="onehot", interpret=True))
    expected = dense @ x
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-5)

    # empty matrix
    re0 = build_row_ell(
        np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.float32), 5, 7
    )
    out0 = np.asarray(row_ell_spmv(re0, jnp.ones(7, jnp.float32), strategy="onehot", interpret=True))
    np.testing.assert_array_equal(out0, np.zeros(5))
