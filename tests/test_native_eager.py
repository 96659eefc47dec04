"""Native (C++) eager-path kernels: sorted-union join, fused {add,sub,mul}
merges, and the two-phase Gustavson SpGEMM — plus their integration into
``elemwise`` and ``_dot``.

Role parity targets: reference ``_umath.py:53 _match_arrays`` (two-pointer
join) and ``_common.py:543-717`` (CSR×CSR Numba kernels).
"""

import numpy as np
import pytest

import sparse_tpu as st
from sparse_tpu._utils import assert_eq, is_canonical
from sparse_tpu.native import eager


@pytest.fixture(autouse=True)
def _force_native(monkeypatch):
    if eager.get_lib() is None:
        pytest.skip("native eager lib unavailable")
    monkeypatch.setattr(eager, "NATIVE_MIN_NNZ", 0)


def test_union_join():
    ka = np.array([1, 3, 5, 7], dtype=np.int64)
    kb = np.array([2, 3, 8], dtype=np.int64)
    keys, ia, ib = eager.union_join(ka, kb)
    np.testing.assert_array_equal(keys, [1, 2, 3, 5, 7, 8])
    np.testing.assert_array_equal(ia, [0, -1, 1, 2, 3, -1])
    np.testing.assert_array_equal(ib, [-1, 0, 1, -1, -1, 2])


def test_union_join_empty_sides():
    ka = np.array([4, 9], dtype=np.int64)
    kb = np.empty(0, dtype=np.int64)
    keys, ia, ib = eager.union_join(ka, kb)
    np.testing.assert_array_equal(keys, ka)
    np.testing.assert_array_equal(ib, [-1, -1])
    keys, ia, ib = eager.union_join(kb, ka)
    np.testing.assert_array_equal(keys, ka)
    np.testing.assert_array_equal(ia, [-1, -1])


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("op", ["add", "subtract", "multiply"])
def test_fused_join_matches_numpy(op, dtype):
    rng = np.random.default_rng(0)
    n = 500
    ka = np.sort(rng.choice(5000, n, replace=False)).astype(np.int64)
    kb = np.sort(rng.choice(5000, n, replace=False)).astype(np.int64)
    va = rng.standard_normal(n).astype(dtype)
    vb = rng.standard_normal(n).astype(dtype)
    keys, vals = eager.fused_join(op, ka, va, kb, vb)
    da = np.zeros(5000, dtype=dtype)
    db = np.zeros(5000, dtype=dtype)
    da[ka] = va
    db[kb] = vb
    exp = getattr(np, op)(da, db)
    got = np.zeros(5000, dtype=dtype)
    got[keys] = vals
    np.testing.assert_array_equal(got, exp)
    # pruned: no stored +0.0 (bitwise)
    assert not np.any((vals == 0) & ~np.signbit(vals))


def test_fused_join_ieee_semantics():
    # multiply: a-only inf * fill 0.0 -> NaN must survive (not be pruned)
    ka = np.array([0], dtype=np.int64)
    va = np.array([np.inf])
    kb = np.array([1], dtype=np.int64)
    vb = np.array([2.0])
    keys, vals = eager.fused_join("multiply", ka, va, kb, vb)
    np.testing.assert_array_equal(keys, [0])
    assert np.isnan(vals[0])
    # subtract: b-only 0.0 - 1.0 = -1; matched 1-1 = +0.0 pruned; -0.0 kept
    ka = np.array([0, 1], dtype=np.int64)
    va = np.array([1.0, -0.0])
    kb = np.array([0, 2], dtype=np.int64)
    vb = np.array([1.0, 1.0])
    keys, vals = eager.fused_join("subtract", ka, va, kb, vb)
    np.testing.assert_array_equal(keys, [1, 2])
    assert np.signbit(vals[0]) and vals[0] == 0
    assert vals[1] == -1.0


@pytest.mark.parametrize("op", [np.add, np.subtract, np.multiply])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_elemwise_native_integration(op, dtype):
    rng = np.random.default_rng(3)
    shape = (17, 23, 5)
    d1 = (rng.random(shape) * (rng.random(shape) < 0.3)).astype(dtype)
    d2 = (rng.random(shape) * (rng.random(shape) < 0.3)).astype(dtype)
    x1, x2 = st.COO.from_numpy(d1), st.COO.from_numpy(d2)
    res = op(x1, x2)
    assert is_canonical(res)
    assert_eq(res, st.COO.from_numpy(op(d1, d2)))


def test_elemwise_generic_union_native_join():
    # non-fused ufunc still rides the native union join
    rng = np.random.default_rng(4)
    d1 = rng.random((40, 40)) * (rng.random((40, 40)) < 0.2)
    d2 = rng.random((40, 40)) * (rng.random((40, 40)) < 0.2)
    x1, x2 = st.COO.from_numpy(d1), st.COO.from_numpy(d2)
    assert_eq(np.maximum(x1, x2), st.COO.from_numpy(np.maximum(d1, d2)))
    assert_eq(x1 > x2, st.COO.from_numpy(d1 > d2))


def test_elemwise_native_nonzero_fill_uses_generic():
    # nonzero fill values must bypass the fused kernel but stay correct
    d1 = np.full((9, 9), 2.0)
    d1[0, 0] = 5.0
    d2 = np.full((9, 9), 3.0)
    d2[1, 1] = 7.0
    x1 = st.COO.from_numpy(d1, fill_value=2.0)
    x2 = st.COO.from_numpy(d2, fill_value=3.0)
    res = x1 + x2
    assert res.fill_value == 5.0
    np.testing.assert_array_equal(res.todense(), d1 + d2)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_spgemm_csr_vs_scipy(dtype):
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(5)
    A = sp.random(300, 200, 0.05, format="csr", random_state=rng).astype(dtype)
    B = sp.random(200, 250, 0.05, format="csr", random_state=rng).astype(dtype)
    pc, jc, vc = eager.spgemm_csr(
        A.indptr, A.indices, A.data, B.indptr, B.indices, B.data, 300, 250
    )
    C = sp.csr_matrix((vc, jc, pc), shape=(300, 250))
    assert abs(C - A @ B).max() < (1e-12 if dtype == np.float64 else 1e-5)
    # cols sorted within rows (canonical)
    for r in range(300):
        row = jc[pc[r] : pc[r + 1]]
        assert np.all(np.diff(row) > 0)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_matmul_native_integration(dtype):
    rng = np.random.default_rng(6)
    dA = (rng.random((50, 40)) * (rng.random((50, 40)) < 0.15)).astype(dtype)
    dB = (rng.random((40, 60)) * (rng.random((40, 60)) < 0.15)).astype(dtype)
    A, B = st.COO.from_numpy(dA), st.COO.from_numpy(dB)
    C = A @ B
    assert isinstance(C, st.COO)
    assert is_canonical(C)
    tol = 1e-12 if dtype == np.float64 else 1e-5
    np.testing.assert_allclose(C.todense(), dA @ dB, atol=tol)


def test_matmul_prunes_computed_zeros():
    # cancellation zeros are pruned from the result pattern (reference
    # builds every _dot output with prune=True, _common.py:378-495)
    dA = np.array([[1.0, -1.0]])
    dB = np.array([[1.0], [1.0]])
    C = st.COO.from_numpy(dA) @ st.COO.from_numpy(dB)
    assert C.nnz == 0
    assert C.todense()[0, 0] == 0.0


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("fmt", ["coo", "gcxs", "csr", "csc"])
def test_spmm_dense_native_integration(fmt, dtype):
    rng = np.random.default_rng(11)
    dA = (rng.random((37, 29)) * (rng.random((37, 29)) < 0.25)).astype(dtype)
    A = st.asarray(st.COO.from_numpy(dA), format=fmt)
    D = rng.random((29, 5)).astype(dtype)
    v = rng.random(29).astype(dtype)
    tol = 1e-12 if dtype == np.float64 else 1e-5
    np.testing.assert_allclose(A @ D, dA @ D, atol=tol)
    np.testing.assert_allclose(A @ v, dA @ v, atol=tol)
    L = rng.random((6, 37)).astype(dtype)
    np.testing.assert_allclose(L @ A, L @ dA, atol=tol)


def test_csr_spmm_dense_kernel_direct():
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(12)
    A = sp.random(200, 150, 0.1, format="csr", random_state=rng)
    D = rng.random((150, 17))
    out = eager.csr_spmm_dense(A.indptr, A.indices, A.data, D, 200)
    np.testing.assert_allclose(out, A @ D, atol=1e-12)
    v = rng.random(150)
    np.testing.assert_allclose(eager.csr_spmm_dense(A.indptr, A.indices, A.data, v, 200), A @ v, atol=1e-12)
    # N=1 column routes through the spmv kernel
    np.testing.assert_allclose(
        eager.csr_spmm_dense(A.indptr, A.indices, A.data, v[:, None], 200), (A @ v)[:, None], atol=1e-12
    )


def test_csc_spmm_dense_kernel_direct():
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(13)
    A = sp.random(120, 90, 0.1, format="csc", random_state=rng)
    D = rng.random((90, 33))
    out = eager.csc_spmm_dense(A.indptr, A.indices, A.data, D, 120, 90)
    np.testing.assert_allclose(out, A @ D, atol=1e-12)
    v = rng.random(90)
    np.testing.assert_allclose(eager.csc_spmm_dense(A.indptr, A.indices, A.data, v, 120, 90), A @ v, atol=1e-12)


def test_spmm_dense_nan_inf_semantics():
    # NaN/inf propagate exactly like the dense oracle (no zero-skip shortcuts)
    dA = np.array([[np.inf, 0.0], [1.0, np.nan]])
    A = st.COO.from_numpy(dA)
    D = np.array([[0.0, 1.0], [2.0, 3.0]])
    with np.errstate(invalid="ignore"):
        expected = dA @ D
    got = A @ D
    np.testing.assert_array_equal(np.isnan(got), np.isnan(expected))
    np.testing.assert_allclose(got[~np.isnan(got)], expected[~np.isnan(expected)])


@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_canonicalize2d_kernel(idx_dtype):
    rng = np.random.default_rng(21)
    M, K, n = 40, 30, 500
    rows = rng.integers(0, M, n).astype(idx_dtype)
    cols = rng.integers(0, K, n).astype(idx_dtype)
    vals = rng.standard_normal(n)
    ro, co, vo = eager.canonicalize2d(rows, cols, vals, M)
    assert ro.dtype == idx_dtype
    dense = np.zeros((M, K))
    np.add.at(dense, (rows, cols), vals)
    got = np.zeros((M, K))
    got[ro, co] = vo
    np.testing.assert_allclose(got, dense, rtol=1e-12)
    lin = ro.astype(np.int64) * K + co
    assert (np.diff(lin) > 0).all()


def test_canonicalize2d_ctor_integration(monkeypatch):
    from sparse_tpu import native as native_mod

    monkeypatch.setattr(native_mod, "NATIVE_MIN_SIZE", 0)
    rng = np.random.default_rng(22)
    n = 1000
    rows = rng.integers(0, 50, n)
    cols = rng.integers(0, 60, n)
    vals = rng.standard_normal(n)
    A = st.COO(np.stack([rows, cols]), vals, shape=(50, 60))
    assert is_canonical(A)
    dense = np.zeros((50, 60))
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(A.todense(), dense, rtol=1e-12)


@pytest.mark.parametrize("op", ["add", "subtract", "multiply"])
@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_fused_join_2d_kernel(op, idx_dtype):
    rng = np.random.default_rng(31)
    M, K = 40, 30
    lin_a = np.sort(rng.choice(M * K, 200, replace=False))
    lin_b = np.sort(rng.choice(M * K, 180, replace=False))
    ra, ca = (lin_a // K).astype(idx_dtype), (lin_a % K).astype(idx_dtype)
    rb, cb = (lin_b // K).astype(idx_dtype), (lin_b % K).astype(idx_dtype)
    va = rng.standard_normal(200)
    vb = rng.standard_normal(180)
    res = eager.fused_join_2d(op, ra, ca, va, rb, cb, vb, K)
    ro, co, vo = res
    assert ro.dtype == idx_dtype
    da = np.zeros((M, K))
    db = np.zeros((M, K))
    da[ra, ca] = va
    db[rb, cb] = vb
    exp = getattr(np, op)(da, db)
    got = np.zeros((M, K))
    got[ro, co] = vo
    np.testing.assert_array_equal(got, exp)
    lin_out = ro.astype(np.int64) * K + co
    assert (np.diff(lin_out) > 0).all()


@pytest.mark.parametrize("op", [np.add, np.subtract, np.multiply])
def test_gcxs_direct_elemwise(op):
    rng = np.random.default_rng(41)
    for axes in [(0,), (1,), (0, 2)]:
        ndim = max(axes) + 2
        shape = tuple(rng.integers(3, 9, ndim))
        d1 = rng.random(shape) * (rng.random(shape) < 0.4)
        d2 = rng.random(shape) * (rng.random(shape) < 0.4)
        g1 = st.GCXS.from_numpy(d1, compressed_axes=axes)
        g2 = st.GCXS.from_numpy(d2, compressed_axes=axes)
        r = op(g1, g2)
        assert isinstance(r, st.GCXS) and r.compressed_axes == axes
        np.testing.assert_allclose(r.todense(), op(d1, d2), rtol=1e-12)
        assert_eq(r.tocoo(), st.COO.from_numpy(op(d1, d2)))


def test_gcxs_direct_elemwise_mixed_axes_falls_back():
    rng = np.random.default_rng(42)
    d1 = rng.random((12, 10)) * (rng.random((12, 10)) < 0.4)
    d2 = rng.random((12, 10)) * (rng.random((12, 10)) < 0.4)
    c1 = st.GCXS.from_numpy(d1, compressed_axes=(0,))
    c2 = st.GCXS.from_numpy(d2, compressed_axes=(1,))
    np.testing.assert_allclose((c1 + c2).todense(), d1 + d2, rtol=1e-12)


# -- transpose2d / CSC buffers / fused dense@sparse ---------------------------------


@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_transpose2d_kernel(idx_dtype, dtype):
    rng = np.random.default_rng(7)
    n_rows, n_cols, nnz = 61, 97, 800
    lin = rng.choice(n_rows * n_cols, size=nnz, replace=False)
    lin.sort()
    rows = (lin // n_cols).astype(idx_dtype)
    cols = (lin % n_cols).astype(idx_dtype)
    vals = rng.standard_normal(nnz).astype(dtype)
    res = eager.transpose2d(rows, cols, vals, n_cols)
    assert res is not None
    indptr, rows_t, cols_t, vals_t = res
    # oracle: dense transpose
    dense = np.zeros((n_rows, n_cols), dtype=dtype)
    dense[rows, cols] = vals
    ref = st.COO.from_numpy(dense.T)
    np.testing.assert_array_equal(rows_t, np.asarray(ref.coords)[0])
    np.testing.assert_array_equal(cols_t, np.asarray(ref.coords)[1])
    np.testing.assert_array_equal(vals_t, np.asarray(ref.data))
    # indptr doubles as the CSC of the input
    np.testing.assert_array_equal(np.diff(indptr), np.bincount(cols, minlength=n_cols))


def test_transpose2d_empty_and_empty_columns():
    rows = np.empty(0, dtype=np.int64)
    vals = np.empty(0, dtype=np.float64)
    indptr, rows_t, cols_t, vals_t = eager.transpose2d(rows, rows.copy(), vals, 5)
    np.testing.assert_array_equal(indptr, np.zeros(6, dtype=np.int64))
    assert rows_t.size == 0 and vals_t.size == 0
    # single dense column among empties
    rows = np.arange(4, dtype=np.int64)
    cols = np.full(4, 2, dtype=np.int64)
    vals = np.arange(4, dtype=np.float64)
    indptr, rows_t, cols_t, vals_t = eager.transpose2d(rows, cols, vals, 5)
    np.testing.assert_array_equal(indptr, [0, 0, 0, 4, 4, 4])
    np.testing.assert_array_equal(cols_t, rows)
    np.testing.assert_array_equal(rows_t, cols)


def test_coo_transpose_uses_scatter_and_stays_canonical():
    rng = np.random.default_rng(3)
    n = 300
    S = st.random((n, n + 17), density=0.05, random_state=rng)
    T = S.transpose()
    assert is_canonical(T)
    assert_eq(T, st.COO.from_numpy(S.todense().T))


def test_tocsr_tocsc_native_matches_scipy():
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    S = st.random((83, 71), density=0.08, random_state=rng)
    coords = np.asarray(S.coords)
    ref = sp.coo_matrix((np.asarray(S.data), (coords[0], coords[1])), shape=S.shape)
    csr = S.tocsr()
    csc = S.tocsc()
    assert sp.issparse(csr) and csr.format == "csr"
    assert sp.issparse(csc) and csc.format == "csc"
    assert (csr != ref.tocsr()).nnz == 0
    assert (csc != ref.tocsc()).nnz == 0
    np.testing.assert_allclose(csr.toarray(), S.todense())
    np.testing.assert_allclose(csc.toarray(), S.todense())


def test_tocsr_nonzero_fill_raises():
    S = st.COO.from_numpy(np.arange(6).reshape(2, 3), fill_value=1)
    with pytest.raises(ValueError):
        S.tocsr()


@pytest.mark.parametrize("m_rows", [1, 2, 4, 32])
def test_dense_at_sparse_all_row_counts(m_rows):
    # crosses the M>=4 gather/scatter gating both ways
    rng = np.random.default_rng(m_rows)
    K, N = 120, 90
    S = st.random((K, N), density=0.07, random_state=rng)
    X = rng.standard_normal((m_rows, K))
    np.testing.assert_allclose(X @ S, X @ S.todense(), rtol=1e-12)
    xv = rng.standard_normal(K)
    np.testing.assert_allclose(xv @ S, xv @ S.todense(), rtol=1e-12)


def test_dense_at_sparse_cached_csc_buffers():
    rng = np.random.default_rng(5)
    K, N = 150, 60
    S = st.random((K, N), density=0.1, random_state=rng)
    X = rng.standard_normal((8, K))
    first = X @ S
    # the CSC buffers memoize on the instance and are reused by later calls
    assert getattr(S, "_csc_memo", None) is not None and S._csc_memo[0] is S.coords
    xv = rng.standard_normal(K)
    np.testing.assert_allclose(xv @ S, xv @ S.todense(), rtol=1e-12)
    np.testing.assert_allclose(first, X @ S.todense(), rtol=1e-12)


def test_dense_spmm_csrt_kernel_direct():
    rng = np.random.default_rng(9)
    K, N, M = 200, 130, 16
    S = st.random((K, N), density=0.06, random_state=rng)
    indptr, kids, vals = S._csc_buffers()
    X = rng.standard_normal((M, K))
    out = eager.dense_spmm_csrt(indptr, kids, vals, X, N)
    np.testing.assert_allclose(out, X @ S.todense(), rtol=1e-12)


@pytest.mark.parametrize(
    "dtype", [np.int64, np.int32, np.int8, np.bool_, np.float16, np.complex128, np.uint16]
)
def test_transpose2d_generic_dtypes(dtype):
    # the byte-scatter variant covers every POD dtype with the same
    # no-sort strategy; verified against the dense oracle
    rng = np.random.default_rng(3)
    d = (rng.random((211, 173)) * 4).astype(dtype) * (rng.random((211, 173)) < 0.3).astype(dtype)
    S = st.COO.from_numpy(d)
    coords = np.asarray(S.coords)
    res = eager.transpose2d(coords[0], coords[1], np.asarray(S.data), S.shape[1])
    assert res is not None
    _, rows_t, cols_t, vals_t = res
    ref = st.COO.from_numpy(d.T)
    np.testing.assert_array_equal(rows_t, np.asarray(ref.coords)[0])
    np.testing.assert_array_equal(cols_t, np.asarray(ref.coords)[1])
    np.testing.assert_array_equal(vals_t, np.asarray(ref.data))
    np.testing.assert_array_equal(S.T.todense(), d.T)


def test_pool_dispatch_stress_alternating_slot_counts():
    # Regression for the pool.h dispatch race: a straggler worker pairing a
    # stale generation with the NEXT dispatch's slot count could execute a
    # dispatch twice and release run() early (advisor r4, high).  The fix
    # packs (generation, slot_count) into one atomic word; here we hammer
    # many back-to-back threaded dispatches with alternating slot counts
    # and verify exact results every time.
    rng = np.random.default_rng(11)
    n = 1 << 19  # above the n >> 17 threading threshold
    keys_sorted = np.sort(rng.integers(0, 5000, n)).astype(np.int64)
    w = rng.standard_normal(n)
    keys_small = np.sort(rng.integers(0, 50, 1 << 18)).astype(np.int64)
    w_small = rng.standard_normal(1 << 18)
    exp_big = np.bincount(keys_sorted, weights=w, minlength=5000)
    exp_small = np.bincount(keys_small, weights=w_small, minlength=50)
    for _ in range(30):
        for keys, weights, exp in (
            (keys_sorted, w, exp_big),
            (keys_small, w_small, exp_small),
        ):
            idx, vals = eager.sorted_reduce_compact(keys, weights)
            dense = np.zeros(exp.shape[0])
            dense[idx] = vals
            np.testing.assert_allclose(dense, exp, rtol=1e-12, atol=1e-12)
            idx2, vals2 = eager.bincount_sum_compact(keys, weights, exp.shape[0])
            dense2 = np.zeros(exp.shape[0])
            dense2[idx2] = vals2
            np.testing.assert_allclose(dense2, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fmt,ca", [("gcxs", (0,)), ("gcxs", (1,)), ("coo", None)])
@pytest.mark.parametrize("regime", ["sparse_rows", "dense_rows"])
def test_matvec_add_fused_and_entry_paths(fmt, ca, regime):
    # Fused A@x+y (sparse.matvec_add) and the entry-loop matvec kernel
    # (nnz << n_rows routes to st_coo_spmv_acc/add — the spmv_add example
    # regime); dense-row inputs stay on the CSR/CSC kernels.
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    if regime == "sparse_rows":
        shape, density = (8000, 9000), 1e-5  # nnz ~ 720 << 8000 rows
    else:
        shape, density = (800, 900), 5e-2  # nnz ~ 36k >> 800 rows
    kw = {"compressed_axes": ca} if ca else {}
    m = st.random(shape, density=density, random_state=5, format=fmt, **kw)
    sm = sp.csr_array(m.to_scipy_sparse() if fmt == "gcxs" else m.tocsr())
    x = rng.standard_normal(shape[1])
    y = rng.standard_normal(shape[0])
    for _ in range(2):  # repeat: exercises the per-instance buffer memos
        np.testing.assert_allclose(np.asarray(m @ x), sm @ x, rtol=1e-10)
        np.testing.assert_allclose(st.matvec_add(m, x, y), sm @ x + y, rtol=1e-10)
    # f32 variant
    m32 = m.astype(np.float32)
    np.testing.assert_allclose(
        st.matvec_add(m32, x.astype(np.float32), y.astype(np.float32)),
        (sm @ x + y).astype(np.float32),
        rtol=1e-3,
        atol=1e-3,
    )


def test_matvec_add_semantics_match_expression():
    # same fill-value error and NaN warning as ``matmul(a, x) + y``;
    # generic fallbacks (non-float dtype, sparse y) agree with the expression
    import warnings as _w

    rng = np.random.default_rng(4)
    m = st.random((500, 400), density=0.01, random_state=9)
    x = rng.standard_normal(400)
    y = rng.standard_normal(500)
    bad = st.COO(m.coords, np.asarray(m.data), shape=m.shape, fill_value=1.0)
    with pytest.raises(ValueError):
        st.matvec_add(bad, x, y)
    xn = x.copy()
    xn[3] = np.nan
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        st.matvec_add(m, xn, y)
    assert sum("Nan will not be propagated" in str(r.message) for r in rec) == 1
    # int dtype falls back to the generic expression
    mi = st.COO(m.coords, np.ones(m.nnz, dtype=np.int64), shape=m.shape)
    xi = np.ones(400, dtype=np.int64)
    yi = np.arange(500)
    np.testing.assert_array_equal(st.matvec_add(mi, xi, yi), np.asarray(mi @ xi) + yi)
