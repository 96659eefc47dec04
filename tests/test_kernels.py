"""XLA kernel tests (the Numba-kernel-equivalent layer): SpMM/SpMV/SDDMM/
MTTKRP/ELL against numpy oracles, plus jit/pytree integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu.kernels import (
    build_block_ell,
    coo_spmm,
    coo_spmv,
    dense_coo_matmul,
    ell_spmm,
    ell_spmv,
    mttkrp,
    sddmm,
    uncompress_indptr,
)


@pytest.fixture
def problem():
    m, k, n = 40, 30, 8
    a = sparse.random((m, k), density=0.1, random_state=0)
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    data = jnp.asarray(np.asarray(a.data))
    dense = jnp.asarray(np.random.default_rng(1).random((k, n)))
    return a, rows, cols, data, dense, m, k, n


def test_coo_spmm(problem):
    a, rows, cols, data, dense, m, k, n = problem
    out = coo_spmm(rows, cols, data, dense, n_rows=m)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(dense))


def test_coo_spmm_cumsum(problem):
    a, rows, cols, data, dense, m, k, n = problem
    out = coo_spmm(rows, cols, data, dense, n_rows=m, strategy="cumsum")
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(dense), rtol=1e-10)


def test_coo_spmv(problem):
    a, rows, cols, data, dense, m, k, n = problem
    x = jnp.asarray(np.random.default_rng(2).random(k))
    out = coo_spmv(rows, cols, data, x, n_rows=m)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(x))


def test_dense_coo_matmul(problem):
    a, rows, cols, data, dense, m, k, n = problem
    lhs = jnp.asarray(np.random.default_rng(3).random((7, m)))
    out = dense_coo_matmul(lhs, rows, cols, data, n_out_cols=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lhs) @ a.todense())


def test_sddmm(problem):
    a, rows, cols, data, dense, m, k, n = problem
    lhs = jnp.asarray(np.random.default_rng(4).random((m, 6)))
    rhs = jnp.asarray(np.random.default_rng(5).random((6, k)))
    vals = sddmm(rows, cols, data, lhs, rhs)
    full = np.asarray(lhs) @ np.asarray(rhs)
    expected = np.asarray(data) * full[np.asarray(rows), np.asarray(cols)]
    np.testing.assert_allclose(np.asarray(vals), expected)


def test_sddmm_chunked_matches_monolithic():
    # nnz above SDDMM_CHUNK_MIN_NNZ takes the scan-chunked path (r4);
    # results must match the monolithic form (incl. the pad tail)
    from sparse_tpu.kernels.dot import SDDMM_CHUNK_MIN_NNZ

    rng = np.random.default_rng(11)
    m = k = 2048
    nnz = SDDMM_CHUNK_MIN_NNZ + 1234  # non-multiple of chunk: pad exercised
    rows = jnp.asarray(np.sort(rng.integers(0, m, nnz)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, k, nnz).astype(np.int32))
    vals = jnp.asarray(rng.random(nnz, dtype=np.float32))
    lhs = jnp.asarray(rng.random((m, 16), dtype=np.float32))
    rhs = jnp.asarray(rng.random((16, k), dtype=np.float32))
    out = np.asarray(sddmm(rows, cols, vals, lhs, rhs))
    lg = np.asarray(lhs)[np.asarray(rows)]
    rg = np.asarray(rhs).T[np.asarray(cols)]
    expected = np.asarray(vals) * np.sum(lg * rg, axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_mttkrp():
    t = sparse.random((20, 10, 12), density=0.05, random_state=0)
    c = np.random.default_rng(1).random((10, 4))
    d = np.random.default_rng(2).random((12, 4))
    coords = np.asarray(t.coords)
    out = mttkrp(
        jnp.asarray(coords[0]), jnp.asarray(coords[1]), jnp.asarray(coords[2]),
        jnp.asarray(np.asarray(t.data)), jnp.asarray(c), jnp.asarray(d), n_rows=20,
    )
    expected = np.einsum("ijk,jr,kr->ir", t.todense(), c, d)
    np.testing.assert_allclose(np.asarray(out), expected)


def test_uncompress_indptr():
    indptr = jnp.asarray(np.array([0, 2, 2, 5, 6]))
    rows = uncompress_indptr(indptr, 6)
    np.testing.assert_array_equal(np.asarray(rows), [0, 0, 2, 2, 2, 3])


@pytest.mark.parametrize("block_rows", [8, 128])
def test_block_ell(problem, block_rows):
    a, rows, cols, data, dense, m, k, n = problem
    ell = build_block_ell(np.asarray(rows), np.asarray(cols), np.asarray(data), m, k, block_rows=block_rows)
    out = ell_spmm(ell.e_rows, ell.e_cols, ell.e_data, dense, n_rows=m, block_rows=block_rows)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(dense), rtol=1e-10)
    x = jnp.asarray(np.random.default_rng(2).random(k))
    outv = ell_spmv(ell.e_rows, ell.e_cols, ell.e_data, x, n_rows=m, block_rows=block_rows)
    np.testing.assert_allclose(np.asarray(outv), a.todense() @ np.asarray(x), rtol=1e-10)


def test_block_ell_empty():
    ell = build_block_ell(np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0), 16, 16)
    out = ell_spmm(ell.e_rows, ell.e_cols, ell.e_data, jnp.ones((16, 4)), n_rows=16)
    np.testing.assert_allclose(np.asarray(out), np.zeros((16, 4)))


def test_coo_pytree_jit():
    a = sparse.random((10, 8), density=0.3, random_state=0)

    @jax.jit
    def f(a, b):
        return coo_spmm(jnp.asarray(a.coords[0]), jnp.asarray(a.coords[1]), jnp.asarray(a.data), b, n_rows=a.shape[0])

    b = jnp.asarray(np.random.default_rng(1).random((8, 3)))
    np.testing.assert_allclose(np.asarray(f(a, b)), a.todense() @ np.asarray(b))


def test_gcxs_pytree_flatten():
    g = sparse.random((6, 8), density=0.3, random_state=0, format="gcxs")
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(g2.todense(), g.todense())


def test_vmap_over_coo_data():
    a = sparse.random((10, 8), density=0.3, random_state=0)
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    datas = jnp.stack([jnp.asarray(np.asarray(a.data)) * (i + 1) for i in range(3)])
    b = jnp.asarray(np.random.default_rng(1).random((8, 3)))
    outs = jax.vmap(lambda d: coo_spmm(rows, cols, d, b, n_rows=10))(datas)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(outs[i]), (i + 1) * (a.todense() @ np.asarray(b)))


def test_grad_through_spmm():
    a = sparse.random((6, 5), density=0.4, random_state=0)
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    data = jnp.asarray(np.asarray(a.data))
    b = jnp.asarray(np.random.default_rng(1).random((5, 2)))

    def loss(data):
        return coo_spmm(rows, cols, data, b, n_rows=6).sum()

    g = jax.grad(loss)(data)
    # d(loss)/d(data_e) = sum_j b[col_e, j]
    expected = np.asarray(b).sum(axis=1)[np.asarray(cols)]
    np.testing.assert_allclose(np.asarray(g), expected)


def test_esc_spgemm_traceable():
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    a = sparse.random((25, 20), density=0.2, random_state=0)
    b = sparse.random((20, 30), density=0.2, random_state=1)
    ra, ca = np.asarray(a.coords)
    rb, cb = np.asarray(b.coords)
    P = product_count(ca, rb, 20) + 5
    out_r, out_c, out_d, nnz = esc_spgemm(
        jnp.asarray(ra), jnp.asarray(ca), jnp.asarray(np.asarray(a.data)),
        jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(np.asarray(b.data)),
        k=20, n=30, product_capacity=P, out_capacity=P,
    )
    nnz = int(nnz)
    res = np.zeros((25, 30))
    res[np.asarray(out_r)[:nnz], np.asarray(out_c)[:nnz]] = np.asarray(out_d)[:nnz]
    np.testing.assert_allclose(res, a.todense() @ b.todense(), rtol=1e-10)


def test_esc_spgemm_empty():
    from sparse_tpu.kernels.spgemm import esc_spgemm

    out_r, out_c, out_d, nnz = esc_spgemm(
        jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32), jnp.zeros(1),
        jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32), jnp.zeros(1),
        k=4, n=4, product_capacity=4, out_capacity=4,
    )
    assert int(nnz) >= 0


def test_coo_elemwise_union_traceable():
    from sparse_tpu.kernels.elemwise import coo_elemwise_union

    a = sparse.random((6, 7), density=0.3, random_state=0, fill_value=1.0)
    b = sparse.random((6, 7), density=0.3, random_state=1, fill_value=2.0)
    lin_a = jnp.asarray(np.asarray(a.linear_loc()))
    lin_b = jnp.asarray(np.asarray(b.linear_loc()))
    lin_out, data_out, fill_out, nnz_out = coo_elemwise_union(
        lin_a, jnp.asarray(np.asarray(a.data)), 1.0,
        lin_b, jnp.asarray(np.asarray(b.data)), 2.0,
        func=jnp.add, size=42,
    )
    n = int(nnz_out)
    dense = np.full(42, float(fill_out))
    dense[np.asarray(lin_out)[:n]] = np.asarray(data_out)[:n]
    expected = (a.todense() + b.todense()).reshape(-1)
    np.testing.assert_allclose(dense, expected)


def test_coo_elemwise_union_in_jit():
    from sparse_tpu.kernels.elemwise import coo_elemwise_union

    a = sparse.random((5, 5), density=0.4, random_state=2)
    b = sparse.random((5, 5), density=0.4, random_state=3)

    @jax.jit
    def f(la, da, lb, db):
        lo, do, fo, n = coo_elemwise_union(la, da, 0.0, lb, db, 0.0, func=jnp.multiply, size=25)
        return do.sum()

    got = float(f(jnp.asarray(np.asarray(a.linear_loc())), jnp.asarray(np.asarray(a.data)),
                  jnp.asarray(np.asarray(b.linear_loc())), jnp.asarray(np.asarray(b.data))))
    expected = float((a.todense() * b.todense()).sum())
    assert np.isclose(got, expected)


def test_coo_sum_axes_dense_traceable():
    from sparse_tpu.kernels.dot import coo_sum_axes_dense

    t = sparse.random((4, 5, 6), density=0.3, random_state=0)

    @jax.jit
    def f(t):
        return coo_sum_axes_dense(jnp.asarray(t.coords), jnp.asarray(t.data), shape=t.shape, axes=(1,))

    np.testing.assert_allclose(np.asarray(f(t)), t.todense().sum(axis=1))
    full = coo_sum_axes_dense(jnp.asarray(np.asarray(t.coords)), jnp.asarray(np.asarray(t.data)), shape=t.shape, axes=(0, 1, 2))
    np.testing.assert_allclose(float(full), t.todense().sum())


def test_coo_to_block_ell_cached():
    a = sparse.random((40, 30), density=0.1, random_state=0)
    ell1 = a.to_block_ell()
    ell2 = a.to_block_ell()
    assert ell1 is ell2
    from sparse_tpu.kernels import ell_spmm

    b = jnp.asarray(np.random.default_rng(1).random((30, 4)))
    out = ell_spmm(ell1.e_rows, ell1.e_cols, ell1.e_data, b, n_rows=40)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(b), rtol=1e-10)


def test_coo_spmv_lane_gather():
    a = sparse.random((64, 256), density=0.2, random_state=9)
    x = jnp.asarray(np.random.default_rng(1).random(256))
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    data = jnp.asarray(np.asarray(a.data))
    out = coo_spmv(rows, cols, data, x, n_rows=64, lane_gather=True)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ np.asarray(x), rtol=1e-10)


def test_ell_mttkrp_matches_segment_form():
    from sparse_tpu.kernels import build_block_ell_3d, ell_mttkrp

    rng = np.random.default_rng(23)
    I, J, K, R = 300, 40, 50, 8
    lin = np.unique(rng.integers(0, I * J * K, 5000))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size).astype(np.float32)
    C = rng.random((J, R)).astype(np.float32)
    D = rng.random((K, R)).astype(np.float32)
    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
    out = np.asarray(ell_mttkrp(er, ej, ek, ed, jnp.asarray(C), jnp.asarray(D), n_rows=I))
    dense = np.zeros((I, J, K))
    dense[ci, cj, ck] = tv
    np.testing.assert_allclose(out, np.einsum("ijk,jr,kr->ir", dense, C, D), atol=1e-4)


def test_ell_mttkrp_scan_path_matches():
    # n_blocks >= MTTKRP_SCAN_MIN_BLOCKS takes the exact scan-over-blocks
    # path (r4) incl. the block-padding tail; compare vs the dense oracle
    from sparse_tpu.kernels import build_block_ell_3d, ell_mttkrp
    from sparse_tpu.kernels.ell import MTTKRP_SCAN_MIN_BLOCKS

    rng = np.random.default_rng(31)
    I = (MTTKRP_SCAN_MIN_BLOCKS * 128) + 77  # non-multiple: padding exercised
    J, K, R = 30, 40, 8
    lin = np.unique(rng.integers(0, I * J * K, 20000))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size).astype(np.float32)
    C = rng.random((J, R)).astype(np.float32)
    D = rng.random((K, R)).astype(np.float32)
    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
    assert ej.shape[0] >= MTTKRP_SCAN_MIN_BLOCKS
    out = np.asarray(ell_mttkrp(er, ej, ek, ed, jnp.asarray(C), jnp.asarray(D), n_rows=I))
    ref = np.zeros((I, R))
    np.add.at(ref, ci, tv[:, None].astype(np.float64) * C[cj].astype(np.float64) * D[ck].astype(np.float64))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("strategy,tol", [("bf16", 3e-2), ("hilo", 1e-4)])
def test_ell_mttkrp_strategies(strategy, tol):
    # opt-in reduced-precision factor-gather modes (r4): bf16 halves the
    # padded gather streams (relerr ~1e-3), hilo reconstructs ~f32 from a
    # (J, 2r) split table at the same gathered bytes
    from sparse_tpu.kernels import build_block_ell_3d, ell_mttkrp

    rng = np.random.default_rng(29)
    I, J, K, R = 300, 40, 50, 8
    lin = np.unique(rng.integers(0, I * J * K, 5000))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    tv = rng.random(lin.size).astype(np.float32)
    C = rng.random((J, R)).astype(np.float32)
    D = rng.random((K, R)).astype(np.float32)
    er, ej, ek, ed = build_block_ell_3d(ci, cj, ck, tv, I)
    out = np.asarray(
        ell_mttkrp(er, ej, ek, ed, jnp.asarray(C), jnp.asarray(D), n_rows=I, strategy=strategy)
    )
    dense = np.zeros((I, J, K))
    dense[ci, cj, ck] = tv
    ref = np.einsum("ijk,jr,kr->ir", dense, C, D)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < tol, rel


def test_ell_mttkrp_empty():
    from sparse_tpu.kernels import build_block_ell_3d, ell_mttkrp

    er, ej, ek, ed = build_block_ell_3d(
        np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, np.float32), 16
    )
    out = ell_mttkrp(er, ej, ek, ed, jnp.ones((4, 3), jnp.float32), jnp.ones((5, 3), jnp.float32), n_rows=16)
    np.testing.assert_allclose(np.asarray(out), 0)


@pytest.mark.parametrize("side", ["left", "right"])
def test_searchsorted_sorted_probes(side):
    # scatter-free double-argsort searchsorted (r4): parity with numpy for
    # sorted unique probes, incl. heavy ties and out-of-range probes
    from sparse_tpu.kernels.search import searchsorted_sorted_probes

    rng = np.random.default_rng(17)
    for trial in range(5):
        keys = np.sort(rng.integers(0, 50, size=rng.integers(0, 300)))
        probes = np.unique(rng.integers(-5, 60, size=rng.integers(1, 120)))
        got = np.asarray(searchsorted_sorted_probes(jnp.asarray(keys), jnp.asarray(probes), side=side))
        np.testing.assert_array_equal(got, np.searchsorted(keys, probes, side=side))


def test_row_ell_spmm_program_memoized():
    from sparse_tpu.kernels import build_row_ell
    from sparse_tpu.kernels.row_ell import row_ell_spmm, row_ell_spmm_program

    rng = np.random.default_rng(19)
    a = sparse.random((300, 200), density=0.05, random_state=19)
    re = build_row_ell(
        np.asarray(a.coords[0]), np.asarray(a.coords[1]),
        np.asarray(a.data, np.float32), 300, 200,
    )
    d = jnp.asarray(rng.random((200, 8), dtype=np.float32))
    p1 = row_ell_spmm_program(re)
    p2 = row_ell_spmm_program(re)
    assert p1 is p2  # memoized on the layout buffers
    np.testing.assert_allclose(
        np.asarray(p1(d)), np.asarray(row_ell_spmm(re, d)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p1(d)), a.todense().astype(np.float32) @ np.asarray(d), rtol=1e-4
    )


def test_esc_spgemm_packed_f32_path():
    # f32 operands take the packed-gather-table branch (r4); compare vs
    # the dense oracle incl. duplicate (i,j) products and padding slots
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    rng = np.random.default_rng(43)
    for trial in range(3):
        m, k, n = rng.integers(10, 60, size=3)
        a = sparse.random((m, k), density=0.25, random_state=100 + trial)
        b = sparse.random((k, n), density=0.25, random_state=200 + trial)
        ra, ca = np.asarray(a.coords)
        rb, cb = np.asarray(b.coords)
        da = np.asarray(a.data, np.float32)
        db = np.asarray(b.data, np.float32)
        P = product_count(ca, rb, int(k)) + 7
        out_r, out_c, out_d, nnz = esc_spgemm(
            jnp.asarray(ra), jnp.asarray(ca), jnp.asarray(da),
            jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(db),
            k=int(k), n=int(n), product_capacity=int(P), out_capacity=int(P),
        )
        assert out_d.dtype == jnp.float32
        nnz = int(nnz)
        res = np.zeros((m, n), dtype=np.float64)
        res[np.asarray(out_r)[:nnz], np.asarray(out_c)[:nnz]] = np.asarray(out_d)[:nnz]
        ref = a.todense().astype(np.float32) @ b.todense().astype(np.float32)
        np.testing.assert_allclose(res, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_esc_spgemm_empty_b_rows_tie_piles(dtype):
    # adversarial for the r5 blocked-count expansion: most B rows EMPTY, so
    # most A entries have zero repeats -> huge tie piles in the cumulative
    # ``ends``.  The zero-tail reorder must keep the static key window
    # sound (correctness, not just the uniform-random case).
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    rng = np.random.default_rng(7)
    m = kk = n = 400
    # A dense-ish, B confined to 3 rows (397 empty rows)
    a = sparse.random((m, kk), density=0.05, random_state=2)
    rb = np.sort(rng.integers(0, 3, size=60)).astype(np.int32)
    cb = rng.integers(0, n, size=60).astype(np.int32)
    db = rng.standard_normal(60).astype(dtype)
    import scipy.sparse as sp

    B = sp.coo_array((db, (rb, cb)), shape=(kk, n))
    B.sum_duplicates()
    rb2, cb2, db2 = B.row.astype(np.int32), B.col.astype(np.int32), B.data.astype(dtype)
    ra, ca = np.asarray(a.coords)
    da = np.asarray(a.data).astype(dtype)
    P = product_count(ca, rb2, kk) + 7
    out_r, out_c, out_d, nnz = esc_spgemm(
        jnp.asarray(ra), jnp.asarray(ca), jnp.asarray(da),
        jnp.asarray(rb2), jnp.asarray(cb2), jnp.asarray(db2),
        k=kk, n=n, product_capacity=P, out_capacity=P,
    )
    nnz = int(nnz)
    res = np.zeros((m, n))
    res[np.asarray(out_r)[:nnz], np.asarray(out_c)[:nnz]] = np.asarray(out_d)[:nnz]
    oracle = a.todense().astype(dtype) @ np.asarray(B.todense())
    np.testing.assert_allclose(res, oracle, rtol=1e-5, atol=1e-5)
    # canonical order of the compacted output
    keys = np.asarray(out_r)[:nnz].astype(np.int64) * n + np.asarray(out_c)[:nnz]
    assert (np.diff(keys) > 0).all()


def test_esc_spgemm_duplicate_collisions_and_order():
    # many colliding (i, j) products: the backward-scan head totals and the
    # one-sort compaction must sum duplicates exactly and emit sorted output
    from sparse_tpu.kernels.spgemm import esc_spgemm, product_count

    rng = np.random.default_rng(8)
    m, kk, n = 30, 40, 8  # narrow n forces collisions
    a = sparse.random((m, kk), density=0.3, random_state=3)
    b = sparse.random((kk, n), density=0.5, random_state=4)
    ra, ca = np.asarray(a.coords)
    rb, cb = np.asarray(b.coords)
    P = product_count(ca, rb, kk) + 3
    out_r, out_c, out_d, nnz = esc_spgemm(
        jnp.asarray(ra), jnp.asarray(ca), jnp.asarray(np.asarray(a.data)),
        jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(np.asarray(b.data)),
        k=kk, n=n, product_capacity=P, out_capacity=P,
    )
    nnz = int(nnz)
    res = np.zeros((m, n))
    res[np.asarray(out_r)[:nnz], np.asarray(out_c)[:nnz]] = np.asarray(out_d)[:nnz]
    np.testing.assert_allclose(res, a.todense() @ b.todense(), rtol=1e-10)
    keys = np.asarray(out_r)[:nnz].astype(np.int64) * n + np.asarray(out_c)[:nnz]
    assert (np.diff(keys) > 0).all()
    # padding slots carry the sentinel row and zero data
    assert (np.asarray(out_r)[nnz:] == np.iinfo(np.int32).max).all()
    assert (np.asarray(out_d)[nnz:] == 0).all()


def test_sparse_attention_ell_route_matches_coo_pipeline():
    # numpy pattern -> ELL route; jnp pattern -> COO/segment pipeline.
    # Both must match the dense softmax oracle.
    from sparse_tpu import nn as stnn

    rng = np.random.default_rng(12)
    L, d = 64, 16
    mask_d = rng.random((L, L)) < 0.1
    mask_d[3] = False  # empty query row
    rows, cols = np.nonzero(mask_d)
    rows = rows.astype(np.int32)
    cols = cols.astype(np.int32)
    q = rng.standard_normal((L, d)).astype(np.float32)
    k = rng.standard_normal((L, d)).astype(np.float32)
    v = rng.standard_normal((L, d)).astype(np.float32)

    scores = (q @ k.T) / np.sqrt(d)
    scores = np.where(mask_d, scores, -np.inf)
    mx = np.max(scores, axis=1, keepdims=True)
    e = np.exp(scores - np.where(np.isfinite(mx), mx, 0))
    e = np.where(mask_d, e, 0)
    den = e.sum(axis=1, keepdims=True)
    oracle = (e / np.where(den == 0, 1, den)) @ v

    out_ell = np.asarray(stnn.sparse_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), rows, cols))
    out_coo = np.asarray(
        stnn.sparse_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rows), jnp.asarray(cols))
    )
    np.testing.assert_allclose(out_ell, oracle, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out_coo, oracle, rtol=2e-4, atol=2e-5)
