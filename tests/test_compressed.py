"""GCXS / CSR / CSC tests — mirrors reference ``test_compressed.py`` /
``test_compressed_2d.py`` / ``test_compressed_convert.py``."""

import numpy as np
import pytest
import scipy.sparse

import sparse_tpu as sparse
from sparse_tpu import CSC, CSR, GCXS
from sparse_tpu._utils import assert_eq


@pytest.fixture(params=[(0,), (1,), (2,), (0, 1), (0, 2), (1, 2)])
def compressed_axes(request):
    return request.param


def test_from_coo_roundtrip(compressed_axes):
    s = sparse.random((5, 6, 7), density=0.2, random_state=0)
    g = GCXS.from_coo(s, compressed_axes=compressed_axes)
    assert g.compressed_axes == tuple(sorted(compressed_axes))
    assert_eq(g, s.todense())
    back = g.tocoo()
    assert_eq(back, s)


def test_default_compressed_axes():
    g = GCXS.from_coo(sparse.random((10, 3), density=0.3, random_state=0))
    assert g.compressed_axes == (1,)  # argmin(shape)


def test_1d():
    s = sparse.random((20,), density=0.3, random_state=0)
    g = GCXS.from_coo(s)
    assert_eq(g, s.todense())
    assert_eq(g.tocoo(), s)


def test_change_compressed_axes():
    s = sparse.random((4, 5, 6), density=0.2, random_state=0)
    g = GCXS.from_coo(s, compressed_axes=(0,))
    g2 = g.change_compressed_axes((1, 2))
    assert g2.compressed_axes == (1, 2)
    assert_eq(g2, s.todense())


@pytest.mark.parametrize("reduction", ["sum", "max", "min", "prod", "mean"])
@pytest.mark.parametrize("axis", [None, 0, 1, (0, 2)])
@pytest.mark.parametrize("keepdims", [True, False])
def test_reductions(reduction, axis, keepdims):
    s = sparse.random((4, 5, 6), density=0.2, random_state=0, format="gcxs")
    xx = s.todense()
    expected = getattr(xx, reduction)(axis=axis, keepdims=keepdims)
    got = getattr(s, reduction)(axis=axis, keepdims=keepdims)
    assert_eq(got, expected)


@pytest.mark.parametrize(
    "a,b",
    [[(4, 5), (5, 4)], [(3, 4, 5), (12, 5)], [(60,), (3, 4, 5)], [(3, 4, 5), (60,)]],
)
def test_reshape(a, b):
    s = sparse.random(a, density=0.3, random_state=0, format="gcxs")
    assert_eq(s.reshape(b), s.todense().reshape(b))


@pytest.mark.parametrize("axes", [None, (1, 0, 2), (2, 1, 0)])
def test_transpose(axes):
    s = sparse.random((4, 5, 6), density=0.2, random_state=0, format="gcxs")
    assert_eq(s.transpose(axes), s.todense().transpose(axes))


def test_2d_transpose_constant_time():
    s = sparse.random((5, 8), density=0.3, random_state=0, format="gcxs")
    t = s.transpose()
    assert t.data is s.data  # O(1) buffer-sharing transpose
    assert_eq(t, s.todense().T)


@pytest.mark.parametrize(
    "index",
    [0, (1, slice(None)), (slice(None), 2), (slice(1, 4), slice(0, 6, 2)), (slice(None, None, -1), 1), ([0, 2], slice(None))],
)
def test_indexing(index):
    s = sparse.random((5, 8), density=0.3, random_state=0, format="gcxs")
    x = s.todense()
    got = s[index]
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, x[index])
    else:
        assert got == x[index]


def test_csr_csc():
    x = np.random.default_rng(0).random((6, 8))
    x[x < 0.6] = 0
    r = CSR.from_numpy(x)
    c = CSC.from_numpy(x)
    assert r.compressed_axes == (0,)
    assert c.compressed_axes == (1,)
    assert_eq(r, x)
    assert_eq(c, x)
    # O(1) transpose swaps class
    assert isinstance(r.transpose(), CSC)
    assert isinstance(c.transpose(), CSR)
    assert_eq(r.transpose(), x.T)
    assert_eq(c.transpose(), x.T)


def test_scipy_roundtrip():
    m = scipy.sparse.random(8, 9, density=0.3, random_state=0, format="csr")
    g = GCXS.from_scipy_sparse(m)
    assert_eq(g, m.toarray())
    back = g.to_scipy_sparse()
    assert np.allclose(back.toarray(), m.toarray())
    r = CSR.from_scipy_sparse(m)
    assert_eq(r, m.toarray())


def test_triple_ctor():
    m = scipy.sparse.random(5, 6, density=0.3, random_state=0, format="csr")
    g = GCXS((m.data, m.indices, m.indptr), shape=(5, 6), compressed_axes=(0,))
    assert_eq(g, m.toarray())


def test_from_numpy_ctor():
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.5] = 0
    g = GCXS(x)
    assert_eq(g, x)


def test_invalid_compressed_axes():
    s = sparse.random((4, 5), density=0.3, random_state=0)
    with pytest.raises(ValueError):
        GCXS.from_coo(s, compressed_axes=(0, 1))
    with pytest.raises(ValueError):
        GCXS.from_coo(sparse.random((4,), density=0.3), compressed_axes=(1,))


def test_matmul():
    a = sparse.random((6, 5), density=0.4, random_state=0, format="gcxs")
    b = np.random.default_rng(1).random((5, 3))
    np.testing.assert_allclose(a @ b, a.todense() @ b)


def test_elemwise_preserves_gcxs():
    a = sparse.random((4, 5), density=0.3, random_state=0, format="gcxs", compressed_axes=(1,))
    res = a * 2
    assert isinstance(res, GCXS)
    assert res.compressed_axes == (1,)
    assert_eq(res, a.todense() * 2)


def test_nbytes_and_density():
    g = sparse.random((10, 10), density=0.2, random_state=0, format="gcxs")
    assert g.nbytes > 0
    assert 0.15 <= g.density <= 0.25


def test_fill_value_preserved():
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.5] = 3.0
    g = GCXS.from_numpy(x, fill_value=3.0)
    assert float(g.fill_value) == 3.0
    assert_eq(g, x)
    assert_eq(g.tocoo(), x)


@pytest.mark.parametrize("compressed_axes2", [(0,), (1,)])
@pytest.mark.parametrize(
    "index", [0, 3, -1, (2,), (slice(1, 4), slice(None)), (slice(0, 5),), (slice(None), slice(None))]
)
def test_fast_indexing_paths(compressed_axes2, index):
    s = sparse.random((5, 8), density=0.3, random_state=7, format="gcxs", compressed_axes=compressed_axes2)
    x = s.todense()
    got = s[index]
    expected = x[index]
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected)
    else:
        assert got == expected


def test_fast_indexing_csc_col():
    s = sparse.random((5, 8), density=0.3, random_state=7, format="gcxs", compressed_axes=(1,))
    x = s.todense()
    assert_eq(s[:, 2:6], x[:, 2:6])
    assert_eq(s[:, 3], x[:, 3])


@pytest.mark.parametrize("reduction", ["sum", "max", "min", "prod"])
def test_native_reduce_uncompressed_axes(reduction):
    # CSR row reduction: reduced axes == uncompressed axes -> indptr path
    s = sparse.random((7, 9), density=0.4, random_state=11, format="gcxs", compressed_axes=(0,))
    x = s.todense()
    assert_eq(getattr(s, reduction)(axis=1), getattr(x, reduction)(axis=1))
    # CSC column reduction
    c = sparse.random((7, 9), density=0.4, random_state=12, format="gcxs", compressed_axes=(1,))
    xc = c.todense()
    assert_eq(getattr(c, reduction)(axis=0), getattr(xc, reduction)(axis=0))
    # 3-D: comp (0,1), reduce the uncompressed axis 2
    t = sparse.random((3, 4, 5), density=0.3, random_state=13, format="gcxs", compressed_axes=(0, 1))
    xt = t.todense()
    assert_eq(getattr(t, reduction)(axis=2), getattr(xt, reduction)(axis=2))
    # comp (0,2), reduce axis 1
    u = sparse.random((3, 4, 5), density=0.3, random_state=14, format="gcxs", compressed_axes=(0, 2))
    xu = u.todense()
    assert_eq(getattr(u, reduction)(axis=1), getattr(xu, reduction)(axis=1))


def test_native_reduce_fill_value():
    x = np.random.default_rng(15).random((5, 6))
    x[x < 0.5] = 2.0
    g = sparse.GCXS.from_numpy(x, fill_value=2.0, compressed_axes=(0,))
    assert_eq(g.max(axis=1), x.max(axis=1))
    assert_eq(g.sum(axis=1), x.sum(axis=1))


def test_gcxs_fancy_compressed_axis_fast_path():
    rng = np.random.default_rng(17)
    d = rng.random((30, 20)) * (rng.random((30, 20)) < 0.4)
    csr = sparse.GCXS.from_numpy(d, compressed_axes=(0,))
    csc = sparse.GCXS.from_numpy(d, compressed_axes=(1,))
    rows = np.array([5, 2, 2, -1, 0])
    out = csr[rows]
    assert isinstance(out, sparse.GCXS)
    np.testing.assert_allclose(out.todense(), d[rows], rtol=1e-12)
    cols = np.array([-3, 0, 7, 7])
    out2 = csc[:, cols]
    np.testing.assert_allclose(out2.todense(), d[:, cols], rtol=1e-12)
    with pytest.raises(IndexError):
        csr[np.array([30])]
    # empty selection
    np.testing.assert_allclose(csr[np.array([], dtype=np.int64)].todense(), d[[]])


# -- native 2-D indexing matrix (no COO round-trip) ---------------------------------


@pytest.mark.parametrize("comp", [(0,), (1,)])
def test_getitem_fast_full_matrix(comp):
    import sparse_tpu as st

    x = st.random((23, 31), density=0.3, random_state=5)
    g = GCXS.from_coo(x, compressed_axes=comp)
    d = x.todense()
    cases = [
        (2, 3),
        (2, slice(None)),
        (slice(None), 3),
        (slice(2, 9), slice(4, 20)),
        (slice(None), slice(4, 20)),
        (slice(2, 9), slice(None)),
        ([1, 5, 2, 5], slice(None)),
        ([1, 5, 2], slice(3, 11)),
        ([1, 5, 2], 7),
        (slice(None), [2, 7, 9]),
        (slice(1, 20), [2, 7, 9]),
        (5, [2, 7, 9]),
        (5, slice(3, 11)),
        (slice(9, 2), slice(None)),  # empty range
        (0, 0),
        (-3, -2),
        (slice(-9, -2), slice(None)),
        ([-1, -5], slice(2, -4)),
    ]
    for idx in cases:
        got = g[idx]
        ref = d[idx]
        gv = got.todense() if hasattr(got, "todense") else got
        np.testing.assert_allclose(gv, ref, err_msg=f"{comp} {idx}")
        if hasattr(got, "shape"):
            assert got.shape == np.asarray(ref).shape, (comp, idx)
    # boolean masks along either axis
    rowmask = d.sum(axis=1) > 0
    colmask = d.sum(axis=0) > 0
    np.testing.assert_allclose(g[rowmask, :].todense(), d[rowmask, :])
    np.testing.assert_allclose(g[:, colmask].todense(), d[:, colmask])
    # unordered / repeated uncompressed picks fall back but stay correct
    np.testing.assert_allclose(g[:, [7, 2, 2]].todense(), d[:, [7, 2, 2]])
    with pytest.raises(IndexError):
        g[100, :]
    with pytest.raises(IndexError):
        g[:, np.array([0, 31])]


@pytest.mark.parametrize("comp", [(0,), (1,)])
def test_reduce_over_compressed_axes_native(comp):
    import sparse_tpu as st

    g = GCXS.from_coo(st.random((40, 50), density=0.2, random_state=3), compressed_axes=comp)
    d = g.todense()
    for ax in (0, 1):
        np.testing.assert_allclose(g.sum(axis=ax).todense(), d.sum(axis=ax))
        np.testing.assert_allclose(g.mean(axis=ax).todense(), d.mean(axis=ax))
    g3 = GCXS.from_coo(st.random((10, 12, 14), density=0.05, random_state=2), compressed_axes=(0, 2))
    d3 = g3.todense()
    np.testing.assert_allclose(g3.sum(axis=(0, 2)).todense(), d3.sum(axis=(0, 2)))


@pytest.mark.parametrize("comp", [(0,), (1,)])
def test_getitem_two_advanced_indices_pointwise(comp):
    # two array-like indices select pointwise (numpy advanced indexing),
    # never the outer product of the two picks
    import sparse_tpu as st

    x = st.random((15, 17), density=0.4, random_state=8)
    g = GCXS.from_coo(x, compressed_axes=comp)
    d = x.todense()
    rows = np.array([1, 5, 2, 5])
    cols = np.array([2, 7, 9, 0])
    got = g[rows, cols]
    gv = got.todense() if hasattr(got, "todense") else got
    np.testing.assert_allclose(gv, d[rows, cols])
    rowmask = d.sum(axis=1) > 0
    colpick = np.flatnonzero(d.sum(axis=0) > 0)[: int(rowmask.sum())]
    got2 = g[rowmask, colpick]
    gv2 = got2.todense() if hasattr(got2, "todense") else got2
    np.testing.assert_allclose(gv2, d[rowmask, colpick])


# ---------------------------------------------------------------------------
# native GCXS concatenate/stack (storage splice, no COO round-trip)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axis", [0, 1, -1])
@pytest.mark.parametrize("caxes", [(0,), (1,)])
def test_gcxs_concatenate_native_2d(axis, caxes):
    rng = np.random.default_rng(0)
    dens = [rng.random((7, 5)) * (rng.random((7, 5)) < 0.4) for _ in range(3)]
    gs = [sparse.GCXS.from_numpy(d, compressed_axes=caxes) for d in dens]
    out = sparse.concatenate(gs, axis=axis)
    assert isinstance(out, sparse.GCXS)
    ax = axis % 2
    assert out.compressed_axes == (ax,)
    np.testing.assert_allclose(out.todense(), np.concatenate(dens, axis=axis))
    # canonical storage: indptr monotone, indices sorted within each group
    assert np.all(np.diff(out.indptr) >= 0)
    assert sparse._utils.is_canonical(out.tocoo())


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_gcxs_concatenate_native_3d(axis):
    rng = np.random.default_rng(1)
    dens = [rng.random((3, 4, 5)) * (rng.random((3, 4, 5)) < 0.3) for _ in range(2)]
    gs = [sparse.GCXS.from_numpy(d, compressed_axes=(1,)) for d in dens]
    out = sparse.concatenate(gs, axis=axis)
    np.testing.assert_allclose(out.todense(), np.concatenate(dens, axis=axis))


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
@pytest.mark.parametrize("caxes", [(0,), (1,)])
def test_gcxs_stack_native(axis, caxes):
    rng = np.random.default_rng(2)
    dens = [rng.random((6, 4)) * (rng.random((6, 4)) < 0.4) for _ in range(3)]
    gs = [sparse.GCXS.from_numpy(d, compressed_axes=caxes) for d in dens]
    out = sparse.stack(gs, axis=axis)
    assert isinstance(out, sparse.GCXS)
    np.testing.assert_allclose(out.todense(), np.stack(dens, axis=axis))
    assert sparse._utils.is_canonical(out.tocoo())


def test_gcxs_concatenate_native_mixed_caxes_and_fill():
    rng = np.random.default_rng(3)
    dens = [rng.random((5, 5)) * (rng.random((5, 5)) < 0.4) for _ in range(2)]
    gs = [
        sparse.GCXS.from_numpy(dens[0], compressed_axes=(0,)),
        sparse.GCXS.from_numpy(dens[1], compressed_axes=(1,)),
    ]
    out = sparse.concatenate(gs, axis=1)
    np.testing.assert_allclose(out.todense(), np.concatenate(dens, axis=1))

    # inconsistent fill values still raise
    bad = sparse.GCXS.from_coo(sparse.COO.from_numpy(dens[1], fill_value=1.0))
    with pytest.raises(ValueError):
        sparse.concatenate([gs[0], bad], axis=0)

    # shape mismatch raises
    small = sparse.GCXS.from_numpy(dens[1][:, :3])
    with pytest.raises(ValueError):
        sparse.concatenate([gs[0], small], axis=0)


def test_gcxs_concatenate_empty_and_idx_dtype():
    # zero-nnz operands splice correctly
    z = sparse.GCXS.from_numpy(np.zeros((4, 3)))
    d = np.arange(12.0).reshape(4, 3)
    g = sparse.GCXS.from_numpy(d)
    out = sparse.concatenate([z, g, z], axis=0)
    np.testing.assert_allclose(out.todense(), np.concatenate([np.zeros((4, 3)), d, np.zeros((4, 3))], axis=0))
    assert out.nnz == g.nnz
