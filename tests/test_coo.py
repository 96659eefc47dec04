"""COO format tests — mirrors the coverage areas of the reference's
``test_coo.py`` (reductions, transpose/reshape, slicing table, advanced
indexing, concat/stack, scipy interop, creation, misc ops)."""

import numpy as np
import pytest
import scipy.sparse

import sparse_tpu as sparse
from sparse_tpu import COO
from sparse_tpu._utils import assert_eq


@pytest.fixture
def random_sparse():
    return sparse.random((20, 30, 40), density=0.1, random_state=42)


@pytest.fixture
def x_s():
    x = np.random.default_rng(0).random((4, 5, 6))
    x[x < 0.6] = 0
    return x, COO.from_numpy(x)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "reduction,kwargs",
    [("sum", {}), ("sum", {"dtype": np.float32}), ("max", {}), ("min", {}), ("prod", {}), ("mean", {}), ("var", {}), ("std", {})],
)
@pytest.mark.parametrize("axis", [None, 0, 1, 2, (0, 2), -1, (1, -1)])
@pytest.mark.parametrize("keepdims", [True, False])
def test_reductions(reduction, kwargs, axis, keepdims, random_sparse):
    x = random_sparse
    xx = x.todense()
    expected = getattr(xx, reduction)(axis=axis, keepdims=keepdims, **kwargs)
    got = getattr(x, reduction)(axis=axis, keepdims=keepdims, **kwargs)
    assert_eq(got, expected)


@pytest.mark.parametrize("reduction,kwargs", [("any", {}), ("all", {})])
@pytest.mark.parametrize("axis", [None, 0, (1, 2)])
@pytest.mark.parametrize("keepdims", [True, False])
def test_reductions_bool(reduction, kwargs, axis, keepdims):
    y = np.zeros((2, 3, 4), dtype=bool)
    y[0, 0, 0] = True
    y[1, 1, 1] = True
    x = COO.from_numpy(y)
    expected = getattr(y, reduction)(axis=axis, keepdims=keepdims, **kwargs)
    got = getattr(x, reduction)(axis=axis, keepdims=keepdims, **kwargs)
    assert_eq(got, expected)


@pytest.mark.parametrize(
    "ufunc,kwargs",
    [(np.max, {}), (np.sum, {}), (np.sum, {"dtype": np.float32}), (np.prod, {}), (np.minimum.reduce, {})],
)
@pytest.mark.parametrize("axis", [None, 0, 1, -1, (0, 2)])
def test_ufunc_reductions(ufunc, kwargs, axis, random_sparse):
    x = random_sparse
    xx = x.todense()
    if ufunc is np.minimum.reduce:
        if axis is None or isinstance(axis, tuple):
            pytest.skip("reduce with axis tuple handled in reduce tests")
        expected = ufunc(xx, axis=axis, **kwargs)
        got = ufunc(x, axis=axis, **kwargs)
    else:
        expected = ufunc(xx, axis=axis, **kwargs)
        got = ufunc(x, axis=axis, **kwargs)
    assert_eq(got, expected)


def test_reduction_fill_value():
    x = np.full((5, 6), 2.0)
    x[1, 2] = 5.0
    x[3, 4] = 7.0
    s = COO.from_numpy(x, fill_value=2.0)
    # max(2,2)=2 -> legal
    assert_eq(s.max(axis=0), x.max(axis=0))
    assert_eq(s.min(axis=1), x.min(axis=1))
    # add has a super-ufunc rule
    assert_eq(s.sum(axis=0), x.sum(axis=0))
    assert_eq(s.sum(), x.sum().reshape(()))


def test_reduction_dense_result_raises():
    s = sparse.random((4, 5), density=0.3, random_state=0, fill_value=3.0)
    with pytest.raises(ValueError, match="dense result"):
        np.subtract.reduce(s, axis=0)


# ---------------------------------------------------------------------------
# transpose / reshape / squeeze
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axes", [None, (2, 0, 1), (0, 2, 1), (1, 2, 0), (-1, 0, 1)])
def test_transpose(axes, random_sparse):
    x = random_sparse
    assert_eq(x.transpose(axes), x.todense().transpose(axes))


def test_transpose_error(random_sparse):
    with pytest.raises(ValueError):
        random_sparse.transpose((0, 1))
    with pytest.raises(ValueError):
        random_sparse.transpose((0, 0, 1))


@pytest.mark.parametrize(
    "a,b",
    [
        [(3, 4), (4, 3)],
        [(3, 4), (12,)],
        [(3, 4), (2, 6)],
        [(3, 4, 5), (60,)],
        [(5, 4, 3), (3, 4, 5)],
        [(60,), (3, 4, 5)],
        [(2, 3, 4, 5), (20, 6)],
        [(4,), (2, 2)],
        [(4,), (1, 4, 1)],
        [(12,), (-1, 4)],
    ],
)
def test_reshape(a, b):
    x = sparse.random(a, density=0.3, random_state=1)
    assert_eq(x.reshape(b), x.todense().reshape(b))


def test_reshape_bad():
    x = sparse.random((3, 4), density=0.5, random_state=0)
    with pytest.raises(ValueError):
        x.reshape((5, 5))


@pytest.mark.parametrize("coord_dtype", [np.uint16, np.int16, np.uint8, np.int32])
def test_reshape_narrow_coord_dtype_no_overflow(coord_dtype):
    # Regression: the 2-D digit-arithmetic fast path computed r*q in the
    # INPUT coords dtype (NEP 50) and wrapped for narrow dtypes before the
    # cast to the output idx dtype (ADVICE r3, high).
    lim = int(np.iinfo(coord_dtype).max)
    m = 300 if lim >= 300 else 48
    k = 256 if lim >= 256 else 64
    d = np.zeros((m, k), dtype=np.float64)
    rng = np.random.default_rng(7)
    ii = rng.integers(0, m, size=50)
    jj = rng.integers(0, k, size=50)
    d[ii, jj] = rng.random(50) + 0.5
    x = sparse.COO.from_numpy(d)
    x = sparse.COO(
        x.coords.astype(coord_dtype), x.data, shape=x.shape, sorted=True, has_duplicates=False
    )
    # k_old % k_new == 0 branch with r*q exceeding the input dtype range
    assert_eq(x.reshape((m * k, 1)), d.reshape((m * k, 1)))
    assert_eq(x.reshape((m * (k // 4), 4)), d.reshape((m * (k // 4), 4)))
    # sibling branch too
    if m % 4 == 0:
        assert_eq(x.reshape((m // 4, k * 4)), d.reshape((m // 4, k * 4)))


def test_squeeze():
    x = sparse.random((1, 3, 1, 4), density=0.5, random_state=0)
    assert_eq(x.squeeze(), x.todense().squeeze())
    assert_eq(x.squeeze(axis=0), x.todense().squeeze(axis=0))
    assert_eq(x.squeeze(axis=(0, 2)), x.todense().squeeze(axis=(0, 2)))
    with pytest.raises(ValueError):
        x.squeeze(axis=1)


def test_moveaxis(random_sparse):
    assert_eq(sparse.moveaxis(random_sparse, 0, 2), np.moveaxis(random_sparse.todense(), 0, 2))


def test_swapaxes(random_sparse):
    assert_eq(random_sparse.swapaxes(0, 2), random_sparse.todense().swapaxes(0, 2))


def test_flatten(random_sparse):
    assert_eq(random_sparse.flatten(), random_sparse.todense().flatten())


# ---------------------------------------------------------------------------
# slicing table
# ---------------------------------------------------------------------------

SLICE_TABLE = [
    0,
    1,
    -1,
    (1, 2),
    (1, 2, 3),
    (1, -2, 3),
    (slice(0, 2),),
    (slice(None),),
    (slice(None), slice(None), slice(None)),
    (slice(1, 4), slice(0, 5, 2)),
    (slice(None, None, -1),),
    (slice(4, 1, -1), 2),
    (slice(None), slice(None, None, 2)),
    (0, slice(1, 4)),
    (slice(1, 2), slice(None), -1),
    (Ellipsis,),
    (0, Ellipsis),
    (Ellipsis, 1),
    (slice(1, 3), Ellipsis),
    (None, 1),
    (1, None, 2),
    (slice(1, 3), None),
    (None,),
    (slice(None, None, 3),),
    (slice(5, 1, -2),),
    (slice(None), 2, slice(None, None, -2)),
]


@pytest.mark.parametrize("index", SLICE_TABLE)
def test_slicing(index, x_s):
    x, s = x_s
    expected = x[index]
    got = s[index]
    assert_eq(got, expected)


@pytest.mark.parametrize(
    "index",
    [
        ([0, 2],),
        ([0, 0, 1],),
        (slice(None), [1, 2]),
        (1, [0, 2]),
        ([2, 0], slice(None), 3),
        (np.array([1, 3]),),
        ([True, False, True, False],),
        (slice(None), np.array([0, 2, 4]), slice(None)),
        ([0, 1], [0, 1]),
        (slice(None), [0, 1], [0, 1]),
    ],
)
def test_advanced_indexing(index, x_s):
    x, s = x_s
    expected = x[index]
    got = s[index]
    assert_eq(got, expected)


def test_scalar_getitem(x_s):
    x, s = x_s
    assert s[1, 2, 3] == x[1, 2, 3]


def test_index_errors(x_s):
    x, s = x_s
    with pytest.raises(IndexError):
        s[10]
    with pytest.raises(IndexError):
        s[0, 0, 0, 0]


def test_custom_dtype_slicing():
    x = np.random.default_rng(0).random((3, 4)).astype(np.float32)
    s = COO.from_numpy(x)
    assert s[1:2].dtype == np.float32


# ---------------------------------------------------------------------------
# constructors / conversion
# ---------------------------------------------------------------------------


def test_from_scipy():
    m = scipy.sparse.random(10, 12, density=0.2, random_state=0)
    s = COO.from_scipy_sparse(m)
    assert_eq(s, m.toarray())


def test_to_scipy(x_s):
    x2 = np.random.default_rng(1).random((5, 6))
    x2[x2 < 0.5] = 0
    s = COO.from_numpy(x2)
    m = s.to_scipy_sparse()
    assert np.allclose(m.toarray(), x2)


def test_from_iter():
    s = COO.from_iter([((0, 0), 1.0), ((1, 2), 3.0)], shape=(2, 3))
    expected = np.zeros((2, 3))
    expected[0, 0] = 1
    expected[1, 2] = 3
    assert_eq(s, expected)


def test_from_dict():
    s = COO.from_iter({(0, 1): 2.0, (1, 0): 4.0}, shape=(2, 2))
    expected = np.zeros((2, 2))
    expected[0, 1] = 2
    expected[1, 0] = 4
    assert_eq(s, expected)


def test_scipy_style_ctor():
    data = np.array([1.0, 2.0])
    rows = np.array([0, 1])
    cols = np.array([1, 2])
    s = COO((data, (rows, cols)), shape=(2, 3))
    expected = np.zeros((2, 3))
    expected[0, 1] = 1
    expected[1, 2] = 2
    assert_eq(s, expected)


def test_duplicates_summed():
    coords = np.array([[0, 0, 1], [1, 1, 0]])
    data = np.array([1.0, 2.0, 3.0])
    s = COO(coords, data, shape=(2, 2))
    assert s.nnz == 2
    expected = np.zeros((2, 2))
    expected[0, 1] = 3
    expected[1, 0] = 3
    assert_eq(s, expected)


def test_infer_shape():
    coords = np.array([[0, 3], [1, 2]])
    s = COO(coords, np.array([1.0, 2.0]))
    assert s.shape == (4, 3)


def test_idx_dtype():
    s = sparse.random((100, 100), density=0.01, random_state=0)
    assert s.coords.dtype == np.int32
    with pytest.raises(ValueError):
        COO(np.array([[0], [0]]), np.array([1.0]), shape=(300, 300), idx_dtype=np.int8)


def test_caching():
    x = sparse.random((5, 6, 7), density=0.2, random_state=0)
    x.enable_caching()
    t1 = x.transpose((1, 0, 2))
    t2 = x.transpose((1, 0, 2))
    assert t1 is t2
    r1 = x.reshape((30, 7))
    r2 = x.reshape((30, 7))
    assert r1 is r2


def test_len_iter(x_s):
    x, s = x_s
    assert len(s) == x.shape[0]
    rows = list(s)
    assert len(rows) == x.shape[0]
    assert_eq(rows[1], x[1])


# ---------------------------------------------------------------------------
# misc ops
# ---------------------------------------------------------------------------


def test_roll(x_s):
    x, s = x_s
    assert_eq(sparse.roll(s, 2, axis=0), np.roll(x, 2, axis=0))
    assert_eq(sparse.roll(s, -3, axis=1), np.roll(x, -3, axis=1))
    assert_eq(sparse.roll(s, 5), np.roll(x, 5))
    assert_eq(sparse.roll(s, (1, 2), axis=(0, 2)), np.roll(x, (1, 2), axis=(0, 2)))


def test_clip(x_s):
    x, s = x_s
    assert_eq(s.clip(min=0.3), x.clip(min=0.3))
    assert_eq(s.clip(min=0.1, max=0.9), x.clip(0.1, 0.9))
    assert_eq(sparse.clip(s, 0.1, 0.9), x.clip(0.1, 0.9))
    with pytest.raises(ValueError):
        s.clip()


@pytest.mark.parametrize("offset", [0, 1, 2, -1, -2])
def test_diagonal(offset):
    s = sparse.random((6, 6), density=0.3, random_state=0)
    assert_eq(sparse.diagonal(s, offset=offset), np.diagonal(s.todense(), offset=offset))


def test_diagonal_3d():
    s = sparse.random((4, 5, 4), density=0.3, random_state=0)
    assert_eq(
        sparse.diagonal(s, axis1=0, axis2=2), np.diagonal(s.todense(), axis1=0, axis2=2)
    )


def test_diagonalize():
    s = sparse.random((4,), density=0.5, random_state=0)
    assert_eq(sparse.diagonalize(s), np.diag(s.todense()))
    a = sparse.random((3, 3, 3, 3, 3), density=0.3, random_state=1)
    a_diag = sparse.diagonalize(a, axis=2)
    res = (sparse.diagonal(a_diag, axis1=2, axis2=5) == a.transpose([0, 1, 3, 4, 2])).all()
    assert bool(res.todense() if hasattr(res, "todense") else res)


@pytest.mark.parametrize("axis", [None, 0, 1, -1])
@pytest.mark.parametrize("keepdims", [True, False])
@pytest.mark.parametrize("mode", ["argmax", "argmin"])
def test_argmax_argmin(axis, keepdims, mode):
    x = np.random.default_rng(3).random((5, 7))
    x[x < 0.6] = 0
    s = COO.from_numpy(x)
    expected = getattr(np, mode)(x, axis=axis, keepdims=keepdims)
    got = getattr(sparse, mode)(s, axis=axis, keepdims=keepdims)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, compare_dtype=False, check_nnz=False)
    else:
        assert np.array_equal(np.asarray(got), expected)


def test_argmax_nan():
    x = np.array([[1.0, np.nan, 3.0], [0.0, 2.0, np.nan]])
    s = COO.from_numpy(x)
    assert np.array_equal(
        np.asarray(sparse.argmax(s, axis=1).todense()), np.argmax(x, axis=1)
    )


@pytest.mark.parametrize("axis", [0, 1, -1])
@pytest.mark.parametrize("descending", [False, True])
def test_sort(axis, descending):
    x = np.random.default_rng(4).random((6, 8))
    x[x < 0.5] = 0
    s = COO.from_numpy(x)
    expected = np.sort(x, axis=axis)
    if descending:
        expected = np.flip(expected, axis=axis)
    assert_eq(sparse.sort(s, axis=axis, descending=descending), expected)


def test_sort_1d():
    x = np.array([1.0, 0.0, 2.0, 0.0, -3.0])
    s = COO.from_numpy(x)
    assert_eq(sparse.sort(s), np.sort(x))
    assert_eq(sparse.sort(s, descending=True), np.sort(x)[::-1])


def test_sort_nonzero_fill():
    x = np.array([3.0, 1.0, 2.0, 1.0, 5.0])
    s = COO.from_numpy(x, fill_value=1.0)
    assert_eq(sparse.sort(s), np.sort(x), check_nnz=False)


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_take(axis):
    x = np.random.default_rng(5).random((5, 6))
    x[x < 0.5] = 0
    s = COO.from_numpy(x)
    idx = np.array([0, 2, 2, 1])
    assert_eq(sparse.take(s, idx, axis=axis), np.take(x, idx, axis=axis))


def test_flip(x_s):
    x, s = x_s
    assert_eq(sparse.flip(s), np.flip(x))
    assert_eq(sparse.flip(s, axis=1), np.flip(x, axis=1))
    assert_eq(sparse.flip(s, axis=(0, 2)), np.flip(x, axis=(0, 2)))


def test_unique():
    x = np.array([1, 0, 2, 1, 2, -3])
    s = COO.from_numpy(x)
    values, counts = sparse.unique_counts(s)
    ev, ec = np.unique(x, return_counts=True)
    assert np.array_equal(values, ev)
    assert np.array_equal(counts, ec)
    assert np.array_equal(sparse.unique_values(s), np.unique(x))


def test_unique_nonzero_fill():
    x = np.array([1, 5, 2, 1, 5, -3])
    s = COO.from_numpy(x, fill_value=5)
    assert np.array_equal(sparse.unique_values(s), np.unique(x))


def test_where_1arg(x_s):
    x, s = x_s
    got = sparse.where(s)
    expected = np.where(x)
    for g, e in zip(got, expected):
        assert np.array_equal(np.asarray(g), e)


def test_kron():
    a = sparse.random((3, 4), density=0.3, random_state=0)
    b = sparse.random((2, 5), density=0.4, random_state=1)
    assert_eq(sparse.kron(a, b), np.kron(a.todense(), b.todense()))


def test_kron_dense_arg():
    a = sparse.random((3, 4), density=0.3, random_state=0)
    b = np.random.default_rng(2).random((2, 2))
    assert_eq(sparse.kron(a, b), np.kron(a.todense(), b))


def test_kron_scalar_scales():
    # reference semantics (_coo/common.py:110): kron against a scalar is
    # plain scaling, matching np.kron
    a = sparse.random((3, 4), density=0.3, random_state=0)
    assert_eq(sparse.kron(a, 3), np.kron(a.todense(), 3))
    with pytest.raises(ValueError):
        sparse.kron(3, 4)  # all-dense still raises


@pytest.mark.parametrize("axis", [0, 1])
def test_concatenate(axis, x_s):
    x, s = x_s
    assert_eq(sparse.concatenate([s, s, s], axis=axis), np.concatenate([x, x, x], axis=axis))


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_stack(axis, x_s):
    x, s = x_s
    assert_eq(sparse.stack([s, s], axis=axis), np.stack([x, x], axis=axis))


@pytest.mark.parametrize("k", [0, 1, -1, 2])
def test_triu_tril(k):
    x = np.random.default_rng(6).random((6, 6))
    x[x < 0.5] = 0
    s = COO.from_numpy(x)
    assert_eq(sparse.triu(s, k), np.triu(x, k))
    assert_eq(sparse.tril(s, k), np.tril(x, k))


def test_expand_dims(x_s):
    x, s = x_s
    for ax in range(4):
        assert_eq(sparse.expand_dims(s, axis=ax), np.expand_dims(x, axis=ax))


def test_pad(x_s):
    x, s = x_s
    pw = ((1, 2), (0, 1), (3, 0))
    assert_eq(sparse.pad(s, pw), np.pad(x, pw))
    assert_eq(sparse.pad(s, 2), np.pad(x, 2))


def test_pad_bad_fill(x_s):
    x, s = x_s
    with pytest.raises(ValueError):
        sparse.pad(s, 1, constant_values=5)


@pytest.mark.parametrize("reps", [2, (2, 3), (1, 2, 3), (2, 1, 1, 2)])
def test_tile(reps, x_s):
    x, s = x_s
    assert_eq(sparse.tile(s, reps), np.tile(x, reps))


@pytest.mark.parametrize("axis", [None, 0, 1, 2])
def test_repeat(axis, x_s):
    x, s = x_s
    assert_eq(sparse.repeat(s, 3, axis=axis), np.repeat(x, 3, axis=axis))


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_unstack(axis, x_s):
    x, s = x_s
    got = sparse.unstack(s, axis=axis)
    expected = np.unstack(x, axis=axis) if hasattr(np, "unstack") else tuple(np.moveaxis(x, axis, 0))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert_eq(g, e)


@pytest.mark.parametrize("n", [1, 2])
@pytest.mark.parametrize("axis", [0, 1, -1])
def test_diff(n, axis, x_s):
    x, s = x_s
    assert_eq(sparse.diff(s, axis=axis, n=n), np.diff(x, axis=axis, n=n))


def test_interp():
    xp = [1, 2, 3]
    fp = [3, 2, 0]
    x = np.array([0, 1, 1.5, 2.72, 3.14])
    s = COO.from_numpy(x)
    y = np.interp(s, xp, fp)
    assert np.allclose(y.todense(), np.interp(x, xp, fp))
    assert float(y.fill_value) == 3.0


def test_nansum_nanmean():
    x = np.random.default_rng(7).random((5, 6))
    x[x < 0.4] = 0
    x[0, 1] = np.nan
    x[3, 2] = np.nan
    s = COO.from_numpy(x)
    assert_eq(sparse.nansum(s, axis=0), np.nansum(x, axis=0), check_nnz=False)
    assert_eq(sparse.nanmean(s, axis=1), np.nanmean(x, axis=1), check_nnz=False)
    assert_eq(sparse.nanmax(s, axis=0), np.nanmax(x, axis=0), check_nnz=False)
    assert_eq(sparse.nanmin(s, axis=1), np.nanmin(x, axis=1), check_nnz=False)
    assert_eq(sparse.nanprod(s, axis=0), np.nanprod(x, axis=0), check_nnz=False)


def test_outer():
    a = sparse.random((5,), density=0.5, random_state=0)
    b = sparse.random((4,), density=0.5, random_state=1)
    assert_eq(sparse.outer(a, b), np.outer(a.todense(), b.todense()))


def test_resize():
    x = np.arange(12.0).reshape(3, 4)
    s = COO.from_numpy(x)
    s.resize(2, 4)
    y = x.copy()
    y.resize(2, 4)  # in-place C-order truncation
    assert_eq(s, y)


def test_eye():
    for n, m, k in [(4, None, 0), (4, 6, 1), (5, 3, -1), (4, 4, 2)]:
        assert_eq(sparse.eye(n, m, k=k), np.eye(n, m if m else n, k=k))


def test_zeros_ones_full():
    assert_eq(sparse.zeros((3, 4)), np.zeros((3, 4)))
    assert_eq(sparse.ones((2, 3)), np.ones((2, 3)), check_nnz=False)
    assert_eq(sparse.full((2, 2), 7.5), np.full((2, 2), 7.5), check_nnz=False)
    s = sparse.random((3, 3), density=0.5, random_state=0)
    assert_eq(sparse.zeros_like(s), np.zeros((3, 3)))
    assert_eq(sparse.full_like(s, 2.0), np.full((3, 3), 2.0), check_nnz=False)


def test_random_statistics():
    s = sparse.random((100, 100), density=0.1, random_state=0)
    assert abs(s.nnz - 1000) <= 1
    assert sparse.random((10, 10), nnz=17, random_state=0).nnz == 17
    # deterministic under the same seed
    s2 = sparse.random((100, 100), density=0.1, random_state=0)
    assert_eq(s, s2)


def test_random_formats():
    for fmt, cls in [("coo", COO), ("gcxs", sparse.GCXS), ("dok", sparse.DOK)]:
        s = sparse.random((10, 10), density=0.2, random_state=0, format=fmt)
        assert isinstance(s, cls)


def test_todense_fill_value():
    s = sparse.full((3, 3), 4.0)
    assert np.array_equal(s.todense(), np.full((3, 3), 4.0))


def test_prune():
    coords = np.array([[0, 1, 2], [0, 1, 2]])
    data = np.array([1.0, 0.0, 2.0])
    s = COO(coords, data, shape=(3, 3), prune=True)
    assert s.nnz == 2


def test_broadcast_to():
    x = np.random.default_rng(8).random((3, 1, 4))
    x[x < 0.5] = 0
    s = COO.from_numpy(x)
    assert_eq(sparse.broadcast_to(s, (3, 5, 4)), np.broadcast_to(x, (3, 5, 4)))
    assert_eq(sparse.broadcast_to(s, (2, 3, 1, 4)), np.broadcast_to(x, (2, 3, 1, 4)))


def test_asformat_roundtrips():
    s = sparse.random((5, 6), density=0.3, random_state=0)
    for fmt in ["coo", "gcxs", "dok", "csr", "csc"]:
        conv = s.asformat(fmt)
        assert_eq(conv, s.todense())
        back = conv.asformat("coo")
        assert_eq(back, s)


def test_device_stubs():
    s = sparse.random((3, 3), density=0.5, random_state=0)
    assert s.device == "cpu" or hasattr(s.device, "platform")
    assert s.to_device("cpu") is s


def test_scalar_conversions():
    s = COO.from_numpy(np.array(3.5))
    assert float(s) == 3.5
    assert int(s) == 3
    assert bool(s)


@pytest.mark.parametrize("dtype", [np.float64, np.float32, np.float16, np.int64, np.int32, np.uint8, np.bool_, np.complex128])
def test_dtype_grid_roundtrip_and_sum(dtype):
    rng = np.random.default_rng(11)
    x = (rng.random((5, 6)) * 4).astype(dtype)
    x[(rng.random((5, 6)) < 0.5)] = 0
    s = COO.from_numpy(x)
    assert s.dtype == dtype
    assert_eq(s, x)
    assert_eq(s.sum(axis=0), x.sum(axis=0))
    if np.issubdtype(dtype, np.number) and dtype != np.bool_:
        assert_eq(s + s, x + x)


def test_warn_on_too_dense(monkeypatch):
    from sparse_tpu import _settings

    monkeypatch.setattr(_settings, "WARN_ON_TOO_DENSE", True)
    with pytest.warns(RuntimeWarning, match="no less memory"):
        COO.from_numpy(np.ones((3, 3)))


def test_auto_densify(monkeypatch):
    from sparse_tpu import _settings

    s = sparse.random((3, 3), density=0.5, random_state=0)
    monkeypatch.setattr(_settings, "AUTO_DENSIFY", True)
    arr = np.asarray(s)
    assert isinstance(arr, np.ndarray)
    np.testing.assert_allclose(arr, s.todense())


def test_5d_ops():
    x = np.random.default_rng(20).random((3, 2, 4, 2, 3))
    x[x < 0.7] = 0
    s = COO.from_numpy(x)
    assert_eq(s.sum(axis=(1, 3)), x.sum(axis=(1, 3)))
    assert_eq(s.transpose((4, 2, 0, 3, 1)), x.transpose((4, 2, 0, 3, 1)))
    assert_eq(s.reshape((6, 24)), x.reshape((6, 24)))
    assert_eq(s[1, :, 2], x[1, :, 2])
    assert_eq(s * s, x * x)


def test_large_linearization_reshape():
    # shape whose linearization exceeds int32 (no densify: compare triplets)
    s = sparse.random((100000, 100000), density=2e-8, random_state=21)
    r = s.reshape((100000 * 100000,))
    assert r.shape == (10000000000,)
    back = r.reshape((100000, 100000))
    np.testing.assert_array_equal(np.asarray(back.coords), np.asarray(s.coords))
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(s.data))


def test_mixed_dtype_promotion():
    a = COO.from_numpy(np.array([[1, 0], [0, 2]], dtype=np.int32))
    b = COO.from_numpy(np.array([[0.5, 0], [0, 0.25]]))
    r = a + b
    assert r.dtype == np.float64
    assert_eq(r, a.todense() + b.todense())
