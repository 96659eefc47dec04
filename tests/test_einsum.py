"""einsum tests — mirrors reference ``test_einsum.py``: a grid of case
strings checked against ``np.einsum``."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu._utils import assert_eq

CASES_2OPS = [
    ("ij,jk->ik", (4, 5), (5, 6)),
    ("ij,jk", (4, 5), (5, 6)),
    ("ij,ij->ij", (4, 5), (4, 5)),
    ("ij,ij->", (4, 5), (4, 5)),
    ("ij,kj->ik", (4, 5), (6, 5)),
    ("ijk,jkl->il", (2, 3, 4), (3, 4, 5)),
    ("ijk,kl->ijl", (2, 3, 4), (4, 5)),
    ("i,i->", (5,), (5,)),
    ("i,j->ij", (4,), (5,)),
    ("ij,j->i", (4, 5), (5,)),
    ("bij,bjk->bik", (2, 3, 4), (2, 4, 5)),
    ("...ij,...jk->...ik", (2, 3, 4), (2, 4, 5)),
    ("ij,jk->ki", (4, 5), (5, 6)),
]

CASES_1OP = [
    ("ij->ji", (4, 5)),
    ("ij->", (4, 5)),
    ("ij->i", (4, 5)),
    ("ij->j", (4, 5)),
    ("ii->i", (5, 5)),
    ("ii->", (5, 5)),
    ("ijk->ikj", (2, 3, 4)),
    ("ijk->k", (2, 3, 4)),
    ("iji->j", (3, 4, 3)),
    ("...i->...", (2, 3, 4)),
    ("ij...->...", (2, 3, 4)),
]


@pytest.mark.parametrize("subscript,a_shape,b_shape", CASES_2OPS)
def test_einsum_two_operands(subscript, a_shape, b_shape):
    a = sparse.random(a_shape, density=0.4, random_state=0)
    b = sparse.random(b_shape, density=0.4, random_state=1)
    expected = np.einsum(subscript, a.todense(), b.todense())
    got = sparse.einsum(subscript, a, b)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


@pytest.mark.parametrize("subscript,shape", CASES_1OP)
def test_einsum_single_operand(subscript, shape):
    a = sparse.random(shape, density=0.4, random_state=0)
    expected = np.einsum(subscript, a.todense())
    got = sparse.einsum(subscript, a)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


def test_einsum_three_operands():
    a = sparse.random((3, 4), density=0.5, random_state=0)
    b = sparse.random((4, 5), density=0.5, random_state=1)
    c = sparse.random((5, 2), density=0.5, random_state=2)
    expected = np.einsum("ij,jk,kl->il", a.todense(), b.todense(), c.todense())
    got = sparse.einsum("ij,jk,kl->il", a, b, c)
    assert_eq(got, expected, check_nnz=False)


def test_einsum_mixed_dense():
    a = sparse.random((3, 4), density=0.5, random_state=0)
    b = np.random.default_rng(1).random((4, 5))
    expected = np.einsum("ij,jk->ik", a.todense(), b)
    got = sparse.einsum("ij,jk->ik", a, b)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


def test_einsum_interleaved():
    a = sparse.random((3, 4), density=0.5, random_state=0)
    b = sparse.random((4, 5), density=0.5, random_state=1)
    expected = np.einsum(a.todense(), [0, 1], b.todense(), [1, 2], [0, 2])
    got = sparse.einsum(a, [0, 1], b, [1, 2], [0, 2])
    assert_eq(got, expected, check_nnz=False)


def test_einsum_dtype():
    a = sparse.random((3, 4), density=0.5, random_state=0)
    got = sparse.einsum("ij->i", a, dtype=np.float32)
    assert got.dtype == np.float32


def test_einsum_errors():
    a = sparse.random((3, 4), density=0.5, random_state=0)
    with pytest.raises(ValueError):
        sparse.einsum("ij,jk->ik", a)
    with pytest.raises(ValueError):
        sparse.einsum("ijk->i", a)
    with pytest.raises(ValueError):
        sparse.einsum("ij->il", a)


MORE_CASES_1OP = [
    ("ijk->ijk", (2, 3, 4)),
    ("ijk->kij", (2, 3, 4)),
    ("iij->ij", (3, 3, 4)),
    ("iij->j", (3, 3, 4)),
    ("iji->ij", (3, 4, 3)),
    ("ii", (4, 4)),
    ("ij", (3, 4)),
    ("...jk->...kj", (2, 3, 4)),
]

MORE_CASES_2OPS = [
    ("ij,kl->ijkl", (2, 3), (4, 2)),
    ("ij,kl->", (2, 3), (4, 2)),
    ("ij,kj->ikj", (3, 4), (5, 4)),
    ("ijk,ijk->", (2, 3, 4), (2, 3, 4)),
    ("ijk,jk->i", (2, 3, 4), (3, 4)),
    ("ijk,jk->ij", (2, 3, 4), (3, 4)),
    ("ijk,jk->ik", (2, 3, 4), (3, 4)),
    ("ab,bc->ca", (3, 4), (4, 5)),
    ("...k,...k->...", (2, 3, 4), (2, 3, 4)),
    ("i...,i...->...", (2, 3, 4), (2, 3, 4)),
]


@pytest.mark.parametrize("subscript,shape", MORE_CASES_1OP)
def test_einsum_single_more(subscript, shape):
    a = sparse.random(shape, density=0.4, random_state=3)
    expected = np.einsum(subscript, a.todense())
    got = sparse.einsum(subscript, a)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


@pytest.mark.parametrize("subscript,a_shape,b_shape", MORE_CASES_2OPS)
def test_einsum_two_more(subscript, a_shape, b_shape):
    a = sparse.random(a_shape, density=0.4, random_state=4)
    b = sparse.random(b_shape, density=0.4, random_state=5)
    expected = np.einsum(subscript, a.todense(), b.todense())
    got = sparse.einsum(subscript, a, b)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)
