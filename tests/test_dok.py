"""DOK format tests — mirrors reference ``test_dok.py``."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, DOK
from sparse_tpu._utils import assert_eq


def test_construct_and_get():
    d = DOK((3, 4))
    d[1, 2] = 5.0
    assert d[1, 2] == 5.0
    assert d[0, 0] == 0.0
    assert d.nnz == 1


def test_negative_index():
    d = DOK((3, 4))
    d[-1, -1] = 2.0
    assert d[2, 3] == 2.0


def test_out_of_bounds():
    d = DOK((3, 4))
    with pytest.raises(IndexError):
        d[5, 0] = 1.0
    with pytest.raises(IndexError):
        _ = d[5, 0]


def test_set_slice():
    d = DOK((4, 5))
    d[1, 1:4] = 3.0
    x = np.zeros((4, 5))
    x[1, 1:4] = 3.0
    assert_eq(d.to_coo(), x)
    d[2] = 1.0
    x[2] = 1.0
    assert_eq(d.to_coo(), x)


def test_set_array_values():
    d = DOK((3, 4))
    d[0, :] = np.arange(4, dtype=np.float64)
    x = np.zeros((3, 4))
    x[0, :] = np.arange(4)
    assert_eq(d.to_coo(), x)


def test_set_fill_removes():
    d = DOK((3, 3))
    d[1, 1] = 5.0
    assert d.nnz == 1
    d[1, 1] = 0.0
    assert d.nnz == 0


def test_fancy_set_get():
    d = DOK((5, 5))
    rows = np.array([0, 2, 4])
    cols = np.array([1, 3, 0])
    d[rows, cols] = 7.0
    x = np.zeros((5, 5))
    x[rows, cols] = 7.0
    assert_eq(d.to_coo(), x)
    got = d[rows, cols]
    assert_eq(got, x[rows, cols], check_nnz=False)


def test_from_to_coo():
    s = sparse.random((5, 6), density=0.3, random_state=0)
    d = DOK.from_coo(s)
    assert d.nnz == s.nnz
    assert_eq(d.to_coo(), s)
    assert_eq(d.todense(), s.todense())


def test_from_numpy():
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.5] = 0
    d = DOK.from_numpy(x)
    assert_eq(d.to_coo(), x)


def test_ctor_conversions():
    s = sparse.random((4, 4), density=0.3, random_state=0)
    assert_eq(DOK(s).to_coo(), s)
    x = s.todense()
    assert_eq(DOK(x).to_coo(), x)


def test_dict_init():
    d = DOK((2, 3), data={(0, 1): 4.0, (1, 2): 5.0})
    x = np.zeros((2, 3))
    x[0, 1] = 4
    x[1, 2] = 5
    assert_eq(d.to_coo(), x)


def test_fill_value():
    d = DOK((3, 3), fill_value=1.5, dtype=np.float64)
    assert d[0, 0] == 1.5
    d[1, 1] = 3.0
    x = np.full((3, 3), 1.5)
    x[1, 1] = 3.0
    assert np.allclose(d.todense(), x)


def test_getitem_complex_falls_back_to_coo():
    s = sparse.random((5, 6), density=0.4, random_state=0)
    d = DOK.from_coo(s)
    x = s.todense()
    got = d[1:4, ::2]
    assert_eq(got, x[1:4, ::2])


def test_asformat():
    d = DOK((3, 3), data={(0, 0): 1.0})
    assert isinstance(d.asformat("coo"), COO)
    assert isinstance(d.asformat("gcxs"), sparse.GCXS)
    assert d.asformat("dok") is d


def test_elemwise_output_dok():
    a = sparse.random((4, 4), density=0.3, random_state=0, format="dok")
    b = sparse.random((4, 4), density=0.3, random_state=1, format="dok")
    res = a + b
    assert isinstance(res, DOK)
    assert_eq(res.to_coo(), a.todense() + b.todense())


def test_reductions():
    d = sparse.random((4, 5), density=0.3, random_state=0, format="dok")
    x = d.todense()
    assert_eq(d.sum(axis=0), x.sum(axis=0))
    assert_eq(d.max(axis=1), x.max(axis=1))


def test_len_and_repr():
    d = DOK((3, 4))
    assert len(d) == 3
    assert "DOK" in repr(d)
