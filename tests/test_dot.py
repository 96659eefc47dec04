"""Matmul family tests — mirrors reference ``test_dot.py`` and
``test_tensordot.py`` coverage: format×format grids, shapes 1-D..4-D,
return_type, SDDMM."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, GCXS
from sparse_tpu._utils import assert_eq


def fmt(s, format):
    return s.asformat(format) if format != "dense" else s.todense()


@pytest.mark.parametrize("a_format", ["coo", "gcxs", "dense"])
@pytest.mark.parametrize("b_format", ["coo", "gcxs", "dense"])
def test_matmul_2d(a_format, b_format):
    if a_format == b_format == "dense":
        pytest.skip("nothing sparse")
    a = sparse.random((8, 6), density=0.3, random_state=0)
    b = sparse.random((6, 5), density=0.3, random_state=1)
    ax = fmt(a, a_format)
    bx = fmt(b, b_format)
    expected = a.todense() @ b.todense()
    got = ax @ bx
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(got, expected)


@pytest.mark.parametrize("a_shape,b_shape", [((6,), (6,)), ((6,), (6, 5)), ((8, 6), (6,))])
def test_dot_1d(a_shape, b_shape):
    a = sparse.random(a_shape, density=0.5, random_state=0)
    b = sparse.random(b_shape, density=0.5, random_state=1)
    expected = np.dot(a.todense(), b.todense())
    got = sparse.dot(a, b)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


@pytest.mark.parametrize(
    "a_shape,b_shape,axes",
    [
        [(3, 4), (4, 3), (1, 0)],
        [(3, 4), (4, 3), ((1, 0), (0, 1))],
        [(3, 4), (3, 4), ((0, 1), (0, 1))],
        [(3, 4, 5), (4, 3), ((1, 0), (0, 1))],
        [(3, 4), (5, 4, 3), ((1, 0), (1, 2))],
        [(3, 4, 5), (5,), 1],
        [(3, 4), (4,), 1],
        [(4,), (4, 3), 1],
        [(4,), (4,), 1],
        [(4,), (4,), 0],
        [(4,), (4,), (0, 0)],
    ],
)
def test_tensordot(a_shape, b_shape, axes):
    a = sparse.random(a_shape, density=0.4, random_state=0)
    b = sparse.random(b_shape, density=0.4, random_state=1)
    expected = np.tensordot(a.todense(), b.todense(), axes=axes)
    got = sparse.tensordot(a, b, axes=axes)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)


def test_tensordot_dense_operand():
    a = sparse.random((3, 4, 5), density=0.3, random_state=0)
    b = np.random.default_rng(1).random((5, 4, 2))
    got = sparse.tensordot(a, b, axes=([1, 2], [1, 0]))
    np.testing.assert_allclose(got, np.tensordot(a.todense(), b, axes=([1, 2], [1, 0])))


def test_tensordot_return_type():
    a = sparse.random((5, 6), density=0.3, random_state=0)
    b = np.random.default_rng(1).random((6, 4))
    res = sparse.tensordot(a, b, axes=(1, 0), return_type=COO)
    assert isinstance(res, COO)
    assert_eq(res, a.todense() @ b, check_nnz=False)
    res = sparse.tensordot(a, a.T, axes=(1, 0), return_type=np.ndarray)
    assert isinstance(res, np.ndarray)
    np.testing.assert_allclose(res, a.todense() @ a.todense().T)


@pytest.mark.parametrize("a_shape,b_shape", [((2, 3, 4), (2, 4, 5)), ((3, 4), (2, 4, 5)), ((2, 3, 4), (4, 5)), ((2, 2, 3, 4), (2, 2, 4, 5))])
def test_matmul_batched(a_shape, b_shape):
    a = sparse.random(a_shape, density=0.4, random_state=0)
    b = sparse.random(b_shape, density=0.4, random_state=1)
    expected = np.matmul(a.todense(), b.todense())
    got = a @ b
    assert_eq(got, expected, check_nnz=False)


def test_matmul_1d_promotion():
    a = sparse.random((5, 4), density=0.5, random_state=0)
    v = sparse.random((4,), density=0.7, random_state=1)
    got = a @ v
    expected = a.todense() @ v.todense()
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


def test_matmul_errors():
    a = sparse.random((5, 4), density=0.5, random_state=0)
    with pytest.raises(ValueError):
        sparse.matmul(a, np.float64(3))


def test_matmul_nan_warning():
    x = np.array([[np.nan, 1.0], [0.0, 2.0]])
    s = COO.from_numpy(x)
    with pytest.warns(RuntimeWarning):
        _ = s @ np.ones((2, 2))


def test_dot_nonzero_fill_raises():
    a = sparse.random((4, 4), density=0.5, random_state=0, fill_value=1.0)
    with pytest.raises(ValueError):
        sparse.dot(a, a)


def test_dot_complex():
    x = np.random.default_rng(0).random((4, 5)) + 1j * np.random.default_rng(1).random((4, 5))
    x[np.abs(x) < 0.8] = 0
    s = COO.from_numpy(x)
    got = sparse.dot(s, s.T)
    expected = np.dot(x, x.T)
    assert_eq(got, expected, check_nnz=False)


def test_spgemm_gcxs_output_format():
    a = sparse.random((6, 5), density=0.4, random_state=0, format="gcxs")
    b = sparse.random((5, 7), density=0.4, random_state=1, format="gcxs")
    res = a @ b
    assert isinstance(res, GCXS)
    assert_eq(res, a.todense() @ b.todense(), check_nnz=False)


def test_sddmm():
    s = sparse.random((20, 30), density=0.1, random_state=0)
    lhs = np.random.default_rng(1).random((20, 8))
    rhs = np.random.default_rng(2).random((8, 30))
    res = sparse.sddmm(s, lhs, rhs)
    expected = s.todense() * (lhs @ rhs)
    assert_eq(res, expected, check_nnz=False)


def test_vecdot():
    a = sparse.random((4, 5), density=0.5, random_state=0)
    b = sparse.random((4, 5), density=0.5, random_state=1)
    got = sparse.vecdot(a, b, axis=-1)
    expected = np.einsum("ij,ij->i", a.todense(), b.todense())
    assert_eq(got, expected, check_nnz=False)


def test_outer_method():
    a = sparse.random((5,), density=0.6, random_state=0)
    b = sparse.random((4,), density=0.6, random_state=1)
    got = np.multiply.outer(a, b)
    assert_eq(got, np.multiply.outer(a.todense(), b.todense()), check_nnz=False)


def test_tensordot_empty():
    a = COO.from_numpy(np.empty((3, 0)))
    b = COO.from_numpy(np.empty((0, 4)))
    got = sparse.tensordot(a, b, axes=(1, 0))
    np.testing.assert_allclose(
        got.todense() if isinstance(got, sparse.SparseArray) else got, np.zeros((3, 4))
    )


def test_gcxs_slicing_after_dot():
    # regression area flagged in the reference suite (test_dot.py:342-396)
    a = sparse.random((8, 6), density=0.4, random_state=0, format="gcxs")
    b = sparse.random((6, 7), density=0.4, random_state=1, format="gcxs")
    res = a @ b
    dense = a.todense() @ b.todense()
    assert_eq(res[1:5], dense[1:5], check_nnz=False)
    assert_eq(res[:, 2:6], dense[:, 2:6], check_nnz=False)
    assert_eq(res.T[0], dense.T[0], check_nnz=False)


def test_dense_times_sparse_complex():
    rng = np.random.default_rng(0)
    a = rng.random((4, 5)) + 1j * rng.random((4, 5))
    bx = rng.random((5, 6)) + 1j * rng.random((5, 6))
    bx[np.abs(bx) < 1.0] = 0
    b = COO.from_numpy(bx)
    got = sparse.dot(a, b)
    np.testing.assert_allclose(np.asarray(got), a @ bx)


def test_sparse_1d_rhs():
    a = np.random.default_rng(1).random((4, 6))
    v = sparse.random((6,), density=0.5, random_state=2)
    got = sparse.dot(a, v)
    expected = a @ v.todense()
    np.testing.assert_allclose(np.asarray(got if isinstance(got, np.ndarray) else got.todense()), expected)


def test_gcxs_slicing_after_dot():
    # reference regression territory: results of GCXS @ GCXS must index
    # correctly (`test_dot.py:342-396`)
    rng = np.random.default_rng(18)
    dA = rng.random((30, 40)) * (rng.random((30, 40)) < 0.2)
    dB = rng.random((40, 25)) * (rng.random((40, 25)) < 0.2)
    A = sparse.GCXS.from_numpy(dA)
    B = sparse.GCXS.from_numpy(dB)
    C = A @ B
    dC = dA @ dB
    np.testing.assert_allclose(C[5].todense(), dC[5], atol=1e-12)
    np.testing.assert_allclose(C[3:17].todense(), dC[3:17], atol=1e-12)
    np.testing.assert_allclose(C[:, 4:9].todense(), dC[:, 4:9], atol=1e-12)
    rows = np.array([7, 2, 2, -1])
    np.testing.assert_allclose(C[rows].todense(), dC[rows], atol=1e-12)
    np.testing.assert_allclose(C.T[2].todense(), dC.T[2], atol=1e-12)
    np.testing.assert_allclose((C @ B.T)[0].todense(), (dC @ dB.T)[0], atol=1e-12)


def test_eager_matmul_accelerator_knob(monkeypatch):
    import sparse_tpu._settings as settings
    import sparse_tpu.ops.dot  # noqa: F401

    monkeypatch.setattr(settings, "EAGER_MATMUL_DEVICE", "default")
    rng = np.random.default_rng(19)
    A = sparse.random((60, 40), density=0.2, random_state=0)
    D = rng.random((40, 5))
    np.testing.assert_allclose(A @ D, A.todense() @ D, rtol=1e-6)
    np.testing.assert_allclose(A @ D[:, 0], A.todense() @ D[:, 0], rtol=1e-6)
