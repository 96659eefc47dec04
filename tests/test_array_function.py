"""NEP-18 ``__array_function__`` dispatch — numpy functions applied to
sparse inputs route into the sparse namespace (mirrors reference
``test_array_function.py``), plus NEP-13 ufunc protocol details and
jax.experimental.sparse interop."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO
from sparse_tpu._utils import assert_eq


@pytest.fixture
def x_s():
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.6] = 0
    return x, COO.from_numpy(x)


def test_np_stack(x_s):
    x, s = x_s
    assert_eq(np.stack([s, s]), np.stack([x, x]))


def test_np_concatenate(x_s):
    x, s = x_s
    assert_eq(np.concatenate([s, s], axis=1), np.concatenate([x, x], axis=1))


def test_np_dot(x_s):
    x, s = x_s
    got = np.dot(s, s.T)
    assert_eq(got, np.dot(x, x.T), check_nnz=False)


def test_np_tensordot(x_s):
    x, s = x_s
    got = np.tensordot(s, s, axes=([0, 1], [0, 1]))
    assert_eq(got, np.tensordot(x, x, axes=([0, 1], [0, 1])), check_nnz=False)


def test_np_matmul(x_s):
    x, s = x_s
    got = np.matmul(s, s.T)
    assert_eq(got, np.matmul(x, x.T), check_nnz=False)


def test_np_transpose(x_s):
    x, s = x_s
    assert_eq(np.transpose(s), np.transpose(x))


def test_np_reshape(x_s):
    x, s = x_s
    assert_eq(np.reshape(s, (2, 10)), np.reshape(x, (2, 10)))


def test_np_mean_std_var(x_s):
    x, s = x_s
    assert_eq(np.mean(s, axis=0), np.mean(x, axis=0), check_nnz=False)
    assert_eq(np.std(s, axis=0), np.std(x, axis=0), check_nnz=False)
    assert_eq(np.var(s, axis=0), np.var(x, axis=0), check_nnz=False)


def test_np_sum_min_max(x_s):
    x, s = x_s
    assert_eq(np.sum(s, axis=1), np.sum(x, axis=1))
    assert_eq(np.min(s, axis=1), np.min(x, axis=1))
    assert_eq(np.max(s, axis=1), np.max(x, axis=1))


def test_np_roll_flip_pad(x_s):
    x, s = x_s
    assert_eq(np.roll(s, 1, axis=0), np.roll(x, 1, axis=0))
    assert_eq(np.flip(s, axis=1), np.flip(x, axis=1))
    assert_eq(np.pad(s, 1), np.pad(x, 1))


def test_np_where(x_s):
    x, s = x_s
    assert_eq(np.where(s > 0.5, s, 0.0), np.where(x > 0.5, x, 0.0))


def test_np_result_type(x_s):
    _, s = x_s
    assert np.result_type(s, np.int32) == np.result_type(np.float64, np.int32)


def test_np_shape_ndim_size(x_s):
    x, s = x_s
    assert np.shape(s) == x.shape
    assert np.ndim(s) == x.ndim
    assert np.size(s) == x.size


def test_ufunc_out_kwarg(x_s):
    x, s = x_s
    t = s.copy()
    np.add(t, t, out=t)
    assert_eq(t, x + x)


def test_ufunc_unsupported_method_falls_back(x_s):
    _, s = x_s
    with pytest.raises(TypeError):
        np.add.accumulate(s)


def test_reduce_via_ufunc(x_s):
    x, s = x_s
    assert_eq(np.add.reduce(s, axis=0), x.sum(axis=0))
    assert_eq(np.maximum.reduce(s, axis=1), x.max(axis=1))


def test_bcoo_roundtrip(x_s):
    x, s = x_s
    b = s.to_bcoo()
    assert b.shape == s.shape
    import jax.numpy as jnp

    np.testing.assert_allclose(np.asarray(b.todense()), x)
    back = COO.from_bcoo(b)
    assert_eq(back, s)


def test_bcoo_nonzero_fill_raises():
    s = sparse.full((3, 3), 2.0)
    with pytest.raises(ValueError):
        s.to_bcoo()


def test_dask_tokenize():
    pytest.importorskip("dask")
    from dask.base import tokenize

    s = sparse.random((5, 5), density=0.3, random_state=0)
    t = sparse.random((5, 5), density=0.3, random_state=0)
    assert tokenize(s) == tokenize(t)
    u = sparse.random((5, 5), density=0.3, random_state=1)
    assert tokenize(s) != tokenize(u)
