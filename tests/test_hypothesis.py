"""Property-based tests (hypothesis): sparse results must equal dense numpy
for arbitrary generated shapes, patterns, fill values, and op sequences."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import sparse_tpu as sparse
from sparse_tpu import COO
from sparse_tpu._utils import assert_eq

SETTINGS = dict(max_examples=30, deadline=None, derandomize=True)


@st.composite
def sparse_and_dense(draw, max_ndim=3, max_side=7, allow_fill=True):
    ndim = draw(st.integers(1, max_ndim))
    shape = tuple(draw(st.integers(1, max_side)) for _ in range(ndim))
    fv = draw(st.sampled_from([0.0, 0.0, 1.5, -1.0])) if allow_fill else 0.0
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    dense = np.where(rng.random(shape) < 0.4, rng.random(shape), fv)
    return dense, COO.from_numpy(dense, fill_value=fv)


@settings(**SETTINGS)
@given(sd=sparse_and_dense(), op=st.sampled_from([np.add, np.multiply, np.maximum, np.subtract]))
def test_prop_binary_same_shape(sd, op):
    dense, s = sd
    assert_eq(op(s, s * 0.5), op(dense, dense * 0.5), check_nnz=False)


@settings(**SETTINGS)
@given(sd=sparse_and_dense(), keepdims=st.booleans(), red=st.sampled_from(["sum", "max", "min", "prod"]))
def test_prop_reduce(sd, keepdims, red):
    dense, s = sd
    if red == "prod" and float(np.asarray(s.fill_value)) != 0.0 and s.nnz != s.size:
        # prod over nonzero fill uses the power super-ufunc; fine, still compare
        pass
    assert_eq(
        getattr(s, red)(axis=0, keepdims=keepdims), getattr(dense, red)(axis=0, keepdims=keepdims), check_nnz=False
    )


@settings(**SETTINGS)
@given(sd=sparse_and_dense(allow_fill=False), data=st.data())
def test_prop_getitem_basic(sd, data):
    dense, s = sd
    idx = []
    for d in dense.shape:
        choice = data.draw(st.integers(0, 2))
        if choice == 0:
            idx.append(data.draw(st.integers(-d, d - 1)))
        elif choice == 1:
            a = data.draw(st.integers(0, d))
            b = data.draw(st.integers(0, d))
            idx.append(slice(min(a, b), max(a, b)))
        else:
            idx.append(slice(None))
    idx = tuple(idx)
    expected = dense[idx]
    got = s[idx]
    if np.ndim(expected) == 0:
        assert np.allclose(np.asarray(got), expected)
    else:
        assert_eq(got, expected, check_nnz=False)


@settings(**SETTINGS)
@given(sd=sparse_and_dense(max_ndim=2, allow_fill=False), seed=st.integers(0, 2**31 - 1))
def test_prop_matmul(sd, seed):
    dense, s = sd
    if dense.ndim != 2:
        return
    rng = np.random.default_rng(seed)
    b = rng.random((dense.shape[1], 3))
    np.testing.assert_allclose(np.asarray(s @ b), dense @ b, rtol=1e-10)


@settings(**SETTINGS)
@given(sd=sparse_and_dense())
def test_prop_roundtrip_formats(sd):
    dense, s = sd
    assert_eq(s.asformat("gcxs"), dense)
    assert_eq(s.asformat("dok"), dense)
    assert_eq(s.asformat("gcxs").asformat("coo"), s)


@settings(**SETTINGS)
@given(sd=sparse_and_dense(allow_fill=False), shift=st.integers(-10, 10))
def test_prop_roll_flip(sd, shift):
    dense, s = sd
    assert_eq(sparse.roll(s, shift, axis=0), np.roll(dense, shift, axis=0))
    assert_eq(sparse.flip(s, axis=0), np.flip(dense, axis=0))
