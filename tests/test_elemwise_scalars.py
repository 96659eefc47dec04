"""Scalar-operand elemwise grid — ports the reference's
``test_elemwise_scalar`` / ``test_leftside_elemwise_scalar`` /
``test_nonzero_outout_fv_ufunc`` coverage (``tests/test_elemwise.py:402-``)."""

import operator

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, DOK, GCXS
from sparse_tpu._utils import assert_eq

SCALAR_CASES = [
    (operator.mul, 5),
    (operator.add, 0),
    (operator.sub, 0),
    (operator.pow, 5),
    (operator.truediv, 3),
    (operator.floordiv, 4),
    (operator.gt, 5),
    (operator.lt, -5),
    (operator.ne, 0),
    (operator.ge, 5),
    (operator.le, -3),
    (operator.eq, 1),
    (operator.mod, 5),
]


@pytest.mark.parametrize("func,scalar", SCALAR_CASES)
@pytest.mark.parametrize("convert_to_np_number", [True, False])
@pytest.mark.parametrize("format", [COO, GCXS, DOK])
def test_elemwise_scalar(func, scalar, convert_to_np_number, format):
    xs = sparse.random((2, 3, 4), density=0.5, random_state=0, format=format.__name__.lower())
    if convert_to_np_number:
        scalar = np.float32(scalar)
    x = xs.todense()
    fs = func(xs, scalar)
    assert isinstance(fs, format)
    assert xs.nnz >= fs.nnz
    assert_eq(fs, func(x, scalar), check_nnz=False, compare_dtype=not convert_to_np_number)


@pytest.mark.parametrize(
    "func,scalar",
    [
        (operator.mul, 5),
        (operator.add, 0),
        (operator.sub, 0),
        (operator.gt, -5),
        (operator.lt, 5),
        (operator.ne, 0),
        (operator.ge, -5),
        (operator.le, 3),
        (operator.eq, 1),
    ],
)
@pytest.mark.parametrize("convert_to_np_number", [True, False])
def test_leftside_elemwise_scalar(func, scalar, convert_to_np_number):
    xs = sparse.random((2, 3, 4), density=0.5, random_state=0)
    if convert_to_np_number:
        scalar = np.float32(scalar)
    x = xs.todense()
    fs = func(scalar, xs)
    assert isinstance(fs, COO)
    assert_eq(fs, func(scalar, x), check_nnz=False, compare_dtype=not convert_to_np_number)


@pytest.mark.parametrize(
    "func",
    [operator.add, operator.sub, operator.mul, np.maximum, np.minimum, np.hypot],
)
@pytest.mark.parametrize("format", [COO, GCXS, DOK])
def test_nonzero_output_fv_ufunc(func, format):
    # operands dense enough that the op's result at (0,0) can be nonzero
    xs = sparse.random((2, 3, 4), density=0.5, random_state=1, format=format.__name__.lower())
    ys = sparse.random((2, 3, 4), density=0.5, random_state=2, format=format.__name__.lower())
    x = xs.todense()
    y = ys.todense()
    fs = func(xs, ys)
    assert isinstance(fs, format)
    assert_eq(fs, func(x, y), check_nnz=False)


@pytest.mark.parametrize("format", [COO, GCXS, DOK])
def test_scalar_densification_ops(format):
    # x + 1 keeps sparsity structure with fill 1
    xs = sparse.random((3, 4), density=0.5, random_state=3, format=format.__name__.lower())
    fs = xs + 1
    assert isinstance(fs, format)
    assert float(np.asarray(fs.fill_value)) == 1.0
    assert_eq(fs, xs.todense() + 1, check_nnz=False)
