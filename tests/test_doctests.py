"""Run the docstring examples of key modules (the reference enables
doctests suite-wide via conftest; we pin the modules that carry examples)."""

import doctest

import pytest

import sparse_tpu
import sparse_tpu._utils
import sparse_tpu.core.coo
import sparse_tpu.ops.common
import sparse_tpu.core.dok
import sparse_tpu.core.gcxs
import sparse_tpu.ops.dot


@pytest.mark.parametrize(
    "module",
    [sparse_tpu.core.coo, sparse_tpu.core.gcxs, sparse_tpu.core.dok, sparse_tpu.ops.dot, sparse_tpu.ops.common, sparse_tpu._utils],
)
def test_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
    assert results.attempted > 0
