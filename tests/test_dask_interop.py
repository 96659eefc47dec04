"""Dask-tokenize interop, verified without dask installed.

The reference asserts deterministic tokens for equal arrays and distinct
tokens on mutation (``sparse/numba_backend/tests/test_dask_interop.py``).
dask is not installed in this image, so these tests inject a minimal stub
``dask.base.normalize_token`` that canonicalises the token payload to
hashable bytes — exercising exactly the payload ``__dask_tokenize__``
hands to dask, which is where determinism must live.
"""

import sys
import types

import numpy as np
import pytest

import sparse_tpu as sparse


@pytest.fixture()
def dask_stub(monkeypatch):
    def normalize_token(obj):
        if isinstance(obj, tuple):
            return tuple(normalize_token(o) for o in obj)
        if isinstance(obj, np.ndarray):
            return (obj.dtype.str, obj.shape, obj.tobytes())
        if isinstance(obj, type):
            return obj.__module__ + "." + obj.__qualname__
        if isinstance(obj, (np.generic,)):
            return (obj.dtype.str, obj.tobytes())
        return obj

    base = types.ModuleType("dask.base")
    base.normalize_token = normalize_token
    dask = types.ModuleType("dask")
    dask.base = base
    monkeypatch.setitem(sys.modules, "dask", dask)
    monkeypatch.setitem(sys.modules, "dask.base", base)
    return normalize_token


@pytest.mark.parametrize("format", ["coo", "gcxs"])
def test_tokenize_deterministic(dask_stub, format):
    x = sparse.random((20, 20), density=0.2, random_state=42, format=format)
    y = sparse.random((20, 20), density=0.2, random_state=42, format=format)
    assert x.__dask_tokenize__() == x.__dask_tokenize__()
    # independently constructed equal-content arrays tokenize identically
    assert x.__dask_tokenize__() == y.__dask_tokenize__()
    # a deep copy tokenizes identically
    assert x.copy(deep=True).__dask_tokenize__() == x.__dask_tokenize__()
    # the payload is hashable (dask requires this downstream)
    hash(x.__dask_tokenize__())


@pytest.mark.parametrize("format", ["coo", "gcxs"])
def test_tokenize_changes_on_mutation(dask_stub, format):
    x = sparse.random((20, 20), density=0.2, random_state=42, format=format)
    tok = x.__dask_tokenize__()

    y = x.copy(deep=True)
    y.data[0] += 1.0
    assert y.__dask_tokenize__() != tok

    # different fill value -> different token
    z = sparse.random((20, 20), density=0.2, random_state=42, format=format)
    zf = (z + 1) - 1  # keep pattern, same data
    assert zf.fill_value == 0.0
    z2 = type(zf).from_numpy(zf.todense() + 0)  # same content, same token path
    assert zf.__dask_tokenize__() == z2.__dask_tokenize__()


def test_tokenize_distinguishes_formats(dask_stub):
    x = sparse.random((20, 20), density=0.2, random_state=7, format="coo")
    g = x.asformat("gcxs")
    assert x.__dask_tokenize__() != g.__dask_tokenize__()


def test_tokenize_distinguishes_shape_and_fill(dask_stub):
    x = sparse.random((4, 5), density=0.5, random_state=0)
    y = x.reshape((5, 4))
    assert x.__dask_tokenize__() != y.__dask_tokenize__()

    f = sparse.COO(x.coords, x.data, shape=x.shape, fill_value=1.5)
    assert f.__dask_tokenize__() != x.__dask_tokenize__()
