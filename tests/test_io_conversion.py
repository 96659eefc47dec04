"""IO (save/load npz) and format-conversion round-trips — mirrors reference
``test_io.py`` and ``test_conversion.py``."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, GCXS
from sparse_tpu._utils import assert_eq

FORMATS = ["coo", "gcxs", "dok", "csr", "csc"]


@pytest.mark.parametrize("compressed", [True, False])
@pytest.mark.parametrize("format", ["coo", "gcxs"])
def test_save_load_npz(tmp_path, compressed, format):
    s = sparse.random((5, 6), density=0.3, random_state=0, format=format)
    path = tmp_path / "arr.npz"
    sparse.save_npz(path, s, compressed=compressed)
    loaded = sparse.load_npz(path)
    assert_eq(loaded, s.todense())
    assert type(loaded).__name__.lower().startswith(format[:3])


def test_save_load_fill_value(tmp_path):
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.5] = 1.5
    s = COO.from_numpy(x, fill_value=1.5)
    path = tmp_path / "fv.npz"
    sparse.save_npz(path, s)
    loaded = sparse.load_npz(path)
    assert float(loaded.fill_value) == 1.5
    assert_eq(loaded, x)


def test_load_invalid(tmp_path):
    path = tmp_path / "bad.npz"
    np.savez(path, foo=np.arange(3))
    with pytest.raises(RuntimeError):
        sparse.load_npz(path)


def test_save_invalid_type(tmp_path):
    with pytest.raises(ValueError):
        sparse.save_npz(tmp_path / "x.npz", np.arange(3))


@pytest.mark.parametrize("format1", FORMATS)
@pytest.mark.parametrize("format2", FORMATS)
def test_conversion_grid(format1, format2):
    if format1 in ("csr", "csc") or format2 in ("csr", "csc"):
        shape = (6, 8)
    else:
        shape = (4, 5, 6)
    s = sparse.random(shape, density=0.3, random_state=0, format=format1)
    dense = s.todense()
    conv = s.asformat(format2)
    assert_eq(conv, dense)
    back = conv.asformat(format1)
    assert_eq(back, dense)


@pytest.mark.parametrize("format1", ["coo", "gcxs", "dok"])
@pytest.mark.parametrize("format2", ["coo", "gcxs", "dok"])
def test_conversion_fill_value(format1, format2):
    x = np.random.default_rng(0).random((4, 5))
    x[x < 0.5] = 0.5
    if format1 == "coo":
        s = COO.from_numpy(x, fill_value=0.5)
    elif format1 == "gcxs":
        s = GCXS.from_numpy(x, fill_value=0.5)
    else:
        s = sparse.DOK.from_numpy(x, fill_value=0.5)
    conv = s.asformat(format2)
    assert float(np.asarray(conv.fill_value)) == 0.5
    assert np.allclose(conv.todense(), x)


def test_asarray_formats():
    x = np.random.default_rng(0).random((5, 6))
    x[x < 0.5] = 0
    for format in FORMATS:
        res = sparse.asarray(x, format=format)
        assert res.format == format
        assert_eq(res, x)


def test_asarray_dtype():
    x = np.eye(3)
    res = sparse.asarray(x, dtype=np.float32)
    assert res.dtype == np.float32


def test_as_coo():
    x = np.eye(4)
    assert_eq(sparse.as_coo(x), x)
    import scipy.sparse

    m = scipy.sparse.eye(4)
    assert_eq(sparse.as_coo(m), np.eye(4))
