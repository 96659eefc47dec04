"""Randomized differential tests: random shapes/densities/fill-values/ops,
always compared against dense numpy. A cheap hypothesis-style sweep that
exercises interactions the curated suites don't."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO
from sparse_tpu._utils import assert_eq

N_CASES = 40


def random_case(rng, formats=("coo",)):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(1, 8)) for _ in range(ndim))
    density = float(rng.uniform(0.05, 0.6))
    fv = float(rng.choice([0.0, 0.0, 0.0, 1.5, -2.0]))
    x = rng.random(shape)
    mask = rng.random(shape) < density
    dense = np.where(mask, x, fv)
    s = COO.from_numpy(dense, fill_value=fv)
    fmt = rng.choice(list(formats))
    if fmt != "coo" and (ndim >= 2 or fmt == "dok"):
        s = s.asformat(fmt)
    return dense, s


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_elemwise_binary(seed):
    rng = np.random.default_rng(seed)
    dense, s = random_case(rng, formats=("coo", "gcxs", "dok"))
    dense2 = np.where(rng.random(dense.shape) < 0.4, rng.random(dense.shape), np.asarray(s.fill_value))
    s2 = COO.from_numpy(dense2, fill_value=float(np.asarray(s.fill_value)))
    op = rng.choice([np.add, np.multiply, np.maximum, np.minimum, np.subtract])
    assert_eq(op(s, s2), op(dense, dense2), check_nnz=False)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_reduce(seed):
    rng = np.random.default_rng(seed + 1000)
    dense, s = random_case(rng, formats=("coo", "gcxs"))
    axis_opts = [None] + list(range(dense.ndim))
    axis = axis_opts[int(rng.integers(0, len(axis_opts)))]
    keepdims = bool(rng.integers(0, 2))
    red = rng.choice(["sum", "max", "min", "mean"])
    expected = getattr(dense, red)(axis=axis, keepdims=keepdims)
    got = getattr(s, red)(axis=axis, keepdims=keepdims)
    assert_eq(got, expected, check_nnz=False)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_reshape_transpose(seed):
    rng = np.random.default_rng(seed + 2000)
    dense, s = random_case(rng)
    perm = tuple(rng.permutation(dense.ndim).tolist())
    assert_eq(s.transpose(perm), dense.transpose(perm))
    assert_eq(s.reshape((-1,)), dense.reshape(-1))
    assert_eq(s.reshape(dense.shape[::-1]), dense.reshape(dense.shape[::-1]))


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_indexing(seed):
    rng = np.random.default_rng(seed + 3000)
    dense, s = random_case(rng)
    idx = []
    for d in dense.shape:
        kind = rng.integers(0, 4)
        if kind == 0:
            idx.append(int(rng.integers(-d, d)))
        elif kind == 1:
            a = int(rng.integers(0, d + 1))
            b = int(rng.integers(0, d + 1))
            step = int(rng.choice([1, 1, 2, -1]))
            idx.append(slice(min(a, b), max(a, b), step) if step > 0 else slice(None, None, -1))
        elif kind == 2:
            idx.append(slice(None))
        else:
            n = int(rng.integers(1, d + 1))
            idx.append(rng.integers(0, d, n))
    idx = tuple(idx)
    # numpy: multiple advanced indices must broadcast; keep at most one array
    arrays = [i for i in idx if isinstance(i, np.ndarray)]
    if len(arrays) > 1:
        idx = tuple(i if not isinstance(i, np.ndarray) else slice(None) for i in idx[:-1]) + (idx[-1],)
    expected = dense[idx]
    got = s[idx]
    if np.isscalar(expected) or expected.ndim == 0:
        assert np.allclose(np.asarray(got), expected)
    else:
        assert_eq(got, expected, check_nnz=False)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_matmul(seed):
    rng = np.random.default_rng(seed + 4000)
    m, k, n = (int(rng.integers(1, 12)) for _ in range(3))
    a = sparse.random((m, k), density=float(rng.uniform(0.1, 0.7)), random_state=int(rng.integers(1 << 16)))
    b = sparse.random((k, n), density=float(rng.uniform(0.1, 0.7)), random_state=int(rng.integers(1 << 16)))
    assert_eq(a @ b, a.todense() @ b.todense(), check_nnz=False)
    d = rng.random((k, n))
    np.testing.assert_allclose(a @ d, a.todense() @ d)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_format_roundtrip(seed):
    rng = np.random.default_rng(seed + 5000)
    dense, s = random_case(rng)
    fmt = rng.choice(["gcxs", "dok"])
    conv = s.asformat(fmt)
    assert_eq(conv, dense)
    assert_eq(conv.asformat("coo"), s)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_concat_stack(seed):
    rng = np.random.default_rng(seed + 6000)
    dense, s = random_case(rng)
    axis = int(rng.integers(0, dense.ndim))
    assert_eq(sparse.concatenate([s, s], axis=axis), np.concatenate([dense, dense], axis=axis), check_nnz=False)
    axis2 = int(rng.integers(0, dense.ndim + 1))
    assert_eq(sparse.stack([s, s], axis=axis2), np.stack([dense, dense], axis=axis2), check_nnz=False)


EINSUM_SPECS = [
    ("ij,jk->ik", [(0, 1), (1, 2)]),
    ("ij,ik->jk", [(0, 1), (0, 2)]),
    ("ijk,ik->ij", [(0, 1, 2), (0, 2)]),
    ("ij,ij->i", [(0, 1), (0, 1)]),
    ("ijk->j", [(0, 1, 2)]),
    ("ii->i", [(0, 0)]),
]


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_einsum(seed):
    rng = np.random.default_rng(seed + 7000)
    spec, dim_ids = EINSUM_SPECS[int(rng.integers(0, len(EINSUM_SPECS)))]
    extents = {d: int(rng.integers(2, 7)) for d in range(3)}
    operands, denses = [], []
    for ids in dim_ids:
        shape = tuple(extents[d] for d in ids)
        s = sparse.random(shape, density=float(rng.uniform(0.2, 0.7)), random_state=int(rng.integers(1 << 16)))
        operands.append(s)
        denses.append(s.todense())
    expected = np.einsum(spec, *denses)
    got = sparse.einsum(spec, *operands)
    if isinstance(got, sparse.SparseArray):
        assert_eq(got, expected, check_nnz=False)
    else:
        np.testing.assert_allclose(np.asarray(got), expected)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_sort_where(seed):
    rng = np.random.default_rng(seed + 8000)
    dense, s = random_case(rng)
    if dense.ndim >= 1:
        ax = int(rng.integers(0, dense.ndim))
        desc = bool(rng.integers(0, 2))
        expected = np.sort(dense, axis=ax)
        if desc:
            expected = np.flip(expected, axis=ax)
        assert_eq(sparse.sort(s, axis=ax, descending=desc), expected, check_nnz=False)
    thresh = float(rng.uniform(0, 1))
    assert_eq(
        sparse.where(s > thresh, s, s * 0), np.where(dense > thresh, dense, dense * 0), check_nnz=False
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_kernels_vs_oracle(seed):
    import jax.numpy as jnp

    from sparse_tpu.kernels import coo_spmm, mttkrp, sddmm

    rng = np.random.default_rng(seed + 9000)
    m, k, n = (int(rng.integers(2, 20)) for _ in range(3))
    a = sparse.random((m, k), density=float(rng.uniform(0.1, 0.6)), random_state=int(rng.integers(1 << 16)))
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    data = jnp.asarray(np.asarray(a.data))
    b = rng.random((k, n))
    np.testing.assert_allclose(
        np.asarray(coo_spmm(rows, cols, data, jnp.asarray(b), n_rows=m)), a.todense() @ b, rtol=1e-10
    )
    # sddmm at a's pattern
    lhs = rng.random((m, 5))
    rhs = rng.random((5, k))
    vals = sddmm(rows, cols, data, jnp.asarray(lhs), jnp.asarray(rhs))
    expected = np.asarray(a.data) * (lhs @ rhs)[np.asarray(a.coords[0]), np.asarray(a.coords[1])]
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-10)
    # mttkrp on a random 3-D tensor
    t = sparse.random((m, k, 4), density=0.2, random_state=int(rng.integers(1 << 16)))
    c = rng.random((k, 3))
    d = rng.random((4, 3))
    out = mttkrp(
        jnp.asarray(np.asarray(t.coords[0])), jnp.asarray(np.asarray(t.coords[1])),
        jnp.asarray(np.asarray(t.coords[2])), jnp.asarray(np.asarray(t.data)),
        jnp.asarray(c), jnp.asarray(d), n_rows=m,
    )
    np.testing.assert_allclose(np.asarray(out), np.einsum("ijk,jr,kr->ir", t.todense(), c, d), rtol=1e-10)
