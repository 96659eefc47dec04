"""Systematic autodiff validation: every differentiable kernel's VJP/JVP
checked numerically (``jax.test_util.check_grads``) — the framework's
differentiability claim is load-bearing for the nn layer (block-sparse
training, sparse attention), so the primitives get first-class numerical
gradient coverage, not just "grad runs" smoke.

The reference has no autodiff at all (NumPy/Numba); this surface is new
capability enabled by building on JAX.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

import sparse_tpu as sparse
from sparse_tpu import jitops
from sparse_tpu import kernels


def random_coo(m, n, nnz, seed):
    rng = np.random.default_rng(seed)
    lin = np.unique(rng.integers(0, m * n, size=nnz))
    rows = (lin // n).astype(np.int32)
    cols = (lin % n).astype(np.int32)
    data = rng.standard_normal(lin.size)
    return rows, cols, data


def test_coo_spmv_grads():
    rows, cols, data = random_coo(12, 10, 30, 0)
    x = np.linspace(-1, 1, 10)

    f = lambda d, xx: kernels.coo_spmv(rows, cols, d, xx, n_rows=12)
    check_grads(f, (jnp.asarray(data), jnp.asarray(x)), order=2, modes=["fwd", "rev"])


def test_coo_spmm_grads():
    rows, cols, data = random_coo(12, 10, 30, 1)
    B = np.linspace(-1, 1, 40).reshape(10, 4)

    f = lambda d, bb: kernels.coo_spmm(rows, cols, d, bb, n_rows=12)
    check_grads(f, (jnp.asarray(data), jnp.asarray(B)), order=2, modes=["fwd", "rev"])


def test_ell_spmm_grads():
    rows, cols, data = random_coo(16, 12, 40, 2)
    from sparse_tpu.kernels import build_block_ell

    ell = build_block_ell(rows, cols, data, 16, 12, block_rows=8)
    B = np.linspace(-1, 1, 12 * 4).reshape(12, 4)

    f = lambda d, bb: kernels.ell_spmm(ell.e_rows, ell.e_cols, d, bb, n_rows=16, block_rows=8)
    check_grads(f, (ell.e_data, jnp.asarray(B)), order=2, modes=["fwd", "rev"])


def test_sddmm_grads():
    rows, cols, data = random_coo(10, 9, 25, 3)
    lhs = np.linspace(-1, 1, 10 * 5).reshape(10, 5)
    rhs = np.linspace(1, -1, 5 * 9).reshape(5, 9)

    f = lambda d, l, r: kernels.sddmm(rows, cols, d, l, r)
    check_grads(
        f, (jnp.asarray(data), jnp.asarray(lhs), jnp.asarray(rhs)), order=2, modes=["fwd", "rev"]
    )


def test_mttkrp_grads():
    rng = np.random.default_rng(4)
    I, J, K, R = 8, 7, 6, 3
    lin = np.unique(rng.integers(0, I * J * K, size=40))
    ci = (lin // (J * K)).astype(np.int32)
    cj = ((lin // K) % J).astype(np.int32)
    ck = (lin % K).astype(np.int32)
    data = rng.standard_normal(lin.size)
    C = rng.standard_normal((J, R))
    D = rng.standard_normal((K, R))

    f = lambda d, c, dd: kernels.mttkrp(ci, cj, ck, d, c, dd, n_rows=I)
    check_grads(
        f, (jnp.asarray(data), jnp.asarray(C), jnp.asarray(D)), order=2, modes=["fwd", "rev"]
    )


def test_jitops_spmv_coo_pytree_grad():
    rows, cols, data = random_coo(12, 12, 30, 5)
    A = sparse.COO(np.stack([rows, cols]), data, shape=(12, 12))
    x = np.linspace(-1, 1, 12)

    def f(d, xx):
        At = sparse.COO._make(jnp.asarray(A.coords), d, A.shape, A.fill_value)
        return jitops.spmv(At, xx)

    check_grads(f, (jnp.asarray(np.asarray(A.data)), jnp.asarray(x)), order=2, modes=["fwd", "rev"])


def test_union_elemwise_data_grads():
    rows_a, cols_a, data_a = random_coo(10, 10, 20, 6)
    rows_b, cols_b, data_b = random_coo(10, 10, 22, 7)
    A = sparse.COO(np.stack([rows_a, cols_a]), data_a, shape=(10, 10))
    B = sparse.COO(np.stack([rows_b, cols_b]), data_b, shape=(10, 10))

    def f(da, db):
        At = sparse.COO._make(jnp.asarray(A.coords), da, A.shape, A.fill_value)
        Bt = sparse.COO._make(jnp.asarray(B.coords), db, B.shape, B.fill_value)
        out, _nnz = jitops.union_elemwise(jnp.add, At, Bt)
        return out.data

    check_grads(
        f,
        (jnp.asarray(np.asarray(A.data)), jnp.asarray(np.asarray(B.data))),
        order=2,
        modes=["fwd", "rev"],
    )


def test_esc_spgemm_data_grads():
    rows_a, cols_a, data_a = random_coo(8, 9, 18, 8)
    rows_b, cols_b, data_b = random_coo(9, 7, 20, 9)

    def f(da, db):
        _, _, out_data, _ = kernels.esc_spgemm(
            rows_a, cols_a, da, rows_b, cols_b, db, k=9, n=7,
            product_capacity=128, out_capacity=64,
        )
        return out_data

    # product/sort pipeline is piecewise-linear in the data: first order
    check_grads(f, (jnp.asarray(data_a), jnp.asarray(data_b)), order=1, modes=["rev"])

    # cross-check the VJP against the dense oracle: d(sum(AB))/dA = 1 B^T
    da = np.zeros((8, 9)); da[rows_a, cols_a] = data_a
    db = np.zeros((9, 7)); db[rows_b, cols_b] = data_b
    g = jax.grad(lambda a, b: jnp.sum(f(a, b)), argnums=(0, 1))(
        jnp.asarray(data_a), jnp.asarray(data_b)
    )
    expect_a = (np.ones((8, 7)) @ db.T)[rows_a, cols_a]
    expect_b = (da.T @ np.ones((8, 7)))[rows_b, cols_b]
    np.testing.assert_allclose(np.asarray(g[0]), expect_a, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g[1]), expect_b, rtol=1e-10, atol=1e-12)


def test_sparse_attention_grads():
    from sparse_tpu.nn import sparse_attention

    rng = np.random.default_rng(10)
    L, D = 12, 4
    q = rng.standard_normal((L, D)) * 0.3
    # banded pattern as an explicit COO mask
    rows, cols = np.nonzero(np.abs(np.subtract.outer(np.arange(L), np.arange(L))) <= 2)

    f = lambda qq, kk, vv: sparse_attention(qq, kk, vv, jnp.asarray(rows), jnp.asarray(cols))
    check_grads(
        f,
        (jnp.asarray(q), jnp.asarray(q * 0.5), jnp.asarray(q + 0.1)),
        order=1,
        modes=["rev"],
        rtol=1e-4,
    )


def test_banded_attention_grads():
    from sparse_tpu.nn import banded_attention

    rng = np.random.default_rng(11)
    L, D = 16, 4
    q = rng.standard_normal((L, D)) * 0.3

    f = lambda qq, kk, vv: banded_attention(qq, kk, vv, window=4)
    check_grads(
        f,
        (jnp.asarray(q), jnp.asarray(q * 0.5), jnp.asarray(q + 0.1)),
        order=1,
        modes=["rev"],
        rtol=1e-4,
    )


def test_bsr_spmm_grads():
    from sparse_tpu.kernels import build_bsr, bsr_spmm_xla

    rng = np.random.default_rng(12)
    B = 8
    n = 4 * B
    mask = rng.random((4, 4)) < 0.5
    mask[0, 0] = True  # nonempty
    dense = np.kron(mask.astype(float), np.ones((B, B))) * rng.standard_normal((n, n))
    brows, bcols = np.nonzero(mask)
    blocks = np.stack([dense[r * B:(r + 1) * B, c * B:(c + 1) * B] for r, c in zip(brows, bcols)])
    x = rng.standard_normal((n, 8))

    f = lambda blk, xx: bsr_spmm_xla(
        jnp.asarray(brows.astype(np.int32)), jnp.asarray(bcols.astype(np.int32)), blk, xx,
        n_rows=n, block_shape=(B, B),
    )
    check_grads(f, (jnp.asarray(blocks), jnp.asarray(x)), order=1, modes=["rev"], rtol=1e-4)
