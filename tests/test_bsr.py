"""BSR block-sparse format + kernels (XLA path and Pallas interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu.kernels.bsr import BSR, bsr_spmm_pallas, bsr_spmm_xla, build_bsr


@pytest.fixture
def problem():
    a = sparse.random((500, 600), density=0.02, random_state=0)
    rows, cols = np.asarray(a.coords)
    data = np.asarray(a.data)
    bsr = build_bsr(rows, cols, data, (500, 600))
    return a, bsr


def test_build_todense(problem):
    a, bsr = problem
    np.testing.assert_allclose(bsr.todense(), a.todense())


def test_build_sorted(problem):
    _, bsr = problem
    br = np.asarray(bsr.block_rows)
    bc = np.asarray(bsr.block_cols)
    key = br.astype(np.int64) * 1000 + bc
    assert (np.diff(key) > 0).all()


def test_every_block_row_present():
    # includes empty rows 128..255
    rows = np.array([0, 300, 301])
    cols = np.array([5, 10, 500])
    bsr = build_bsr(rows, cols, np.ones(3), (400, 600))
    assert set(np.asarray(bsr.block_rows)) == {0, 1, 2, 3}


def test_spmm_xla(problem):
    a, bsr = problem
    B = np.random.default_rng(1).random((600, 200))
    out = bsr_spmm_xla(bsr.block_rows, bsr.block_cols, bsr.blocks, jnp.asarray(B), n_rows=500)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ B, rtol=1e-10)


def test_spmm_pallas_interpret(problem):
    a, bsr = problem
    B = np.random.default_rng(1).random((600, 200))
    out = bsr_spmm_pallas(bsr.block_rows, bsr.block_cols, bsr.blocks, jnp.asarray(B), n_rows=500, interpret=True)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ B, rtol=1e-10)


def test_spmm_duplicate_entries():
    rows = np.array([0, 0, 130])
    cols = np.array([1, 1, 200])
    data = np.array([2.0, 3.0, 4.0])
    bsr = build_bsr(rows, cols, data, (256, 256))
    dense = np.zeros((256, 256))
    dense[tuple(np.array([rows, cols]))] = 0  # noqa - just shape
    ref = np.zeros((256, 256))
    np.add.at(ref, (rows, cols), data)
    B = np.eye(256)
    out = bsr_spmm_xla(bsr.block_rows, bsr.block_cols, bsr.blocks, jnp.asarray(B), n_rows=256)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_empty():
    bsr = build_bsr(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0), (128, 128))
    out = bsr_spmm_xla(bsr.block_rows, bsr.block_cols, bsr.blocks, jnp.ones((128, 8)), n_rows=128)
    np.testing.assert_allclose(np.asarray(out), np.zeros((128, 8)))


def test_spmm_pallas2_interpret(problem):
    a, _ = problem
    rows, cols = np.asarray(a.coords)
    bsr = build_bsr(rows, cols, np.asarray(a.data), (500, 600), pad_run_multiple=2)
    assert bsr.n_blocks % 2 == 0
    from sparse_tpu.kernels.bsr import bsr_spmm_pallas2

    B = np.random.default_rng(1).random((600, 200))
    out = bsr_spmm_pallas2(bsr.block_rows, bsr.block_cols, bsr.blocks, jnp.asarray(B), n_rows=500, interpret=True)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ B, rtol=1e-10)


def test_bsr_sddmm_pallas_interpret():
    from sparse_tpu.kernels.bsr import bsr_sddmm_pallas, build_bsr

    rng = np.random.default_rng(3)
    M, B, K = 256, 96, 384
    nb = (M // 128) * (K // 128)
    sel = rng.random(nb) < 0.6
    bi = (np.arange(nb) // (K // 128))[sel].astype(np.int64) * 128
    bj = (np.arange(nb) % (K // 128))[sel].astype(np.int64) * 128
    bsr = build_bsr(bi, bj, np.ones(bi.size, np.float32), (M, K))
    lhs = rng.standard_normal((M, B)).astype(np.float32)
    rhs = rng.standard_normal((B, K)).astype(np.float32)
    out = np.asarray(
        bsr_sddmm_pallas(bsr.block_rows, bsr.block_cols, jnp.asarray(lhs), jnp.asarray(rhs), interpret=True)
    )
    full = lhs @ rhs
    br, bc = np.asarray(bsr.block_rows), np.asarray(bsr.block_cols)
    for i in range(br.size):
        np.testing.assert_allclose(
            out[i], full[br[i] * 128 : (br[i] + 1) * 128, bc[i] * 128 : (bc[i] + 1) * 128], atol=1e-4
        )


def test_bsr_spmm_trainable_grads_match_autodiff():
    from sparse_tpu.nn import block_sparse_linear, init_block_sparse_linear
    from sparse_tpu.kernels.bsr import bsr_spmm_xla

    params = init_block_sparse_linear(jax.random.PRNGKey(0), 256, 384, block_density=0.5)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((32, 256)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(2).standard_normal((384,)).astype(np.float32))

    def loss(blocks, x_):
        return (block_sparse_linear(params._replace(blocks=blocks), x_, use_pallas=False) * w).sum()

    gb, gx = jax.grad(loss, argnums=(0, 1))(params.blocks, x)

    def loss2(blocks, x_):
        out_t = bsr_spmm_xla(params.block_rows, params.block_cols, blocks, x_.T, n_rows=384)
        return ((out_t.T + params.bias[None, :]) * w).sum()

    gb2, gx2 = jax.grad(loss2, argnums=(0, 1))(params.blocks, x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-5, atol=1e-5)
