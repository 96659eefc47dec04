"""sparse_tpu.nn: block-sparse linear layer + graph conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu.nn import block_sparse_linear, graph_conv, init_block_sparse_linear


def test_block_sparse_linear_forward():
    key = jax.random.PRNGKey(0)
    params = init_block_sparse_linear(key, in_features=256, out_features=384, block_density=0.5)
    x = jnp.asarray(np.random.default_rng(1).random((8, 256)).astype(np.float32))
    y = block_sparse_linear(params, x, use_pallas=False)
    assert y.shape == (8, 384)
    # oracle: reconstruct dense W from the BSR pieces
    from sparse_tpu.kernels.bsr import BSR

    w = BSR(params.blocks, params.block_rows, params.block_cols, (384, 256), (128, 128)).todense()
    expected = np.asarray(x) @ w.T + np.asarray(params.bias)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-3, atol=1e-5)


def test_block_sparse_linear_grad():
    key = jax.random.PRNGKey(2)
    params = init_block_sparse_linear(key, in_features=128, out_features=128, block_density=0.5, bias=False)
    x = jnp.asarray(np.random.default_rng(3).random((4, 128)).astype(np.float32))

    def loss(blocks):
        p = params._replace(blocks=blocks)
        return block_sparse_linear(p, x, use_pallas=False).sum()

    g = jax.grad(loss)(params.blocks)
    assert g.shape == params.blocks.shape
    assert np.isfinite(np.asarray(g)).all()


def test_graph_conv_matches_dense():
    a = sparse.random((30, 30), density=0.1, random_state=0)
    x = np.random.default_rng(1).random((30, 8))
    w = np.random.default_rng(2).random((8, 4))
    rows = jnp.asarray(np.asarray(a.coords[0]))
    cols = jnp.asarray(np.asarray(a.coords[1]))
    vals = jnp.asarray(np.asarray(a.data))
    out = graph_conv(rows, cols, vals, jnp.asarray(x), jnp.asarray(w), n_nodes=30)
    np.testing.assert_allclose(np.asarray(out), a.todense() @ (x @ w), rtol=1e-10)
