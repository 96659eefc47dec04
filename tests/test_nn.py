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


def test_segment_softmax_matches_dense():
    from sparse_tpu.nn import segment_softmax

    rng = np.random.default_rng(5)
    rows = jnp.asarray(np.sort(rng.integers(0, 10, 40)).astype(np.int32))
    scores = jnp.asarray(rng.standard_normal(40).astype(np.float32))
    out = segment_softmax(scores, rows, n_rows=10)
    s = np.asarray(scores)
    r = np.asarray(rows)
    for g in range(10):
        sel = r == g
        if sel.any():
            e = np.exp(s[sel] - s[sel].max())
            np.testing.assert_allclose(np.asarray(out)[sel], e / e.sum(), rtol=1e-5)


@pytest.mark.parametrize("window,n_global", [(4, 0), (3, 2)])
def test_sparse_attention_matches_masked_dense(window, n_global):
    from sparse_tpu.nn import local_attention_pattern, sparse_attention

    rng = np.random.default_rng(6)
    L, d, dv = 48, 8, 12
    rows, cols = local_attention_pattern(L, window, n_global)
    q = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, dv)).astype(np.float32))
    out = jax.jit(sparse_attention)(q, k, v, jnp.asarray(rows), jnp.asarray(cols))
    mask = np.full((L, L), -np.inf, np.float32)
    mask[rows, cols] = 0
    scores = np.asarray(q) @ np.asarray(k).T / np.sqrt(d) + mask
    attn = np.exp(scores - scores.max(axis=1, keepdims=True))
    attn /= attn.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), attn @ np.asarray(v), atol=2e-5)


def test_sparse_attention_full_window_equals_dense():
    from sparse_tpu.nn import local_attention_pattern, sparse_attention

    rng = np.random.default_rng(7)
    L, d = 24, 6
    rows, cols = local_attention_pattern(L, L)
    q = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    out = sparse_attention(q, q, q, jnp.asarray(rows), jnp.asarray(cols))
    expected = jax.nn.softmax(np.asarray(q) @ np.asarray(q).T / np.sqrt(d), axis=-1) @ np.asarray(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_sparse_attention_grad():
    from sparse_tpu.nn import local_attention_pattern, sparse_attention

    rows, cols = local_attention_pattern(16, 3)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    g = jax.grad(lambda q: sparse_attention(q, q, q, jnp.asarray(rows), jnp.asarray(cols)).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_sparse_attention_sharded_matches_single():
    from sparse_tpu.nn import (
        local_attention_pattern,
        partition_attention_pattern,
        sparse_attention,
        sparse_attention_sharded,
    )
    from sparse_tpu.parallel import make_mesh

    rng = np.random.default_rng(9)
    L, d = 70, 8  # not divisible by the shard count
    rows, cols = local_attention_pattern(L, 5, 2)
    q = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    single = sparse_attention(q, k, v, jnp.asarray(rows), jnp.asarray(cols))
    mesh = make_mesh(8)
    lr, lc, valid, br = partition_attention_pattern(rows, cols, L, 8)
    out = sparse_attention_sharded(q, k, v, lr, lc, valid, br, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single), atol=1e-5)


@pytest.mark.parametrize("window,n_global", [(5, 0), (3, 2)])
def test_sparse_attention_ell_matches_coo(window, n_global):
    from sparse_tpu.nn import (
        build_attention_ell,
        local_attention_pattern,
        sparse_attention,
        sparse_attention_ell,
    )

    rng = np.random.default_rng(10)
    L, d, dv = 48, 8, 12
    rows, cols = local_attention_pattern(L, window, n_global)
    q = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, dv)).astype(np.float32))
    coo = sparse_attention(q, k, v, jnp.asarray(rows), jnp.asarray(cols))
    e_cols, valid = build_attention_ell(rows, cols, L)
    ell = jax.jit(sparse_attention_ell)(q, k, v, jnp.asarray(e_cols), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(ell), np.asarray(coo), atol=1e-5)


def test_sparse_attention_ell_empty_rows():
    from sparse_tpu.nn import build_attention_ell, sparse_attention_ell

    e_cols, valid = build_attention_ell(np.array([0, 2]), np.array([1, 0]), 3)
    out = sparse_attention_ell(
        jnp.ones((3, 4)), jnp.ones((3, 4)), jnp.ones((3, 2)), jnp.asarray(e_cols), jnp.asarray(valid)
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("L,window,block", [(100, 7, 16), (47, 3, 16), (64, 64, 16)])
def test_banded_attention_matches_coo(L, window, block):
    from sparse_tpu.nn import banded_attention, local_attention_pattern, sparse_attention

    rng = np.random.default_rng(11)
    rows, cols = local_attention_pattern(L, window)
    q = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, 12)).astype(np.float32))
    coo = sparse_attention(q, k, v, jnp.asarray(rows), jnp.asarray(cols))
    band = jax.jit(lambda *a: banded_attention(*a, window=window, block=block))(q, k, v)
    np.testing.assert_allclose(np.asarray(band), np.asarray(coo), atol=2e-5)


def test_banded_attention_causal():
    from sparse_tpu.nn import banded_attention

    rng = np.random.default_rng(12)
    L, w = 60, 9
    q = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, 4)).astype(np.float32))
    out = banded_attention(q, k, v, window=w, block=16, causal=True)
    # dense causal-banded oracle
    pos = np.arange(L)
    allowed = (pos[None, :] <= pos[:, None]) & (pos[:, None] - pos[None, :] <= w)
    s = np.asarray(q) @ np.asarray(k).T / np.sqrt(8)
    s[~allowed] = -np.inf
    a = np.exp(s - s.max(1, keepdims=True))
    a /= a.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), a @ np.asarray(v), atol=2e-5)


def test_banded_attention_bf16_and_multihead():
    from sparse_tpu.nn import banded_attention

    rng = np.random.default_rng(13)
    H, L, d = 3, 64, 8
    q = jnp.asarray(rng.standard_normal((H, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((H, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((H, L, d)).astype(np.float32))
    f = jax.vmap(lambda q_, k_, v_: banded_attention(q_, k_, v_, window=5, block=16))
    out = f(q, k, v)
    for h in range(H):
        single = banded_attention(q[h], k[h], v[h], window=5, block=16)
        np.testing.assert_allclose(np.asarray(out[h]), np.asarray(single), atol=1e-6)
    # bf16 path accumulates in f32 and returns bf16
    out16 = banded_attention(q[0].astype(jnp.bfloat16), k[0].astype(jnp.bfloat16),
                             v[0].astype(jnp.bfloat16), window=5, block=16)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32), np.asarray(out[0]), atol=0.05)


@pytest.mark.parametrize("causal", [False, True])
def test_banded_attention_sharded_matches_single(causal):
    from sparse_tpu.nn import banded_attention, banded_attention_sharded
    from sparse_tpu.parallel import make_mesh

    rng = np.random.default_rng(14)
    mesh = make_mesh(8)
    L, W, blk = 256, 16, 16
    q = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, 12)).astype(np.float32))
    single = banded_attention(q, k, v, window=W, block=blk, causal=causal)
    shard = banded_attention_sharded(q, k, v, window=W, mesh=mesh, block=blk, causal=causal)
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single), atol=2e-5)


def test_banded_attention_sharded_validates():
    from sparse_tpu.nn import banded_attention_sharded
    from sparse_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    q = jnp.ones((100, 4))
    with pytest.raises(ValueError, match="divide"):
        banded_attention_sharded(q, q, q, window=4, mesh=mesh)


@pytest.mark.parametrize("L,window,n_global", [(100, 7, 3), (64, 5, 0), (48, 3, 8)])
def test_longformer_attention_matches_coo(L, window, n_global):
    from sparse_tpu.nn import local_attention_pattern, longformer_attention, sparse_attention

    rng = np.random.default_rng(15)
    rows, cols = local_attention_pattern(L, window, n_global)
    q = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, 12)).astype(np.float32))
    coo = sparse_attention(q, k, v, jnp.asarray(rows), jnp.asarray(cols))
    fast = jax.jit(lambda *a: longformer_attention(*a, window=window, n_global=n_global, block=16))(q, k, v)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(coo), atol=3e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_block_sparse_attention_matches_coo(causal):
    from sparse_tpu.nn import bigbird_block_pattern, block_sparse_attention, sparse_attention

    rng = np.random.default_rng(16)
    L, blk = 64, 8
    ids, valid = bigbird_block_pattern(L, block=blk, n_window=1, n_random=2, n_global=1, seed=3)
    q = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, 12)).astype(np.float32))
    out = jax.jit(lambda *a: block_sparse_attention(*a, block=blk, causal=causal))(
        q, k, v, jnp.asarray(ids), jnp.asarray(valid)
    )
    rows_l, cols_l = [], []
    for b in range(L // blk):
        for j, ok in zip(ids[b], valid[b]):
            if not ok:
                continue
            for r in range(blk):
                for c in range(blk):
                    qq, kk = b * blk + r, j * blk + c
                    if causal and kk > qq:
                        continue
                    rows_l.append(qq)
                    cols_l.append(kk)
    order = np.lexsort((cols_l, rows_l))
    oracle = sparse_attention(
        q, k, v, jnp.asarray(np.asarray(rows_l)[order]), jnp.asarray(np.asarray(cols_l)[order])
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=3e-5)


def test_block_sparse_linear_grad_values_match_xla():
    # the custom-VJP wrapper's gradients must equal the pure-XLA autodiff
    from sparse_tpu.nn import block_sparse_linear, init_block_sparse_linear
    from sparse_tpu.kernels.bsr import bsr_spmm_xla

    key = jax.random.PRNGKey(0)
    params = init_block_sparse_linear(key, 256, 256, block_density=0.5)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 256)).astype(np.float32))

    g_wrapper = jax.grad(
        lambda blocks: block_sparse_linear(params._replace(blocks=blocks), x, use_pallas=False).sum()
    )(params.blocks)
    g_xla = jax.grad(
        lambda blocks: bsr_spmm_xla(
            params.block_rows, params.block_cols, blocks, x.T, n_rows=256
        ).T.sum()
    )(params.blocks)
    np.testing.assert_allclose(np.asarray(g_wrapper), np.asarray(g_xla), rtol=1e-6)


def test_segment_softmax_scan_path_matches_segment_ops(monkeypatch):
    # the TPU scan path (r4) must match the segment-op form exactly,
    # incl. mask handling, empty rows, and all-masked rows
    import sparse_tpu.nn as nn_mod

    rng = np.random.default_rng(41)
    n_rows = 50
    rows = np.sort(rng.integers(0, n_rows, size=5000)).astype(np.int32)
    rows[rows == 7] = 8  # leave row 7 empty
    rows = np.sort(rows)
    scores = rng.normal(size=rows.size).astype(np.float32)
    mask = rng.random(rows.size) > 0.2
    mask[rows == 9] = False  # row 9 fully masked

    ref = np.asarray(
        nn_mod.segment_softmax(jnp.asarray(scores), jnp.asarray(rows), n_rows=n_rows, mask=jnp.asarray(mask))
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(nn_mod.jax, "default_backend", lambda: "tpu")
    got = np.asarray(
        nn_mod.segment_softmax(jnp.asarray(scores), jnp.asarray(rows), n_rows=n_rows, mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    # unmasked too
    ref2 = np.asarray(nn_mod.segment_softmax(jnp.asarray(scores), jnp.asarray(rows), n_rows=n_rows))
    monkeypatch.undo()
    got2 = np.asarray(nn_mod.segment_softmax(jnp.asarray(scores), jnp.asarray(rows), n_rows=n_rows))
    np.testing.assert_allclose(got2, ref2, rtol=1e-6, atol=1e-7)
