"""Traceable ops facade: compose a full sparse pipeline under one jit,
with grad, on COO pytrees."""

import numpy as np

import jax
import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu import jitops


def test_pipeline_under_jit():
    a = sparse.random((30, 20), density=0.2, random_state=0)
    b = np.random.default_rng(1).random((20, 6))

    @jax.jit
    def pipeline(a, b):
        y = jitops.spmm(a, b)                  # (30, 6) dense
        s2 = jitops.sddmm(a, y, b.T)           # back at a's pattern
        s3 = jitops.scale(s2, 2.0)
        s4 = jitops.add_same_pattern(s3, s2)   # 3 * s2
        return jitops.sum_dense(s4, (1,))      # (30,)

    out = np.asarray(pipeline(a, jnp.asarray(b)))
    ad = a.todense()
    y = ad @ b
    s2 = ad * (y @ b.T)
    expected = (3 * s2).sum(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-10)


def test_grad_through_pipeline():
    a = sparse.random((10, 8), density=0.3, random_state=2)
    b = jnp.asarray(np.random.default_rng(3).random((8, 4)))

    def loss(data):
        a2 = sparse.COO._make(a.coords, data, a.shape, a.fill_value)
        return jitops.spmm(a2, b).sum()

    g = jax.grad(loss)(jnp.asarray(np.asarray(a.data)))
    expected = np.asarray(b).sum(axis=1)[np.asarray(a.coords[1])]
    np.testing.assert_allclose(np.asarray(g), expected)


def test_mttkrp_and_spmv():
    t = sparse.random((12, 7, 5), density=0.2, random_state=4)
    c = jnp.asarray(np.random.default_rng(5).random((7, 3)))
    d = jnp.asarray(np.random.default_rng(6).random((5, 3)))
    out = jax.jit(jitops.mttkrp)(t, c, d)
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("ijk,jr,kr->ir", t.todense(), np.asarray(c), np.asarray(d)), rtol=1e-10
    )
    a = sparse.random((9, 11), density=0.4, random_state=7)
    x = jnp.asarray(np.random.default_rng(8).random(11))
    np.testing.assert_allclose(np.asarray(jax.jit(jitops.spmv)(a, x)), a.todense() @ np.asarray(x), rtol=1e-10)


def test_map_mul():
    a = sparse.random((6, 6), density=0.4, random_state=9)
    sq = jitops.map_data(a, jnp.square)
    np.testing.assert_allclose(np.asarray(sq.data), np.asarray(a.data) ** 2)
    m = jitops.mul_same_pattern(a, a)
    np.testing.assert_allclose(np.asarray(m.data), np.asarray(a.data) ** 2)
