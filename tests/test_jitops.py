"""Traceable ops facade: compose a full sparse pipeline under one jit,
with grad, on COO pytrees."""

import numpy as np
import pytest

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


def test_union_elemwise_under_jit():
    rng = np.random.default_rng(4)
    d1 = rng.random((12, 9)) * (rng.random((12, 9)) < 0.3)
    d2 = rng.random((12, 9)) * (rng.random((12, 9)) < 0.3)
    a, b = sparse.COO.from_numpy(d1), sparse.COO.from_numpy(d2)

    @jax.jit
    def f(a, b):
        out, nnz = jitops.union_elemwise(jnp.add, a, b)
        # chain: the padded COO feeds a pattern-preserving reduction
        return jitops.sum_dense(out, (1,)), nnz

    row_sums, nnz = f(a, b)
    np.testing.assert_allclose(np.asarray(row_sums), (d1 + d2).sum(axis=1), rtol=1e-10)
    union = np.union1d(
        np.ravel_multi_index(tuple(np.asarray(a.coords)), a.shape),
        np.ravel_multi_index(tuple(np.asarray(b.coords)), b.shape),
    )
    assert int(nnz) == union.size


def test_union_elemwise_nonzero_fill():
    d1 = np.full((5, 5), 2.0)
    d1[1, 2] = 7.0
    d2 = np.full((5, 5), 3.0)
    d2[3, 4] = 1.0
    a = sparse.COO.from_numpy(d1, fill_value=2.0)
    b = sparse.COO.from_numpy(d2, fill_value=3.0)
    out, nnz = jitops.union_elemwise(jnp.multiply, a, b)
    assert float(out.fill_value) == 6.0
    dense = np.full((5, 5), 6.0)
    coords = np.asarray(out.coords)[:, : int(nnz)]
    dense[tuple(coords)] = np.asarray(out.data)[: int(nnz)]
    np.testing.assert_allclose(dense, d1 * d2, rtol=1e-12)


def test_spgemm_under_jit():
    from sparse_tpu.kernels.spgemm import product_count

    rng = np.random.default_rng(5)
    dA = rng.random((15, 12)) * (rng.random((15, 12)) < 0.3)
    dB = rng.random((12, 10)) * (rng.random((12, 10)) < 0.3)
    A, B = sparse.COO.from_numpy(dA), sparse.COO.from_numpy(dB)
    cap = max(product_count(np.asarray(A.coords)[1], np.asarray(B.coords)[0], 12), 1)

    @jax.jit
    def f(A, B):
        C, nnz = jitops.spgemm(A, B, product_capacity=cap)
        return jitops.sum_dense(C, (1,)), nnz

    row_sums, nnz = f(A, B)
    np.testing.assert_allclose(np.asarray(row_sums), (dA @ dB).sum(axis=1), rtol=1e-10)
    assert int(nnz) <= cap


def test_transpose_traceable():
    st = sparse
    x = st.random((7, 11, 5), density=0.2, random_state=0)
    f = jax.jit(lambda s: jitops.transpose(s, (2, 0, 1)))
    out = f(x)
    ref = x.todense().transpose((2, 0, 1))
    dense = np.zeros(out.shape)
    dense[tuple(np.asarray(out.coords))] = np.asarray(out.data)
    np.testing.assert_allclose(dense, ref)
    # canonical order out of the sort
    lin = np.ravel_multi_index(tuple(np.asarray(out.coords)), out.shape)
    assert np.all(np.diff(lin) > 0)
    # default axes = reverse; identity is a no-op
    y = st.random((6, 8), density=0.3, random_state=1)
    out2 = jax.jit(jitops.transpose)(y)
    np.testing.assert_allclose(
        st.COO(np.asarray(out2.coords), np.asarray(out2.data), shape=out2.shape).todense(),
        y.todense().T,
    )
    assert jitops.transpose(y, (0, 1)) is y
    # grad flows through the value permutation
    g = jax.grad(lambda dat: jnp.sum(jitops.transpose(st.COO._make(jnp.asarray(y.coords), dat, y.shape, y.fill_value)).data ** 2))(
        jnp.asarray(y.data)
    )
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(y.data))


@pytest.mark.parametrize("comp", [(0,), (1,)])
def test_spmm_spmv_accept_gcxs_pytrees(comp):
    from sparse_tpu.core.gcxs import GCXS

    x = sparse.random((30, 40), density=0.2, random_state=4)
    g = GCXS.from_coo(x, compressed_axes=comp)
    d = x.todense()
    b = np.random.default_rng(0).standard_normal((40, 6))
    out = jax.jit(jitops.spmm)(g, b)
    np.testing.assert_allclose(np.asarray(out), d @ b, rtol=1e-9)
    v = np.random.default_rng(1).standard_normal(40)
    np.testing.assert_allclose(np.asarray(jax.jit(jitops.spmv)(g, v)), d @ v, rtol=1e-9)


def test_aot_export_roundtrip():
    # serving path: a jitted sparse pipeline serializes with jax.export and
    # runs after deserialization (AOT deployment without Python tracing)
    from jax import export

    x = sparse.random((64, 80), density=0.2, random_state=0)
    d = x.todense()
    b = jnp.asarray(np.random.default_rng(0).standard_normal((80, 4)))
    exported = export.export(jax.jit(jitops.spmm))(x, b)
    rehydrated = export.deserialize(exported.serialize())
    np.testing.assert_allclose(np.asarray(rehydrated.call(x, b)), d @ b, rtol=1e-12)

    # a solver with data-dependent control flow exports too
    from sparse_tpu import linalg

    rng = np.random.default_rng(1)
    B = rng.standard_normal((40, 40)) * (rng.random((40, 40)) < 0.3)
    dense = B @ B.T + 40 * np.eye(40)
    A = sparse.COO.from_numpy(dense)
    bb = jnp.asarray(rng.standard_normal(40))
    exp2 = export.export(jax.jit(lambda A_, b_: linalg.cg(A_, b_, tol=1e-10)[0]))(A, bb)
    out = export.deserialize(exp2.serialize()).call(A, bb)
    np.testing.assert_allclose(np.asarray(out), np.linalg.solve(dense, np.asarray(bb)), rtol=1e-6)
