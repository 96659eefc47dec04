"""DIA (banded) kernel: build/detect, shift matvec/matmat, solver upgrade."""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import linalg
from sparse_tpu.kernels import build_dia, dia_spmm, dia_spmv


def _banded_dense(n, offsets, rng):
    dense = np.zeros((n, n))
    for o in offsets:
        idx = np.arange(max(0, -o), min(n, n - o))
        dense[idx, idx + o] = rng.standard_normal(idx.size)
    return dense


@pytest.mark.parametrize("offsets", [(-7, -1, 0, 1, 7), (0,), (-2, 3), (-50, 0, 50)])
def test_dia_spmv_spmm_match_dense(offsets):
    rng = np.random.default_rng(0)
    n = 200
    dense = _banded_dense(n, offsets, rng)
    A = sparse.COO.from_numpy(dense)
    c = np.asarray(A.coords)
    dia = build_dia(c[0], c[1], np.asarray(A.data), n)
    assert dia is not None
    assert set(dia.offsets) <= set(offsets)

    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(dia_spmv(dia.offsets, dia.bands, x)), dense @ x, rtol=1e-12)
    X = rng.standard_normal((n, 4))
    np.testing.assert_allclose(np.asarray(dia_spmm(dia.offsets, dia.bands, X)), dense @ X, rtol=1e-12)


def test_dia_rejects_unstructured():
    B = sparse.random((100, 100), density=0.2, random_state=1)
    cb = np.asarray(B.coords)
    assert build_dia(cb[0], cb[1], np.asarray(B.data), 100) is None
    assert B.to_dia() is None


def test_dia_rejects_padding_blowup():
    # two far-apart diagonals with only a few entries each: k*n >> nnz
    n = 10_000
    rows = np.array([0, 1, 2, 5000, 5001])
    cols = np.array([0, 1, 2, 9000, 9001])
    data = np.ones(5)
    assert build_dia(rows, cols, data, n) is None


def test_to_dia_cached_and_jit():
    import jax

    rng = np.random.default_rng(2)
    dense = _banded_dense(64, (-1, 0, 1), rng)
    A = sparse.COO.from_numpy(dense)
    d1 = A.to_dia()
    d2 = A.to_dia()
    assert d1 is d2  # memoized on the instance

    f = jax.jit(lambda bands, v: dia_spmv(d1.offsets, bands, v))
    x = rng.standard_normal(64)
    np.testing.assert_allclose(np.asarray(f(d1.bands, x)), dense @ x, rtol=1e-10)


def test_cg_uses_dia_on_laplacian():
    rng = np.random.default_rng(3)
    m = 24
    lap = np.zeros((m * m, m * m))
    for i in range(m):
        for j in range(m):
            k = i * m + j
            lap[k, k] = 4
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < m and 0 <= jj < m:
                    lap[k, ii * m + jj] = -1
    L = sparse.COO.from_numpy(lap)
    assert L.to_dia() is not None
    b = rng.standard_normal(m * m)
    x, info = linalg.cg(L, b, tol=1e-10)
    assert info == 0
    np.testing.assert_allclose(lap @ np.asarray(x), b, atol=1e-6)
    # nonsymmetric-solver path (uses A and A.T) stays correct too
    x2, info2 = linalg.bicgstab(L, b, tol=1e-10)
    assert info2 == 0
    np.testing.assert_allclose(lap @ np.asarray(x2), b, atol=1e-5)


def test_gcxs_operand_gets_dia_matvec():
    rng = np.random.default_rng(5)
    dense = _banded_dense(80, (-1, 0, 1), rng)
    dense = (dense + dense.T) / 2 + 4 * np.eye(80)  # SPD for CG
    G = sparse.COO.from_numpy(dense).asformat("csr")
    b = rng.standard_normal(80)
    x, info = linalg.cg(G, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-6)
    # the DIA layout is memoized on the GCXS instance
    from sparse_tpu.linalg import _as_matvec

    mv = _as_matvec(G)
    assert G._cached("dia", (64, 8.0), lambda: None) is not None


def test_dia_spmv_sharded_matches_single_device():
    from sparse_tpu.kernels import dia_spmv_sharded
    from sparse_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    n = 64 * 8
    offsets = (-64, -1, 0, 1, 64)  # 5-pt stencil over an 8x64 grid flattening
    dense = _banded_dense(n, offsets, rng)
    A = sparse.COO.from_numpy(dense)
    dia = A.to_dia()
    assert dia is not None
    x = rng.standard_normal(n)
    mesh = make_mesh(8)
    y = dia_spmv_sharded(dia.offsets, dia.bands, x, mesh)
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-10)
    # halo wider than a segment raises
    with pytest.raises(ValueError):
        dia_spmv_sharded((-100, 0, 100), np.zeros((3, n)), x, mesh)


def test_dia_sharded_cg_partitioned_operator():
    # CG over a mesh-sharded banded operator: matvec = halo-exchange DIA
    from sparse_tpu.kernels import dia_spmv_sharded
    from sparse_tpu.parallel import make_mesh

    rng = np.random.default_rng(8)
    n = 32 * 8
    dense = _banded_dense(n, (-1, 0, 1), rng)
    dense = (dense + dense.T) / 2 + 4 * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    dia = A.to_dia()
    mesh = make_mesh(8)

    def mv(v):
        return dia_spmv_sharded(dia.offsets, dia.bands, v, mesh)

    mv.shape = (n, n)
    b = rng.standard_normal(n)
    x, info = linalg.cg(mv, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-6)


def test_solver_memo_rebuilds_on_buffer_replacement():
    # replacing A.data must not serve a stale memoized program/layout
    rng = np.random.default_rng(9)
    n = 60
    dense = _banded_dense(n, (-1, 0, 1), rng)
    dense = (dense + dense.T) / 2 + 4 * np.eye(n)
    A = sparse.COO.from_numpy(dense)
    b = rng.standard_normal(n)
    x1, info1 = linalg.cg(A, b, tol=1e-10)
    assert int(info1) == 0
    # replace the value buffer (same pattern, scaled values)
    A.data = np.asarray(A.data) * 2.0
    x2, info2 = linalg.cg(A, b, tol=1e-10)
    assert int(info2) == 0
    np.testing.assert_allclose(2 * dense @ np.asarray(x2), b, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) / 2, rtol=1e-6)
