"""SciPy ecosystem interop — the reference's cross-backend tests exercise
scipy.sparse.linalg / csgraph on sparse inputs (``sparse/tests/
test_backends.py:77-209``). sparse_tpu bridges through
``to_scipy_sparse()`` / ``from_scipy_sparse()``; these tests pin the round
trips and the solver/graph workflows."""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.csgraph as csgraph
import scipy.sparse.linalg as splinalg

import sparse_tpu as sparse
from sparse_tpu import COO, CSC, CSR


@pytest.fixture
def spd_matrix():
    rng = np.random.default_rng(0)
    n = 30
    a = scipy.sparse.random(n, n, density=0.2, random_state=0)
    a = a @ a.T + 10 * scipy.sparse.eye(n)
    return a.tocsr()


def test_spsolve(spd_matrix):
    s = CSR.from_scipy_sparse(spd_matrix)
    b = np.arange(s.shape[0], dtype=np.float64)
    x = splinalg.spsolve(s.to_scipy_sparse().tocsr(), b)
    np.testing.assert_allclose(spd_matrix @ x, b, rtol=1e-6, atol=1e-8)


def test_inv(spd_matrix):
    s = CSC.from_scipy_sparse(spd_matrix.tocsc())
    inv = splinalg.inv(s.to_scipy_sparse().tocsc())
    np.testing.assert_allclose((inv @ spd_matrix).toarray(), np.eye(s.shape[0]), atol=1e-8)


def test_eigsh(spd_matrix):
    s = CSR.from_scipy_sparse(spd_matrix)
    vals = splinalg.eigsh(s.to_scipy_sparse(), k=3, return_eigenvectors=False)
    dense_vals = np.linalg.eigvalsh(spd_matrix.toarray())
    np.testing.assert_allclose(np.sort(vals), np.sort(dense_vals)[-3:], rtol=1e-6)


@pytest.fixture
def graph():
    g = scipy.sparse.random(40, 40, density=0.1, random_state=1, data_rvs=lambda k: np.ones(k))
    g = ((g + g.T) > 0).astype(np.float64)
    g.setdiag(0)
    g.eliminate_zeros()
    return COO.from_scipy_sparse(g.tocoo())


def test_connected_components(graph):
    n, labels = csgraph.connected_components(graph.to_scipy_sparse().tocsr())
    assert labels.shape == (40,)
    assert n >= 1


def test_laplacian(graph):
    lap = csgraph.laplacian(graph.to_scipy_sparse().tocsr())
    assert np.allclose(np.asarray(lap.sum(axis=1)).ravel(), 0)


def test_shortest_path(graph):
    m = graph.to_scipy_sparse().tocsr()
    dist = csgraph.shortest_path(m, indices=0)
    dist_ref = csgraph.dijkstra(m, indices=0)
    np.testing.assert_allclose(dist, dist_ref)


def test_bfs_and_mst(graph):
    m = graph.to_scipy_sparse().tocsr()
    tree = csgraph.breadth_first_tree(m, 0, directed=False)
    assert tree.shape == m.shape
    mst = csgraph.minimum_spanning_tree(m)
    assert mst.shape == m.shape


def test_roundtrip_through_scipy_ops(graph):
    m = graph.to_scipy_sparse().tocsr()
    back = COO.from_scipy_sparse((m + m.T).tocoo())
    np.testing.assert_allclose(back.todense(), graph.todense() + graph.todense().T)


def test_matvec_against_scipy(graph):
    x = np.random.default_rng(2).random(40)
    np.testing.assert_allclose(graph @ x, graph.to_scipy_sparse() @ x)
