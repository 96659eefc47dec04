"""TPU-native csgraph vs the scipy.sparse.csgraph oracle.

The reference's ecosystem tests run these exact workloads through host
scipy (``sparse/tests/test_backends.py:77-209``); here the device
implementations (`sparse_tpu.csgraph`) are checked against scipy on the
same graphs."""

import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.csgraph as sp_csgraph

import sparse_tpu as sparse
from sparse_tpu import COO, csgraph


def random_graph(n=40, density=0.1, seed=1, weighted=True, directed=True):
    rng = np.random.default_rng(seed)
    g = sps.random(n, n, density=density, random_state=seed, data_rvs=lambda k: rng.random(k) + 0.1)
    g.setdiag(0)
    g.eliminate_zeros()
    if not weighted:
        g.data[:] = 1.0
    if not directed:
        g = g.maximum(g.T)
    return g.tocoo()


def as_coo(g):
    return COO.from_scipy_sparse(g)


# ---------------------------------------------------------------------------
# shortest paths
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("method", ["BF", "D", "FW"])
def test_shortest_path_all_pairs(method, directed):
    g = random_graph(seed=3, directed=directed)
    ref = sp_csgraph.shortest_path(g.tocsr(), directed=directed)
    got = csgraph.shortest_path(as_coo(g), method=method, directed=directed)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_shortest_path_indices():
    g = random_graph(seed=4)
    src = np.array([0, 7, 13])
    ref = sp_csgraph.dijkstra(g.tocsr(), indices=src)
    got = csgraph.dijkstra(as_coo(g), indices=src)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_shortest_path_scalar_source_squeezes():
    g = random_graph(seed=5)
    ref = sp_csgraph.dijkstra(g.tocsr(), indices=2)
    got = csgraph.dijkstra(as_coo(g), indices=2)
    assert got.shape == ref.shape == (g.shape[0],)
    np.testing.assert_allclose(got, ref)


def test_unweighted_distances():
    g = random_graph(seed=6, weighted=True)
    ref = sp_csgraph.shortest_path(g.tocsr(), unweighted=True)
    got = csgraph.bellman_ford(as_coo(g), unweighted=True)
    np.testing.assert_allclose(got, ref)


def test_predecessors_reconstruct_paths():
    g = random_graph(seed=7)
    dist, pred = csgraph.dijkstra(as_coo(g), return_predecessors=True)
    ref = sp_csgraph.dijkstra(g.tocsr())
    n = g.shape[0]
    gd = g.toarray()
    gd[gd == 0] = np.inf
    for s in range(0, n, 7):
        for t in range(n):
            if s == t or not np.isfinite(dist[s, t]):
                assert pred[s, t] == -9999
                continue
            # walk back via predecessors, summing edge weights
            total, cur, hops = 0.0, t, 0
            while cur != s:
                p = pred[s, cur]
                assert p >= 0
                total += gd[p, cur]
                cur = p
                hops += 1
                assert hops <= n
            np.testing.assert_allclose(total, ref[s, t], rtol=1e-12)


def test_negative_weights_bellman_ford():
    row = np.array([0, 1, 2, 0])
    col = np.array([1, 2, 3, 2])
    w = np.array([2.0, -1.0, 1.0, 5.0])
    g = sps.coo_matrix((w, (row, col)), shape=(4, 4))
    ref = sp_csgraph.bellman_ford(g.tocsr(), indices=0)
    got = csgraph.bellman_ford(as_coo(g), indices=0)
    np.testing.assert_allclose(got, ref)


@pytest.mark.parametrize("directed", [True, False])
def test_johnson_matches_scipy(directed):
    g = random_graph(seed=60, directed=directed)
    ref = sp_csgraph.johnson(g.tocsr(), directed=directed)
    got = csgraph.johnson(as_coo(g), directed=directed)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_johnson_negative_weights():
    row = np.array([0, 0, 1, 2, 3])
    col = np.array([1, 2, 3, 3, 4])
    w = np.array([3.0, -2.0, 1.0, 4.0, -1.0])
    g = sps.coo_matrix((w, (row, col)), shape=(5, 5))
    ref = sp_csgraph.johnson(g.tocsr())
    got = csgraph.johnson(as_coo(g))
    fin = np.isfinite(ref)
    np.testing.assert_allclose(np.where(fin, got, 0), np.where(fin, ref, 0), rtol=1e-12)
    assert (np.isfinite(got) == fin).all()
    # sources subset
    got_s = csgraph.johnson(as_coo(g), indices=[0, 2])
    np.testing.assert_allclose(got_s, sp_csgraph.johnson(g.tocsr(), indices=np.array([0, 2])))


def test_johnson_negative_cycle_raises():
    row = np.array([0, 1, 2])
    col = np.array([1, 2, 0])
    w = np.array([1.0, -3.0, 1.0])
    g = as_coo(sps.coo_matrix((w, (row, col)), shape=(3, 3)))
    with pytest.raises(csgraph.NegativeCycleError):
        csgraph.johnson(g)


def test_negative_cycle_raises():
    row = np.array([0, 1, 2])
    col = np.array([1, 2, 0])
    w = np.array([1.0, -3.0, 1.0])
    g = as_coo(sps.coo_matrix((w, (row, col)), shape=(3, 3)))
    with pytest.raises(csgraph.NegativeCycleError):
        csgraph.bellman_ford(g, indices=0)
    with pytest.raises(csgraph.NegativeCycleError):
        csgraph.floyd_warshall(g)


def test_dijkstra_rejects_negative():
    g = as_coo(sps.coo_matrix((np.array([-1.0]), (np.array([0]), np.array([1]))), shape=(2, 2)))
    with pytest.raises(ValueError, match="non-negative"):
        csgraph.dijkstra(g)


def test_dijkstra_limit():
    g = random_graph(seed=8)
    ref = sp_csgraph.dijkstra(g.tocsr(), indices=0, limit=0.5)
    got = csgraph.dijkstra(as_coo(g), indices=0, limit=0.5)
    np.testing.assert_allclose(got, ref)


def test_floyd_warshall_predecessors():
    g = random_graph(seed=9, n=25)
    ref_d, ref_p = sp_csgraph.floyd_warshall(g.tocsr(), return_predecessors=True)
    got_d, got_p = csgraph.floyd_warshall(as_coo(g), return_predecessors=True)
    np.testing.assert_allclose(got_d, ref_d)
    # predecessor matrices may differ on ties; verify validity instead
    n = g.shape[0]
    gd = g.toarray()
    gd[gd == 0] = np.inf
    for s in range(n):
        for t in range(n):
            if s == t or not np.isfinite(got_d[s, t]):
                assert got_p[s, t] == -9999
            else:
                p = got_p[s, t]
                assert p >= 0
                np.testing.assert_allclose(got_d[s, p] + gd[p, t], got_d[s, t], rtol=1e-12)


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("directed", [True, False])
def test_breadth_first_order_levels(directed):
    g = random_graph(seed=10, weighted=False, directed=directed)
    ref_nodes, ref_pred = sp_csgraph.breadth_first_order(
        g.tocsr(), i_start=0, directed=directed, return_predecessors=True
    )
    nodes, pred = csgraph.breadth_first_order(as_coo(g), 0, directed=directed)
    assert set(nodes.tolist()) == set(ref_nodes.tolist())
    # levels must match even though intra-level order may differ
    ref_levels = sp_csgraph.shortest_path(g.tocsr(), directed=directed, unweighted=True, indices=0)
    lv = {int(v): ref_levels[int(v)] for v in nodes}
    seq = [lv[int(v)] for v in nodes]
    assert seq == sorted(seq)
    for v in nodes[1:]:
        p = pred[int(v)]
        assert p >= 0 and ref_levels[p] + 1 == ref_levels[int(v)]


def test_breadth_first_tree():
    g = random_graph(seed=11, weighted=True, directed=False)
    tree = csgraph.breadth_first_tree(as_coo(g), 0, directed=False)
    ref_levels = sp_csgraph.shortest_path(g.tocsr(), directed=False, unweighted=True, indices=0)
    reachable = np.isfinite(ref_levels).sum()
    assert tree.nnz == reachable - 1
    tu, tv = np.asarray(tree.coords[0]), np.asarray(tree.coords[1])
    gd = g.toarray()
    for a, b, w in zip(tu, tv, np.asarray(tree.data)):
        assert ref_levels[a] + 1 == ref_levels[b]
        np.testing.assert_allclose(w, gd[a, b])


# ---------------------------------------------------------------------------
# DFS / RCM / matching
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("directed", [True, False])
def test_depth_first_order_matches_scipy(directed):
    g = random_graph(seed=30, weighted=False, directed=directed)
    ref_nodes, ref_pred = sp_csgraph.depth_first_order(
        g.tocsr(), i_start=0, directed=directed, return_predecessors=True
    )
    nodes, pred = csgraph.depth_first_order(as_coo(g), 0, directed=directed)
    np.testing.assert_array_equal(nodes, ref_nodes)
    np.testing.assert_array_equal(pred, ref_pred)


def test_depth_first_tree():
    g = random_graph(seed=31, weighted=True, directed=False)
    ref = sp_csgraph.depth_first_tree(g.tocsr(), 0, directed=False)
    got = csgraph.depth_first_tree(as_coo(g), 0, directed=False)
    assert got.nnz == ref.nnz
    np.testing.assert_allclose(got.todense(), ref.toarray())


def test_reverse_cuthill_mckee_reduces_bandwidth():
    g = random_graph(seed=32, n=120, density=0.03, directed=False)
    perm = csgraph.reverse_cuthill_mckee(as_coo(g))
    assert sorted(perm.tolist()) == list(range(120))

    def bandwidth(mat):
        coo = mat.tocoo()
        return int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0

    permuted = g.tocsr()[perm][:, perm]
    ref_perm = sp_csgraph.reverse_cuthill_mckee(g.tocsr().astype(np.float64))
    ref_permuted = g.tocsr()[ref_perm][:, ref_perm]
    # orderings may differ on ties; ours must be in scipy's ballpark
    assert bandwidth(permuted) <= max(int(1.3 * bandwidth(ref_permuted)) + 5, 20)
    assert bandwidth(permuted) < bandwidth(g)


@pytest.mark.parametrize("shape", [(30, 40), (40, 30), (25, 25)])
def test_maximum_bipartite_matching(shape):
    g = sps.random(*shape, density=0.1, random_state=7, data_rvs=lambda k: np.ones(k))
    ref_row = sp_csgraph.maximum_bipartite_matching(g.tocsr(), perm_type="row")
    ref_col = sp_csgraph.maximum_bipartite_matching(g.tocsr(), perm_type="column")
    got_row = csgraph.maximum_bipartite_matching(COO.from_scipy_sparse(g.tocoo()), perm_type="row")
    got_col = csgraph.maximum_bipartite_matching(COO.from_scipy_sparse(g.tocoo()), perm_type="column")
    assert got_row.shape == ref_row.shape and got_col.shape == ref_col.shape
    # matchings are not unique: compare cardinality and validity
    assert (got_row >= 0).sum() == (ref_row >= 0).sum()
    dense = g.toarray() != 0
    for c, r in enumerate(got_row):
        if r >= 0:
            assert dense[r, c] and got_col[r] == c


def test_structural_rank():
    g = sps.random(50, 50, density=0.05, random_state=8)
    assert csgraph.structural_rank(COO.from_scipy_sparse(g.tocoo())) == sp_csgraph.structural_rank(
        g.tocsr()
    )


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_connected_components_weak_matches_scipy():
    g = random_graph(seed=12, n=60, density=0.02)
    ref_n, ref_labels = sp_csgraph.connected_components(g.tocsr(), directed=True, connection="weak")
    got_n, got_labels = csgraph.connected_components(as_coo(g), directed=True, connection="weak")
    assert got_n == ref_n
    np.testing.assert_array_equal(got_labels, ref_labels)


def test_connected_components_undirected():
    g = random_graph(seed=13, n=50, density=0.03, directed=False)
    ref_n, ref_labels = sp_csgraph.connected_components(g.tocsr(), directed=False)
    got_n, got_labels = csgraph.connected_components(as_coo(g), directed=False)
    assert got_n == ref_n
    np.testing.assert_array_equal(got_labels, ref_labels)


def test_connected_components_strong():
    g = random_graph(seed=14, n=30, density=0.06)
    ref_n, ref_labels = sp_csgraph.connected_components(g.tocsr(), connection="strong")
    got_n, got_labels = csgraph.connected_components(as_coo(g), connection="strong")
    assert got_n == ref_n
    # label values may differ (scipy uses Tarjan ordering); partition must match
    for c in range(got_n):
        members = got_labels == c
        assert len(set(ref_labels[members].tolist())) == 1


def test_connected_components_empty_graph():
    g = COO(np.zeros((2, 0), dtype=np.int64), np.zeros(0), shape=(5, 5))
    n, labels = csgraph.connected_components(g)
    assert n == 5
    np.testing.assert_array_equal(labels, np.arange(5))


def test_pagerank_matches_networkx_formula():
    # oracle: dense damped power iteration to convergence
    g = random_graph(seed=40, n=50, density=0.08)
    A = as_coo(g)
    scores, iters = csgraph.pagerank(A, alpha=0.85, tol=1e-14)
    n = g.shape[0]
    W = g.toarray()
    out = W.sum(1)
    dangling = out == 0
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    p = np.full(n, 1.0 / n)
    for _ in range(1000):
        new = 0.85 * (P.T @ p + p[dangling].sum() / n) + 0.15 / n
        if np.abs(new - p).sum() < 1e-15:
            p = new
            break
        p = new
    np.testing.assert_allclose(scores, p, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(scores.sum(), 1.0, rtol=1e-10)


def test_pagerank_personalized():
    g = random_graph(seed=41, n=30, density=0.1)
    pers = np.zeros(30)
    pers[:3] = 1.0
    scores, _ = csgraph.pagerank(as_coo(g), personalize=pers, tol=1e-13)
    base, _ = csgraph.pagerank(as_coo(g), tol=1e-13)
    assert scores[:3].sum() > base[:3].sum()  # teleport mass concentrates
    np.testing.assert_allclose(scores.sum(), 1.0, rtol=1e-9)


# ---------------------------------------------------------------------------
# laplacian
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("normed", [False, True])
def test_laplacian(normed):
    g = random_graph(seed=15, directed=False)
    ref = sp_csgraph.laplacian(g.tocsr(), normed=normed).toarray()
    got = csgraph.laplacian(as_coo(g), normed=normed)
    assert isinstance(got, COO)
    np.testing.assert_allclose(got.todense(), ref, rtol=1e-12, atol=1e-12)


def test_laplacian_return_diag():
    g = random_graph(seed=16, directed=False)
    ref, ref_d = sp_csgraph.laplacian(g.tocsr(), return_diag=True)
    got, got_d = csgraph.laplacian(as_coo(g), return_diag=True)
    np.testing.assert_allclose(got.todense(), ref.toarray())
    np.testing.assert_allclose(got_d, ref_d)


# ---------------------------------------------------------------------------
# minimum spanning tree
# ---------------------------------------------------------------------------


def test_minimum_spanning_tree_matches_scipy():
    # distinct weights -> the MST is unique, so exact comparison is valid
    rng = np.random.default_rng(17)
    n = 50
    g = sps.random(n, n, density=0.15, random_state=17)
    g.data = rng.permutation(g.data.size).astype(np.float64) + 1.0
    g = g.maximum(g.T).tocoo()
    ref = sp_csgraph.minimum_spanning_tree(g.tocsr())
    got = csgraph.minimum_spanning_tree(as_coo(g))
    assert got.nnz == ref.nnz
    np.testing.assert_allclose(got.data.sum(), ref.data.sum())
    # symmetrized adjacency of the two trees must be identical
    ref_sym = (ref + ref.T).toarray()
    got_d = got.todense()
    np.testing.assert_allclose(got_d + got_d.T, ref_sym)


def test_minimum_spanning_forest_disconnected():
    # two disjoint cliques -> forest with (n1-1)+(n2-1) edges
    b1 = np.ones((4, 4)) - np.eye(4)
    b2 = np.ones((3, 3)) - np.eye(3)
    dense = np.zeros((7, 7))
    dense[:4, :4] = b1
    dense[4:, 4:] = b2
    ref = sp_csgraph.minimum_spanning_tree(sps.csr_matrix(dense))
    got = csgraph.minimum_spanning_tree(COO.from_numpy(dense))
    assert got.nnz == ref.nnz == 5
    np.testing.assert_allclose(got.data.sum(), ref.data.sum())


def test_yen_k_shortest_paths():
    rng = np.random.default_rng(72)
    for i in range(8):
        n = int(rng.integers(6, 35))
        g = sps.random(n, n, density=0.25, random_state=int(rng.integers(1 << 30)))
        g.setdiag(0)
        g.eliminate_zeros()
        if g.nnz == 0:
            continue
        g.data = rng.random(g.nnz) + 0.1
        K = int(rng.integers(1, 5))
        got = csgraph.yen(as_coo(g), 0, n - 1, K)
        ref = sp_csgraph.yen(g.tocsr(), 0, n - 1, K)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-10)
    # disconnected pair -> empty
    empty = csgraph.yen(COO.from_numpy(np.diag([0.0, 0.0, 0.0])), 0, 2, 3)
    assert empty.shape == (0,)
    with pytest.raises(ValueError, match="non-negative"):
        csgraph.yen(
            COO.from_numpy(np.array([[0.0, -1.0], [0.0, 0.0]])), 0, 1, 2
        )


def test_maximum_flow_matches_scipy():
    rng = np.random.default_rng(70)
    n = 30
    g = sps.random(n, n, density=0.15, random_state=70)
    g.setdiag(0)
    g.eliminate_zeros()
    g.data = np.ceil(rng.random(g.nnz) * 10)
    ref = sp_csgraph.maximum_flow(g.tocsr().astype(np.int32), 0, n - 1)
    got = csgraph.maximum_flow(COO.from_scipy_sparse(g.tocoo()), 0, n - 1)
    assert got.flow_value == ref.flow_value
    # validity: capacity constraints + conservation
    F = got.flow.todense()
    C = g.toarray()
    assert (F <= C + 1e-9).all()
    np.testing.assert_allclose(F, -F.T, atol=1e-9)
    net = F.sum(axis=1)
    np.testing.assert_allclose(net[1 : n - 1], 0, atol=1e-9)
    assert net[0] == got.flow_value and net[n - 1] == -got.flow_value


def test_maximum_flow_validation():
    g = COO.from_numpy(np.array([[0.0, 1.5], [0.0, 0.0]]))
    with pytest.raises(ValueError, match="integer"):
        csgraph.maximum_flow(g, 0, 1)
    g2 = COO.from_numpy(np.array([[0.0, 1.0], [0.0, 0.0]]))
    with pytest.raises(ValueError, match="differ"):
        csgraph.maximum_flow(g2, 0, 0)


def test_min_weight_full_bipartite_matching():
    rng = np.random.default_rng(71)
    dense = rng.random((12, 15)) + 0.1
    mask = rng.random((12, 15)) < 0.5
    dense = np.where(mask, dense, 0.0)
    # ensure feasibility: add a diagonal
    dense[np.arange(12), np.arange(12)] = rng.random(12) + 0.1
    S = sps.csr_matrix(dense)
    ref_r, ref_c = sp_csgraph.min_weight_full_bipartite_matching(S)
    got_r, got_c = csgraph.min_weight_full_bipartite_matching(COO.from_numpy(dense))
    np.testing.assert_allclose(
        dense[got_r, got_c].sum(), S[ref_r, ref_c].sum(), rtol=1e-12
    )
    assert len(set(got_c.tolist())) == 12  # a full matching
    # maximized variant picks a heavier matching
    gr, gc = csgraph.min_weight_full_bipartite_matching(COO.from_numpy(dense), maximized=True)
    assert dense[gr, gc].sum() >= dense[got_r, got_c].sum()


def test_min_weight_matching_negative_weights():
    # regression: the absent-edge sentinel was too small with negative
    # weights, so LSA preferred a sentinel entry over a real full matching
    # and the function falsely raised
    d = np.zeros((3, 3))
    d[0, 0] = 10.0
    d[0, 1] = -10.0
    d[1, 1] = 10.0
    d[1, 2] = -10.0
    d[2, 2] = 10.0
    S = sps.csr_matrix(d)
    rref, cref = sp_csgraph.min_weight_full_bipartite_matching(S)
    rg, cg = csgraph.min_weight_full_bipartite_matching(COO.from_numpy(d))
    np.testing.assert_allclose(d[rg, cg].sum(), np.asarray(S[rref, cref]).sum())


# ---------------------------------------------------------------------------
# partitioned (mesh-sharded) relaxation
# ---------------------------------------------------------------------------


def test_bellman_ford_partitioned_matches_single_device():
    from sparse_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    g = random_graph(seed=21, n=80, density=0.05)
    A = as_coo(g)
    src = np.array([0, 3, 9])
    ref = csgraph.bellman_ford(A, indices=src)
    got = csgraph.bellman_ford_partitioned(A, mesh, indices=src)
    np.testing.assert_array_equal(got, ref)
    # predecessors + scalar-source squeeze
    d1, p1 = csgraph.bellman_ford_partitioned(A, mesh, indices=2, return_predecessors=True)
    d2, p2 = csgraph.bellman_ford(A, indices=2, return_predecessors=True)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(p1, p2)


def test_pagerank_partitioned_matches_single_device():
    from sparse_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    g = random_graph(seed=73, n=90, density=0.05)
    A = as_coo(g)
    ref, _ = csgraph.pagerank(A, tol=1e-13)
    got, _ = csgraph.pagerank_partitioned(A, mesh, tol=1e-13)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-14)
    # personalization path
    pers = np.zeros(90)
    pers[:4] = 1.0
    r2, _ = csgraph.pagerank(A, personalize=pers, tol=1e-12)
    g2, _ = csgraph.pagerank_partitioned(A, mesh, personalize=pers, tol=1e-12)
    np.testing.assert_allclose(g2, r2, rtol=1e-9, atol=1e-13)


def test_bellman_ford_partitioned_negative_cycle():
    from sparse_tpu.parallel import make_mesh

    import scipy.sparse as sps2

    mesh = make_mesh(8)
    row = np.array([0, 1, 2])
    col = np.array([1, 2, 0])
    w = np.array([1.0, -3.0, 1.0])
    g = as_coo(sps2.coo_matrix((w, (row, col)), shape=(3, 3)))
    with pytest.raises(csgraph.NegativeCycleError):
        csgraph.bellman_ford_partitioned(g, mesh, indices=0)


# ---------------------------------------------------------------------------
# input formats
# ---------------------------------------------------------------------------


def test_accepts_gcxs_scipy_and_dense():
    g = random_graph(seed=18)
    ref = sp_csgraph.shortest_path(g.tocsr(), indices=0)
    for inp in (sparse.CSR.from_scipy_sparse(g.tocsr()), g.tocsr(), g.toarray()):
        got = csgraph.shortest_path(inp, method="BF", indices=0)
        np.testing.assert_allclose(got, ref)


def test_rejects_nonzero_fill():
    g = sparse.full((3, 3), 2.5)
    with pytest.raises(ValueError, match="zero fill"):
        csgraph.shortest_path(g, method="BF", indices=0)


def test_rejects_nonsquare():
    g = sparse.random((3, 4), density=0.5)
    with pytest.raises(ValueError, match="square"):
        csgraph.connected_components(g)
    # scipy-sparse inputs validate too (regression: that branch skipped it)
    import scipy.sparse as sps3

    with pytest.raises(ValueError, match="square"):
        csgraph.bellman_ford(sps3.random(5, 3, density=0.5, random_state=0), indices=0)


def test_out_of_range_sources_raise():
    g = random_graph(seed=50, n=5, density=0.5)
    A = as_coo(g)
    with pytest.raises(ValueError, match="out of range"):
        csgraph.bellman_ford(A, indices=7)
    with pytest.raises(ValueError, match="out of range"):
        csgraph.dijkstra(A, indices=[0, 5])
    with pytest.raises(ValueError, match="out of range"):
        csgraph.breadth_first_order(A, 9)
    # negatives wrap once, numpy-style
    ref = csgraph.bellman_ford(A, indices=4)
    got = csgraph.bellman_ford(A, indices=-1)
    np.testing.assert_array_equal(got, ref)


def test_breadth_first_tree_negative_start():
    g = random_graph(seed=51, n=20, density=0.2, directed=False)
    t1 = csgraph.breadth_first_tree(as_coo(g), -1, directed=False)
    t2 = csgraph.breadth_first_tree(as_coo(g), 19, directed=False)
    np.testing.assert_allclose(t1.todense(), t2.todense())


def test_laplacian_normed_return_diag_matches_scipy():
    # regression: returned a 0/1 indicator instead of scipy's sqrt-degree vector
    g = random_graph(seed=52, directed=False)
    ref, ref_d = sp_csgraph.laplacian(g.tocsr(), normed=True, return_diag=True)
    got, got_d = csgraph.laplacian(as_coo(g), normed=True, return_diag=True)
    np.testing.assert_allclose(got.todense(), ref.toarray(), atol=1e-12)
    np.testing.assert_allclose(got_d, ref_d)


# ---------------------------------------------------------------------------
# construction / representation helpers
# ---------------------------------------------------------------------------


def test_csgraph_from_dense_matches_scipy():
    rng = np.random.default_rng(60)
    a = rng.random((12, 12))
    a[a < 0.6] = 0.0
    a[0, 3] = np.nan
    a[1, 4] = np.inf
    ref = sp_csgraph.csgraph_from_dense(a, null_value=0)
    got = csgraph.csgraph_from_dense(a, null_value=0)
    np.testing.assert_allclose(got.todense(), ref.toarray())


def test_csgraph_from_dense_nonzero_null_keeps_explicit_zeros():
    a = np.full((4, 4), -1.0)
    a[0, 1] = 0.0
    a[2, 3] = 5.0
    ref = sp_csgraph.csgraph_from_dense(a, null_value=-1)
    got = csgraph.csgraph_from_dense(a, null_value=-1)
    assert got.nnz == ref.nnz == 2
    ref_d = sp_csgraph.csgraph_to_dense(ref, null_value=-1)
    got_d = csgraph.csgraph_to_dense(got, null_value=-1)
    np.testing.assert_allclose(got_d, ref_d)


def test_csgraph_masked_roundtrip_matches_scipy():
    rng = np.random.default_rng(61)
    a = rng.random((10, 10))
    a[a < 0.5] = 0.0
    ref_m = sp_csgraph.csgraph_masked_from_dense(a)
    got_m = csgraph.csgraph_masked_from_dense(a)
    np.testing.assert_array_equal(np.ma.getmaskarray(got_m), np.ma.getmaskarray(ref_m))
    np.testing.assert_allclose(got_m.filled(0), ref_m.filled(0))
    # masked -> sparse -> masked
    got = csgraph.csgraph_from_masked(got_m)
    ref = sp_csgraph.csgraph_from_masked(ref_m)
    np.testing.assert_allclose(got.todense(), ref.toarray())
    back = csgraph.csgraph_to_masked(got)
    ref_back = sp_csgraph.csgraph_to_masked(ref)
    np.testing.assert_array_equal(np.ma.getmaskarray(back), np.ma.getmaskarray(ref_back))
    np.testing.assert_allclose(back.filled(0), ref_back.filled(0))


def test_csgraph_to_dense_null_value():
    g = random_graph(seed=62, n=15, density=0.2)
    ref = sp_csgraph.csgraph_to_dense(g.tocsr(), null_value=np.inf)
    got = csgraph.csgraph_to_dense(as_coo(g), null_value=np.inf)
    np.testing.assert_allclose(got, ref)


@pytest.mark.parametrize("directed", [True, False])
def test_reconstruct_path_matches_scipy(directed):
    g = random_graph(seed=63, n=25, density=0.15, directed=directed)
    _, pred = sp_csgraph.dijkstra(g.tocsr(), directed=directed, indices=0, return_predecessors=True)
    ref = sp_csgraph.reconstruct_path(g.tocsr(), pred, directed=directed)
    got = csgraph.reconstruct_path(as_coo(g), pred, directed=directed)
    np.testing.assert_allclose(got.todense(), ref.toarray())


@pytest.mark.parametrize("directed", [True, False])
def test_construct_dist_matrix_matches_scipy(directed):
    g = random_graph(seed=64, n=20, density=0.15, directed=directed)
    dist_ref, pred = sp_csgraph.shortest_path(
        g.tocsr(), directed=directed, return_predecessors=True
    )
    ref = sp_csgraph.construct_dist_matrix(g.toarray(), pred, directed=directed)
    got = csgraph.construct_dist_matrix(as_coo(g), pred, directed=directed)
    np.testing.assert_allclose(got, ref)
    # and the reconstruction reproduces the shortest-path distances
    np.testing.assert_allclose(got, dist_ref)


def test_construct_dist_matrix_disconnected_null_value():
    # two components: paths across get the null value
    rows = np.array([0, 1, 3])
    cols = np.array([1, 2, 4])
    w = np.array([1.0, 2.0, 3.0])
    g = sps.coo_matrix((w, (rows, cols)), shape=(5, 5))
    _, pred = sp_csgraph.shortest_path(g.tocsr(), return_predecessors=True)
    ref = sp_csgraph.construct_dist_matrix(g.toarray(), pred, null_value=-1.0)
    got = csgraph.construct_dist_matrix(as_coo(g.tocoo()), pred, null_value=-1.0)
    np.testing.assert_allclose(got, ref)


def test_bellman_ford_two_tier_hub_graph():
    # one massive hub destination forces the two-tier tail path; a second
    # mid-degree node lands in the tail too
    import scipy.sparse as sps
    import scipy.sparse.csgraph as sc

    rng = np.random.default_rng(42)
    n = 400
    rows = [rng.integers(0, n, 300)]   # 300 in-edges to the hub
    cols = [np.full(300, 7)]
    rows.append(rng.integers(0, n, 60))
    cols.append(np.full(60, 123))
    rows.append(rng.integers(0, n, 2000))  # background edges
    cols.append(rng.integers(0, n, 2000))
    r = np.concatenate(rows); c = np.concatenate(cols)
    w = rng.random(r.size) + 0.1
    from sparse_tpu.csgraph import _build_dest_ell

    ell = _build_dest_ell(r, c, w, n, np.int32, np.float32)
    assert ell is not None and ell[2] is not None and ell[3] is not None  # tail + relabel active
    G = sparse.COO(np.stack([r, c]), w, shape=(n, n))
    got = csgraph.bellman_ford(G, indices=[0, 7, 50])
    ref = sc.bellman_ford(sps.csr_matrix((w, (r, c)), shape=(n, n)), indices=[0, 7, 50])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)
    # second call reuses the memoized layout and agrees
    got2 = csgraph.bellman_ford(G, indices=[0, 7, 50])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_bellman_ford_johnson_two_tier():
    import scipy.sparse as sps
    import scipy.sparse.csgraph as sc

    rng = np.random.default_rng(43)
    n = 300
    r = np.concatenate([rng.integers(0, n, 200), rng.integers(0, n, 1500)])
    c = np.concatenate([np.full(200, 11), rng.integers(0, n, 1500)])
    w = rng.random(r.size) - 0.05  # some negative weights for johnson
    G = sparse.COO(np.stack([r, c]), w, shape=(n, n))
    S = sps.csr_matrix((w, (r, c)), shape=(n, n))
    try:
        ref = sc.johnson(S, indices=[0, 3])
    except sc.NegativeCycleError:
        with pytest.raises(csgraph.NegativeCycleError):
            csgraph.johnson(G, indices=[0, 3])
        return
    got = csgraph.johnson(G, indices=[0, 3])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-8)
