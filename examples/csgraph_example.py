"""Graph-algorithm workloads on sparse adjacency matrices — the
scipy.sparse.csgraph workflows the reference exercises through host
dispatch (reference ``sparse/tests/test_backends.py:77-209``), here run by
the device-native ``sparse_tpu.csgraph`` implementations and checked
against scipy oracles."""

import numpy as np
import scipy.sparse
import scipy.sparse.csgraph as sp_csgraph

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import jax

import sparse_tpu as sparse
from sparse_tpu import csgraph

N_NODES = 300 if CI_MODE else 3000
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    g = scipy.sparse.random(
        N_NODES, N_NODES, density=8.0 / N_NODES, random_state=0,
        data_rvs=lambda k: rng.random(k) + 0.05,
    )
    g.setdiag(0)
    g.eliminate_zeros()
    A = sparse.COO.from_scipy_sparse(g.tocoo())
    sources = np.arange(8)

    # multi-source shortest paths: whole Bellman-Ford relaxation in one
    # lax.while_loop (a segment-min min-plus SpMV per round)
    dist = csgraph.dijkstra(A, indices=sources)
    ref = sp_csgraph.dijkstra(g.tocsr(), indices=sources)
    fin = np.isfinite(ref)
    np.testing.assert_allclose(np.where(fin, dist, 0.0), np.where(fin, ref, 0.0), rtol=1e-10)
    assert (np.isfinite(dist) == fin).all()

    # weak connected components by device label propagation
    n_comp, labels = csgraph.connected_components(A)
    ref_n, ref_labels = sp_csgraph.connected_components(g.tocsr(), connection="weak")
    assert n_comp == ref_n and (labels == ref_labels).all()

    # Boruvka minimum spanning forest
    und = g.maximum(g.T)
    tree = csgraph.minimum_spanning_tree(sparse.COO.from_scipy_sparse(und.tocoo()))
    ref_tree = sp_csgraph.minimum_spanning_tree(und.tocsr())
    assert tree.nnz == ref_tree.nnz
    np.testing.assert_allclose(tree.data.sum(), ref_tree.data.sum(), rtol=1e-12)

    print(f"csgraph oracles OK (n={N_NODES}, {n_comp} components, mst nnz={tree.nnz})")

    if not CI_MODE:
        from sparse_tpu.csgraph import _bellman_ford_device, _device_float, _device_int

        rows = np.asarray(A.coords[0])
        cols = np.asarray(A.coords[1])
        w = np.asarray(A.data, dtype=_device_float())
        k = sources.size
        d0 = np.full((k, N_NODES), np.inf, dtype=_device_float())
        d0[np.arange(k), sources] = 0.0
        import jax.numpy as jnp

        args = (
            jnp.asarray(rows, dtype=_device_int()),
            jnp.asarray(cols, dtype=_device_int()),
            jnp.asarray(w),
            jnp.asarray(d0),
        )
        fn = jax.jit(
            lambda r, c, ww, dd: _bellman_ford_device(r, c, ww, dd, n=N_NODES, maxiter=N_NODES + 1)[0]
        )
        benchmark(fn, args, f"multi-source Bellman-Ford ({k} sources, n={N_NODES})", ITERS)


if __name__ == "__main__":
    main()
