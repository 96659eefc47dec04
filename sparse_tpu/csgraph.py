"""TPU-native graph algorithms over sparse adjacency matrices.

The reference ships no graph code of its own — its ecosystem tests push
sparse arrays through host ``scipy.sparse.csgraph``
(``sparse/tests/test_backends.py:77-209``: ``connected_components``,
``laplacian``, ``shortest_path``, BFS, Dijkstra, MST). Here the algorithms
themselves are device programs built on semiring relaxation over the edge
list (``segment_min`` of ``dist[src] + w`` per destination — the min-plus
SpMV): Bellman-Ford shortest paths, frontier BFS, label-propagation
connected components, and dense Floyd-Warshall each run their whole
iteration inside one ``lax.while_loop``/``fori_loop`` under ``jit`` with no
host round-trips. Minimum spanning tree is host-orchestrated Borůvka with
vectorized rounds (eager API, like construction).

Graph convention (scipy-compatible): stored entries are edges, fill value
must be zero; ``directed=False`` reads each stored edge both ways (min of
the two stored directions where both exist).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "NegativeCycleError",
    "bellman_ford",
    "bellman_ford_partitioned",
    "breadth_first_order",
    "breadth_first_tree",
    "connected_components",
    "construct_dist_matrix",
    "csgraph_from_dense",
    "csgraph_from_masked",
    "csgraph_masked_from_dense",
    "csgraph_to_dense",
    "csgraph_to_masked",
    "depth_first_order",
    "depth_first_tree",
    "dijkstra",
    "floyd_warshall",
    "johnson",
    "laplacian",
    "maximum_bipartite_matching",
    "maximum_flow",
    "min_weight_full_bipartite_matching",
    "minimum_spanning_tree",
    "pagerank",
    "pagerank_partitioned",
    "reconstruct_path",
    "reverse_cuthill_mckee",
    "shortest_path",
    "structural_rank",
    "yen",
]


class NegativeCycleError(Exception):
    """Raised when a negative-weight cycle is reachable in shortest-path routines."""


def _device_float():
    """f64 on the CPU backend (numpy-parity eager semantics); f32 on
    accelerators, where XLA:TPU has no native f64."""
    return jnp.float64 if jax.default_backend() == "cpu" else jnp.float32


def _device_int():
    return jnp.int64 if jax.default_backend() == "cpu" else jnp.int32


def _graph_triplet(csgraph, *, directed=True, unweighted=False, square=True):
    """Normalize any graph input to host ``(rows, cols, weights, n)``.

    Accepts sparse_tpu arrays (any format), scipy sparse, or a dense
    ndarray (scipy convention: nonzero entries are edges). With
    ``directed=False`` the edge list contains both orientations.
    """
    import scipy.sparse as sps

    from .core.base import SparseArray
    from .ops.common import asCOO

    if isinstance(csgraph, SparseArray):
        coo = asCOO(csgraph)
        if not np.asarray(coo.fill_value)[()] == 0:
            raise ValueError("csgraph routines require a zero fill value")
        rows, cols = np.asarray(coo.coords[0]), np.asarray(coo.coords[1])
        w = np.asarray(coo.data, dtype=np.float64)
        n = coo.shape[0]
        if coo.ndim != 2 or (square and coo.shape[0] != coo.shape[1]):
            raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {coo.shape}")
    elif sps.issparse(csgraph):
        c = csgraph.tocoo()
        if square and c.shape[0] != c.shape[1]:
            raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {c.shape}")
        rows, cols, w = c.row.astype(np.int64), c.col.astype(np.int64), c.data.astype(np.float64)
        n = c.shape[0]
    else:
        a = np.asarray(csgraph)
        if a.ndim != 2 or (square and a.shape[0] != a.shape[1]):
            raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {a.shape}")
        rows, cols = np.nonzero(a)
        w = a[rows, cols].astype(np.float64)
        n = a.shape[0]
    if unweighted:
        w = np.ones_like(w)
    if not directed:
        rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
        w = np.concatenate([w, w])
    return rows.astype(np.int64), cols.astype(np.int64), w, n


# ---------------------------------------------------------------------------
# min-plus relaxation core (Bellman-Ford)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "maxiter"))
def _bellman_ford_device(rows, cols, w, dist0, *, n, maxiter):
    """Fixed-point min-plus relaxation: ``dist[s, v] = min(dist[s, v],
    min_e(dist[s, rows[e]] + w[e]))`` until unchanged. Returns
    ``(dist, improved_after_convergence)`` — the flag is True iff one more
    round still improves (a reachable negative cycle)."""

    def relax(dist):
        cand = dist[:, rows] + w[None, :]  # (k, nnz)
        best = jax.ops.segment_min(cand.T, cols, num_segments=n)  # (n, k)
        return jnp.minimum(dist, best.T)

    def cond(state):
        _, changed, it = state
        return changed & (it < maxiter)

    def body(state):
        dist, _, it = state
        new = relax(dist)
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = lax.while_loop(cond, body, (dist0, jnp.bool_(True), 0))
    has_neg = jnp.any(relax(dist) < dist)
    return dist, has_neg


def _build_dest_ell(rows, cols, w, n, idt, fdt, *, width_cap=256):
    """Per-destination ELL layout for min-plus relaxation: ``src (n, L)``
    and ``w (n, L)`` with +inf padding, so ``new[v] = min_L(dist[src] + w)``
    is a dense min-reduce — no scatter (XLA scatter-min serializes on TPU;
    the ELL form measured ~40x faster on the bench graph).

    The relaxation gather is issue-rate bound on the padded SLOT count, so
    the width is clamped to the smallest useful ``L0``; overflow edges of
    the (few) high-degree destinations live in a mini-ELL whose result
    merges back as a CONTIGUOUS static-slice ``best.at[-d:].min(...)`` —
    made contiguous by relabeling nodes so the high-degree destinations
    occupy the last ``d`` ids. Anything fancier de-fuses inside
    ``lax.while_loop`` and measured 3-6x SLOWER per round on v5e (in-loop
    segment-min scatter, small-table row gather, (n,d,k) min-plus one-hot
    broadcast, and a two-tier concat all failed; the slice-min merge keeps
    the single-gather speed). 1M-edge bench graph: slots 3.0M -> 2.1M,
    12.6 -> ~7 ms/round.

    Returns ``(e_src, e_w, tail, perm)``: ``tail`` is ``None`` or the
    overflow mini-ELL ``(t_src, t_w)`` covering relabeled destinations
    ``n-d .. n-1``; ``perm`` is ``None`` (identity) or the relabeling with
    ``perm[new_id] == old_id``. Sources inside both ELLs are RELABELED ids
    when ``perm`` is not None. Returns ``None`` when the padded width would
    blow up memory (degree-skewed graphs beyond the tail's reach).
    """
    if rows.size == 0:
        return None
    counts = np.bincount(cols, minlength=n)
    L = int(counts.max())
    mean = rows.size / max(n, 1)
    # smallest width covering >=99% of edges, with a small tail tier: a
    # LARGE tail row count de-fuses the slice-min merge (measured: d=531 at
    # L0=16 keeps the 7 ms/round fused form; d=8303 at L0=12 blows up to
    # ~45 ms/round despite fewer total slots) — slot count is NOT the whole
    # cost model on v5e, fusion survival is
    L0 = L
    for cand in sorted({4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256}):
        if cand >= L:
            break
        d = int((counts > cand).sum())
        if d <= 1024 and int(np.maximum(counts - cand, 0).sum()) <= max(rows.size // 100, 64):
            L0 = cand
            break
    if L0 > max(32, 8 * mean) and L0 > width_cap:
        return None

    perm = None
    if L0 < L:
        high = counts > L0
        perm = np.concatenate([np.flatnonzero(~high), np.flatnonzero(high)])
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        rows = inv[rows]
        cols = inv[cols]
        counts = counts[perm]

    order = np.argsort(cols, kind="stable")
    cs, rs, ws = cols[order], rows[order], w[order].astype(fdt)
    within = np.arange(rows.size) - np.concatenate([[0], np.cumsum(counts)])[:-1][cs]
    main = within < L0
    e_src = np.zeros((n, L0), dtype=idt)
    e_w = np.full((n, L0), np.inf, dtype=fdt)
    e_src[cs[main], within[main]] = rs[main]
    e_w[cs[main], within[main]] = ws[main]
    tail = None
    if not main.all():
        t = ~main
        d = int(high.sum())
        Lt = int((counts[n - d :] - L0).max())
        t_src = np.zeros((d, Lt), dtype=idt)
        t_w = np.full((d, Lt), np.inf, dtype=fdt)
        t_src[cs[t] - (n - d), within[t] - L0] = rs[t]
        t_w[cs[t] - (n - d), within[t] - L0] = ws[t]
        tail = (t_src, t_w)
    return e_src, e_w, tail, perm


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _bellman_ford_device_ell(e_src, e_w, dist0, *, maxiter):
    """Fixed-point min-plus relaxation over the per-destination ELL layout
    (see :func:`_build_dest_ell`): per round one row gather of the distance
    table plus a dense min over the padded in-edge axis."""

    def relax(dist):
        distT = dist.T  # (n, k): 1 row gather per edge instead of k scalars
        g = jnp.take(distT, e_src.reshape(-1), axis=0).reshape(*e_src.shape, -1)
        cand = g + e_w[:, :, None]  # (n, L, k); padding is +inf
        best = jnp.min(cand, axis=1)  # (n, k)
        return jnp.minimum(dist, best.T)

    def cond(state):
        _, changed, it = state
        return changed & (it < maxiter)

    def body(state):
        dist, _, it = state
        new = relax(dist)
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = lax.while_loop(cond, body, (dist0, jnp.bool_(True), 0))
    has_neg = jnp.any(relax(dist) < dist)
    return dist, has_neg


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _bellman_ford_device_ell_tail(e_src, e_w, t_src, t_w, dist0, *, maxiter):
    """ELL relaxation with a high-degree overflow tail (see
    :func:`_build_dest_ell`): nodes are relabeled so the tail destinations
    are the LAST ``d`` ids, making the merge a contiguous static-slice
    ``best.at[-d:].min`` — the only merge form that keeps the main gather
    fused inside the while_loop on v5e."""
    d = t_src.shape[0]

    def relax(dist):
        distT = dist.T
        g = jnp.take(distT, e_src.reshape(-1), axis=0).reshape(*e_src.shape, -1)
        best = jnp.min(g + e_w[:, :, None], axis=1)  # (n, k)
        tg = jnp.take(distT, t_src.reshape(-1), axis=0).reshape(*t_src.shape, -1)
        t_best = jnp.min(tg + t_w[:, :, None], axis=1)  # (d, k)
        best = best.at[-d:].min(t_best)
        return jnp.minimum(dist, best.T)

    def cond(state):
        _, changed, it = state
        return changed & (it < maxiter)

    def body(state):
        dist, _, it = state
        new = relax(dist)
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = lax.while_loop(cond, body, (dist0, jnp.bool_(True), 0))
    has_neg = jnp.any(relax(dist) < dist)
    return dist, has_neg


@functools.partial(jax.jit, static_argnames=("n",))
def _predecessors_device(rows, cols, w, dist, sources, *, n):
    """Post-hoc predecessor matrix: ``pred[s, v]`` = the smallest ``u`` with
    an edge ``u→v`` on a shortest path (``dist[s,u] + w == dist[s,v]``);
    -9999 for unreachable nodes and for the source itself (scipy's
    convention)."""
    k = dist.shape[0]
    on_path = jnp.isfinite(dist[:, rows]) & (dist[:, rows] + w[None, :] == dist[:, cols])
    cand = jnp.where(on_path, rows[None, :], n)  # (k, nnz)
    best = jax.ops.segment_min(cand.T, cols, num_segments=n).T  # (k, n)
    # segments with no incoming on-path edge hold either our sentinel ``n``
    # or segment_min's identity (int max) when the node has no edges at all
    pred = jnp.where(best >= n, -9999, best)
    src_mask = jnp.arange(n)[None, :] == sources[:, None]
    return jnp.where(src_mask, -9999, pred).astype(jnp.int32)


def _canon_index(i, n, what="index"):
    """Numpy-style index canonicalization: negatives wrap once, anything
    outside [-n, n) raises (a silently wrapped bad index would compute
    paths from the wrong node)."""
    i = int(i)
    if not -n <= i < n:
        raise ValueError(f"{what} {i} out of range for a graph with {n} nodes")
    return i % n


def _prepare_sources(indices, n):
    if indices is None:
        return np.arange(n, dtype=np.int64), True
    idx = np.atleast_1d(np.asarray(indices, dtype=np.int64))
    if idx.ndim != 1:
        raise ValueError("indices must be a scalar or 1-D array of source nodes")
    if idx.size and (idx.min() < -n or idx.max() >= n):
        raise ValueError(f"source indices out of range for a graph with {n} nodes")
    return idx % n, np.ndim(indices) == 0 and indices is not None


def _shortest_path_bf(
    csgraph,
    *,
    directed,
    indices,
    unweighted,
    return_predecessors,
    check_negative=True,
    require_nonnegative=False,
):
    rows, cols, w, n = _graph_triplet(csgraph, directed=directed, unweighted=unweighted)
    if require_nonnegative and rows.size and w.min() < 0:
        raise ValueError("dijkstra requires non-negative edge weights; use bellman_ford")
    if not directed:
        # min of the two stored orientations is implied by relaxation itself
        pass
    sources, _scalar = _prepare_sources(indices, n)
    k = sources.shape[0]
    fdt, idt = _device_float(), _device_int()
    dist0 = np.full((k, n), np.inf, dtype=fdt)
    dist0[np.arange(k), sources] = 0.0
    rj, cj = jnp.asarray(rows, dtype=idt), jnp.asarray(cols, dtype=idt)
    wj = jnp.asarray(w, dtype=fdt)
    if rows.size == 0:
        dist = jnp.asarray(dist0)
        has_neg = False
    else:
        # the dest-ELL layout (host build + device transfer) is memoized on
        # the operand array when possible: repeated shortest-path calls on
        # the same graph pay only the relaxation loop
        def build_ell():
            ell = _build_dest_ell(rows, cols, w, n, idt, fdt)
            if ell is None:
                return None
            e_src, e_w, tail, perm = ell
            inv = None
            if perm is not None:
                inv = np.empty(n, dtype=np.int64)
                inv[perm] = np.arange(n)
            return (
                jnp.asarray(e_src),
                jnp.asarray(e_w),
                None if tail is None else tuple(jnp.asarray(t) for t in tail),
                inv,
            )

        cached = getattr(csgraph, "_cached_layout", None)
        if cached is not None and not unweighted:
            ell_dev = cached("dest_ell", bool(directed), build_ell)
        else:
            ell_dev = build_ell()
        if ell_dev is not None:
            e_src, e_w, tail, inv = ell_dev
            if inv is not None:
                # high-degree destinations were relabeled to the last ids
                dist0_l = np.full((k, n), np.inf, dtype=fdt)
                dist0_l[np.arange(k), inv[sources]] = 0.0
            else:
                dist0_l = dist0
            if tail is not None:
                t_src, t_w = tail
                dist, has_neg = _bellman_ford_device_ell_tail(
                    e_src, e_w, t_src, t_w, jnp.asarray(dist0_l), maxiter=n + 1
                )
            else:
                dist, has_neg = _bellman_ford_device_ell(
                    e_src, e_w, jnp.asarray(dist0_l), maxiter=n + 1
                )
            if inv is not None:
                dist = jnp.take(dist, jnp.asarray(inv), axis=1)  # back to input labels
        else:
            dist, has_neg = _bellman_ford_device(rj, cj, wj, jnp.asarray(dist0), n=n, maxiter=n + 1)
        has_neg = bool(has_neg)
    if check_negative and has_neg:
        raise NegativeCycleError("negative-weight cycle detected in the graph")
    if return_predecessors:
        if rows.size == 0:
            pred = np.full((k, n), -9999, dtype=np.int32)
            pred[np.arange(k), sources] = -9999
            pred = jnp.asarray(pred)
        else:
            pred = _predecessors_device(
                rj, cj, wj, dist, jnp.asarray(sources, dtype=idt), n=n
            )
        return np.asarray(dist), np.asarray(pred)
    return np.asarray(dist)


def bellman_ford(csgraph, directed=True, indices=None, return_predecessors=False, unweighted=False):
    """Multi-source Bellman-Ford shortest paths (min-plus relaxation on device).

    Mirrors ``scipy.sparse.csgraph.bellman_ford``: returns the
    ``(n_sources, n)`` distance matrix (and the predecessor matrix when
    requested), raising :class:`NegativeCycleError` on reachable negative
    cycles. The whole relaxation runs in one ``lax.while_loop``.
    """
    out = _shortest_path_bf(
        csgraph,
        directed=directed,
        indices=indices,
        unweighted=unweighted,
        return_predecessors=return_predecessors,
    )
    return _squeeze_sources(out, indices, return_predecessors)


def dijkstra(
    csgraph, directed=True, indices=None, return_predecessors=False, unweighted=False, limit=np.inf
):
    """Shortest paths for non-negative weights (scipy-compatible signature).

    On TPU the natural parallel schedule is data-parallel relaxation, not a
    priority queue, so this validates non-negativity and runs the same
    device Bellman-Ford as :func:`bellman_ford` (identical results for
    non-negative graphs); ``limit`` masks distances beyond the horizon to
    ``inf`` afterwards.
    """
    out = _shortest_path_bf(
        csgraph,
        directed=directed,
        indices=indices,
        unweighted=unweighted,
        return_predecessors=return_predecessors,
        check_negative=False,
        require_nonnegative=True,
    )
    if np.isfinite(limit):
        if return_predecessors:
            dist, pred = out
            pred = np.where(dist > limit, -9999, pred)
            dist = np.where(dist > limit, np.inf, dist)
            out = (dist, pred)
        else:
            out = np.where(out > limit, np.inf, out)
    return _squeeze_sources(out, indices, return_predecessors)


def _squeeze_sources(out, indices, return_predecessors):
    if indices is not None and np.ndim(indices) == 0:
        if return_predecessors:
            return out[0][0], out[1][0]
        return out[0]
    return out


def shortest_path(
    csgraph,
    method="auto",
    directed=True,
    return_predecessors=False,
    unweighted=False,
    indices=None,
):
    """All-pairs / multi-source shortest paths.

    ``method``: 'FW' (dense Floyd-Warshall, all pairs), 'BF'/'D' (edge-list
    Bellman-Ford relaxation), or 'auto' — FW when all pairs are requested
    on a small dense-ish graph, BF otherwise.
    """
    if method == "auto":
        rows, _, _, n = _graph_triplet(csgraph, directed=directed)
        dense_enough = n <= 2048 and rows.size >= n
        method = "FW" if indices is None and dense_enough else "BF"
    if method == "FW":
        if indices is not None:
            raise ValueError("Floyd-Warshall computes all pairs; indices is unsupported")
        return floyd_warshall(
            csgraph, directed=directed, return_predecessors=return_predecessors, unweighted=unweighted
        )
    if method in ("BF", "D"):
        fn = bellman_ford if method == "BF" else dijkstra
        return fn(
            csgraph,
            directed=directed,
            indices=indices,
            return_predecessors=return_predecessors,
            unweighted=unweighted,
        )
    raise ValueError(f"unknown method {method!r}; expected 'auto', 'FW', 'BF', or 'D'")


@functools.cache
def _bellman_ford_sharded_fn(mesh, axis_name, n, maxiter):
    from jax.sharding import PartitionSpec as P

    def local(rows_l, cols_l, w_l, dist0):
        # rows/cols/w: this device's edge shard; dist: replicated (k, n).
        # Each relaxation round is a local segment-min over the shard's
        # edges followed by one pmin across the mesh — the distributed
        # min-plus SpMV. Padding edges carry +inf weights (min no-ops).
        def relax(dist):
            cand = dist[:, rows_l] + w_l[None, :]
            best = jax.ops.segment_min(cand.T, cols_l, num_segments=n)
            best = lax.pmin(best, axis_name)
            return jnp.minimum(dist, best.T)

        def cond(state):
            _, changed, it = state
            return changed & (it < maxiter)

        def body(state):
            dist, _, it = state
            new = relax(dist)
            # dist is replicated after pmin, so `changed` agrees everywhere
            return new, jnp.any(new < dist), it + 1

        dist, _, _ = lax.while_loop(cond, body, (dist0, jnp.bool_(True), 0))
        has_neg = jnp.any(relax(dist) < dist)
        return dist, has_neg

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
            out_specs=(P(), P()),
        )
    )


def bellman_ford_partitioned(
    csgraph, mesh, *, indices=None, directed=True, unweighted=False,
    return_predecessors=False, axis_name="x",
):
    """Multi-source Bellman-Ford with the edge list partitioned across a
    device mesh.

    Each device relaxes its edge shard (local segment-min) and the shards
    combine with one ``pmin`` per round; the whole iteration runs inside a
    single ``shard_map``-ped ``lax.while_loop``. The distance matrix stays
    replicated — the partitioned axis is nnz, which is where graph scale
    lives. Results match :func:`bellman_ford` exactly.
    """
    rows, cols, w, n = _graph_triplet(csgraph, directed=directed, unweighted=unweighted)
    sources, _ = _prepare_sources(indices, n)
    k = sources.shape[0]
    fdt, idt = _device_float(), _device_int()
    n_dev = int(np.prod([mesh.shape[a] for a in (axis_name if isinstance(axis_name, tuple) else (axis_name,))]))
    cap = max(-(-rows.size // n_dev), 1)
    pad = cap * n_dev - rows.size
    rows_p = np.concatenate([rows, np.zeros(pad, dtype=rows.dtype)]).astype(idt)
    cols_p = np.concatenate([cols, np.zeros(pad, dtype=cols.dtype)]).astype(idt)
    w_p = np.concatenate([w, np.full(pad, np.inf)]).astype(fdt)
    dist0 = np.full((k, n), np.inf, dtype=fdt)
    dist0[np.arange(k), sources] = 0.0

    f = _bellman_ford_sharded_fn(mesh, axis_name, n, n + 1)
    dist, has_neg = f(jnp.asarray(rows_p), jnp.asarray(cols_p), jnp.asarray(w_p), jnp.asarray(dist0))
    if bool(has_neg):
        raise NegativeCycleError("negative-weight cycle detected in the graph")
    if return_predecessors:
        pred = _predecessors_device(
            jnp.asarray(rows.astype(idt)), jnp.asarray(cols.astype(idt)),
            jnp.asarray(w.astype(fdt)), dist, jnp.asarray(sources.astype(idt)), n=n,
        )
        out = (np.asarray(dist), np.asarray(pred))
    else:
        out = np.asarray(dist)
    return _squeeze_sources(out, indices, return_predecessors)


def johnson(csgraph, directed=True, indices=None, return_predecessors=False, unweighted=False):
    """All-pairs / multi-source shortest paths with negative edge weights
    (no negative cycles) via Johnson's reweighting.

    One device Bellman-Ford from a virtual source gives potentials ``h``;
    edges reweight to ``w + h[u] - h[v] >= 0`` and a second (multi-source)
    relaxation runs on the reweighted graph; distances shift back by
    ``h[v] - h[u]``. Both phases are the whole-loop-jitted min-plus
    relaxation (ELL layout when the degree profile allows).
    """
    rows, cols, w, n = _graph_triplet(csgraph, directed=directed, unweighted=unweighted)
    sources, _ = _prepare_sources(indices, n)
    fdt, idt = _device_float(), _device_int()
    if rows.size == 0:
        return bellman_ford(
            csgraph, directed=directed, indices=indices,
            return_predecessors=return_predecessors, unweighted=unweighted,
        )
    # phase 1: potentials = shortest distance from a virtual node connected
    # to every vertex with weight 0 == BF with all-zero initial distances
    dist0 = np.zeros((1, n), dtype=fdt)
    rj, cj = jnp.asarray(rows, dtype=idt), jnp.asarray(cols, dtype=idt)
    wj = jnp.asarray(w, dtype=fdt)
    h, has_neg = _bellman_ford_device(rj, cj, wj, jnp.asarray(dist0), n=n, maxiter=n + 1)
    if bool(has_neg):
        raise NegativeCycleError("negative-weight cycle detected in the graph")
    h = np.asarray(h)[0]
    # phase 2: non-negative reweighted relaxation + unshift
    w2 = w + h[rows] - h[cols]
    w2 = np.maximum(w2, 0.0)  # clip fp residue; exact zeros on shortest edges
    k = sources.shape[0]
    d0 = np.full((k, n), np.inf, dtype=fdt)
    d0[np.arange(k), sources] = 0.0
    ell = _build_dest_ell(rows, cols, w2, n, idt, fdt)
    if ell is not None:
        e_src_j, e_w_j, tail_j, perm_j = ell
        d0_l = d0
        inv_j = None
        if perm_j is not None:
            inv_j = np.empty(n, dtype=np.int64)
            inv_j[perm_j] = np.arange(n)
            d0_l = d0[:, perm_j]  # d0_l[:, new] = d0[:, perm[new]]
        if tail_j is not None:
            dist_rw, _ = _bellman_ford_device_ell_tail(
                jnp.asarray(e_src_j),
                jnp.asarray(e_w_j),
                jnp.asarray(tail_j[0]),
                jnp.asarray(tail_j[1]),
                jnp.asarray(d0_l),
                maxiter=n + 1,
            )
        else:
            dist_rw, _ = _bellman_ford_device_ell(
                jnp.asarray(e_src_j), jnp.asarray(e_w_j), jnp.asarray(d0_l), maxiter=n + 1
            )
        if inv_j is not None:
            dist_rw = jnp.take(dist_rw, jnp.asarray(inv_j), axis=1)
    else:
        dist_rw, _ = _bellman_ford_device(
            rj, cj, jnp.asarray(w2, dtype=fdt), jnp.asarray(d0), n=n, maxiter=n + 1
        )
    dist = np.asarray(dist_rw) + (h[None, :] - h[sources][:, None])
    if return_predecessors:
        # match predecessors on the REWEIGHTED relaxation: shortest paths
        # are invariant under the potential shift and the fp equality
        # dist[u] + w == dist[v] only holds exactly for the quantities the
        # relaxation actually computed
        pred = _predecessors_device(
            rj, cj, jnp.asarray(w2, dtype=fdt), dist_rw,
            jnp.asarray(sources.astype(idt)), n=n,
        )
        out = (dist, np.asarray(pred))
    else:
        out = dist
    return _squeeze_sources(out, indices, return_predecessors)


# ---------------------------------------------------------------------------
# Floyd-Warshall (dense, on device)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("track_pred",))
def _floyd_warshall_device(d0, p0, *, track_pred):
    n = d0.shape[0]

    def body(k, state):
        d, p = state
        via = d[:, k, None] + d[None, k, :]
        better = via < d
        new_d = jnp.where(better, via, d)
        new_p = jnp.where(better, p[None, k, :], p) if track_pred else p
        return new_d, new_p

    return lax.fori_loop(0, n, body, (d0, p0))


def floyd_warshall(csgraph, directed=True, return_predecessors=False, unweighted=False):
    """All-pairs shortest paths via dense Floyd-Warshall on device.

    O(n²) memory / O(n³) work — the vectorized ``min(D, D[:,k] + D[k,:])``
    inner step is one fused elementwise pass per ``k`` under ``fori_loop``.
    Raises :class:`NegativeCycleError` if any diagonal entry goes negative.
    """
    rows, cols, w, n = _graph_triplet(csgraph, directed=directed, unweighted=unweighted)
    d0 = np.full((n, n), np.inf, dtype=_device_float())
    # parallel edges keep the lightest weight
    np.minimum.at(d0, (rows, cols), w)
    np.fill_diagonal(d0, np.minimum(np.diag(d0), 0.0))
    p0 = np.full((n, n), -9999, dtype=np.int32)
    p0[rows, cols] = rows
    np.fill_diagonal(p0, -9999)
    d, p = _floyd_warshall_device(
        jnp.asarray(d0), jnp.asarray(p0), track_pred=return_predecessors
    )
    d = np.asarray(d)
    if np.any(np.diag(d) < 0):
        raise NegativeCycleError("negative-weight cycle detected in the graph")
    if return_predecessors:
        return d, np.asarray(p)
    return d


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------


def breadth_first_order(csgraph, i_start, directed=True, return_predecessors=True):
    """BFS node ordering + predecessors from ``i_start``.

    Levels come from the unweighted device Bellman-Ford (one relaxation
    round per BFS frontier); the returned node order is sorted by
    ``(level, node id)`` — a valid BFS order (scipy's order additionally
    depends on its queue/adjacency traversal, so compare by level, not
    position).
    """
    dist, pred = _shortest_path_bf(
        csgraph,
        directed=directed,
        indices=np.asarray(i_start),
        unweighted=True,
        return_predecessors=True,
    )
    dist, pred = dist[0], pred[0]
    reachable = np.flatnonzero(np.isfinite(dist))
    order = reachable[np.argsort(dist[reachable], kind="stable")]
    if return_predecessors:
        return order.astype(np.int64), pred
    return order.astype(np.int64)


def breadth_first_tree(csgraph, i_start, directed=True):
    """The BFS tree as a sparse matrix: edge ``(pred[v], v)`` for every
    reachable ``v != i_start``, carrying the original edge weight."""
    from .core.coo import COO

    rows, cols, w, n = _graph_triplet(csgraph, directed=directed)
    start = _canon_index(i_start, n, "i_start")
    order, pred = breadth_first_order(csgraph, start, directed=directed)
    v = order[order != start]
    u = pred[v]
    # recover each tree edge's original weight (lightest parallel edge):
    # lexsort edges by (row, col, weight), searchsorted the linearized key
    eorder = np.lexsort((w, cols, rows))
    keys = rows[eorder] * n + cols[eorder]
    ew = w[eorder]
    pos = np.searchsorted(keys, u * n + v)
    data = ew[pos]
    return COO(np.stack([u, v]), data, shape=(n, n))


def _csr_adjacency(csgraph, *, directed=True):
    """Host CSR adjacency (indptr, indices, n) for the traversal orders."""
    rows, cols, _, n = _graph_triplet(csgraph, directed=directed)
    order = np.lexsort((cols, rows))
    rows_s, cols_s = rows[order], cols[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows_s + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, cols_s, n


def depth_first_order(csgraph, i_start, directed=True, return_predecessors=True):
    """DFS preorder + predecessors from ``i_start`` (scipy-compatible).

    DFS is inherently sequential, so this is a host stack walk over the
    CSR adjacency (one array reversal per visited node, matching scipy's
    visit order: neighbors are explored in index order).
    """
    indptr, indices, n = _csr_adjacency(csgraph, directed=directed)
    i_start = _canon_index(i_start, n, "i_start")
    visited = np.zeros(n, dtype=bool)
    pred = np.full(n, -9999, dtype=np.int32)
    order = []
    # stack of (node, iterator position) frames, but array-sliced: push
    # neighbors in reverse so the lowest index pops first like scipy
    stack = [i_start]
    stack_pred = [-9999]
    while stack:
        v = stack.pop()
        p = stack_pred.pop()
        if visited[v]:
            continue
        visited[v] = True
        if p >= 0:
            pred[v] = p
        order.append(v)
        nbrs = indices[indptr[v] : indptr[v + 1]]
        fresh = nbrs[~visited[nbrs]][::-1]
        stack.extend(fresh.tolist())
        stack_pred.extend([v] * fresh.size)
    node_array = np.array(order, dtype=np.int64)
    if return_predecessors:
        return node_array, pred
    return node_array


def depth_first_tree(csgraph, i_start, directed=True):
    """The DFS tree as a sparse matrix (edge ``(pred[v], v)`` with the
    original weight), mirroring :func:`breadth_first_tree`."""
    from .core.coo import COO

    rows, cols, w, n = _graph_triplet(csgraph, directed=directed)
    start = _canon_index(i_start, n, "i_start")
    order, pred = depth_first_order(csgraph, start, directed=directed)
    v = order[order != start]
    u = pred[v]
    eorder = np.lexsort((w, cols, rows))
    keys = rows[eorder] * n + cols[eorder]
    ew = w[eorder]
    pos = np.searchsorted(keys, u.astype(np.int64) * n + v)
    return COO(np.stack([u.astype(np.int64), v]), ew[pos], shape=(n, n))


def reverse_cuthill_mckee(csgraph, symmetric_mode=False):
    """Bandwidth-reducing node permutation (RCM).

    BFS from minimum-degree seeds, visiting neighbors in increasing-degree
    order, then reversed — the standard preconditioner-friendly ordering
    for the iterative solvers in :mod:`sparse_tpu.linalg`. Host algorithm
    (sequential by nature); the graph is symmetrized unless
    ``symmetric_mode``.
    """
    indptr, indices, n = _csr_adjacency(csgraph, directed=bool(symmetric_mode))
    degree = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    # component seeds in min-degree order
    seeds = np.argsort(degree, kind="stable")
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        pos += 1
        head = pos - 1
        while head < pos:
            v = order[head]
            head += 1
            nbrs = indices[indptr[v] : indptr[v + 1]]
            fresh = nbrs[~visited[nbrs]]
            if fresh.size:
                fresh = np.unique(fresh)
                fresh = fresh[np.argsort(degree[fresh], kind="stable")]
                visited[fresh] = True
                order[pos : pos + fresh.size] = fresh
                pos += fresh.size
    return order[::-1].copy()


def maximum_bipartite_matching(graph, perm_type="row"):
    """Maximum matching of the bipartite graph whose biadjacency matrix is
    ``graph`` (Kuhn's augmenting-path algorithm on the host).

    scipy's convention: ``perm_type='row'`` returns, for each column, the
    matched row (length ``n_cols``, -1 when unmatched); ``'column'``
    returns, for each row, the matched column (length ``n_rows``).
    """
    rows, cols, _, _ = _graph_triplet(graph, directed=True, square=False)
    n_rows, n_cols = graph.shape
    order = np.lexsort((cols, rows))
    rows_s, cols_s = rows[order], cols[order]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr, rows_s + 1, 1)
    np.cumsum(indptr, out=indptr)

    match_col = np.full(n_cols, -1, dtype=np.int64)  # col -> row
    match_row = np.full(n_rows, -1, dtype=np.int64)  # row -> col

    def augment(r, seen):
        for c in cols_s[indptr[r] : indptr[r + 1]]:
            if seen[c]:
                continue
            seen[c] = True
            if match_col[c] < 0 or augment(match_col[c], seen):
                match_col[c] = r
                match_row[r] = c
                return True
        return False

    import sys as _sys

    old_limit = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old_limit, n_rows + n_cols + 100))
    try:
        for r in range(n_rows):
            if match_row[r] < 0:
                augment(r, np.zeros(n_cols, dtype=bool))
    finally:
        _sys.setrecursionlimit(old_limit)
    if perm_type == "row":
        return match_col.astype(np.int32)
    if perm_type == "column":
        return match_row.astype(np.int32)
    raise ValueError("perm_type must be 'row' or 'column'")


def structural_rank(graph):
    """Structural rank = size of the maximum bipartite matching of the
    sparsity pattern (scipy-compatible)."""
    return int((maximum_bipartite_matching(graph, perm_type="column") >= 0).sum())


class MaximumFlowResult:
    """Mirror of scipy's result object: ``flow_value`` and the ``flow``
    matrix (COO; ``flow[u, v]`` is the flow sent along edge ``u -> v``,
    with the skew-symmetric reverse entries like scipy)."""

    def __init__(self, flow_value, flow):
        self.flow_value = flow_value
        self.flow = flow

    def __repr__(self):
        return f"MaximumFlowResult(flow_value={self.flow_value})"


def maximum_flow(csgraph, source, sink):
    """Maximum flow between ``source`` and ``sink`` via Dinic's algorithm
    (host; scipy-compatible, integer capacities required).

    BFS builds the level graph each phase; blocking flow runs an iterative
    DFS with current-arc pointers. Returns :class:`MaximumFlowResult`.
    """
    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    source = _canon_index(source, n, "source")
    sink = _canon_index(sink, n, "sink")
    if source == sink:
        raise ValueError("source and sink must differ")
    if not np.all(w == np.round(w)):
        raise ValueError("maximum_flow requires integer capacities (scipy convention)")
    caps = w.astype(np.int64)
    if caps.size and caps.min() < 0:
        raise ValueError("capacities must be non-negative")

    # arc arrays: forward arc 2i, reverse arc 2i+1 (paired by xor 1)
    m = rows.size
    arc_head = np.empty(2 * m, dtype=np.int64)
    arc_cap = np.zeros(2 * m, dtype=np.int64)
    arc_head[0::2] = cols
    arc_head[1::2] = rows
    arc_cap[0::2] = caps
    arc_tail = np.empty(2 * m, dtype=np.int64)
    arc_tail[0::2] = rows
    arc_tail[1::2] = cols
    order = np.argsort(arc_tail, kind="stable")
    arc_id = order
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, arc_tail[order] + 1, 1)
    np.cumsum(indptr, out=indptr)
    adj = arc_id  # arcs sorted by tail; indptr[v]:indptr[v+1] slices v's arcs

    flow_value = 0
    while True:
        # BFS level graph over arcs with residual capacity
        level = np.full(n, -1, dtype=np.int64)
        level[source] = 0
        frontier = [source]
        while frontier and level[sink] < 0:
            nxt = []
            for u in frontier:
                for a in adj[indptr[u] : indptr[u + 1]]:
                    if arc_cap[a] > 0 and level[arc_head[a]] < 0:
                        level[arc_head[a]] = level[u] + 1
                        nxt.append(int(arc_head[a]))
            frontier = nxt
        if level[sink] < 0:
            break
        # blocking flow: iterative DFS with current-arc pointers
        ptr = indptr[:-1].copy()
        stack = [source]
        path_arcs: list = []
        while stack:
            u = stack[-1]
            if u == sink:
                pushed = min(int(arc_cap[a]) for a in path_arcs)
                for a in path_arcs:
                    arc_cap[a] -= pushed
                    arc_cap[a ^ 1] += pushed
                flow_value += pushed
                # retreat to the first saturated arc on the path
                for i, a in enumerate(path_arcs):
                    if arc_cap[a] == 0:
                        del stack[i + 1 :]
                        del path_arcs[i:]
                        break
                continue
            advanced = False
            while ptr[u] < indptr[u + 1]:
                a = adj[ptr[u]]
                if arc_cap[a] > 0 and level[arc_head[a]] == level[u] + 1:
                    stack.append(int(arc_head[a]))
                    path_arcs.append(int(a))
                    advanced = True
                    break
                ptr[u] += 1
            if not advanced:
                level[u] = -1  # dead end this phase
                stack.pop()
                if path_arcs:
                    path_arcs.pop()

    from .core.coo import COO

    sent = caps - arc_cap[0::2]  # flow on each original edge (may be < 0 if reverse used)
    # scipy reports the skew-symmetric flow matrix on the residual structure
    fr = np.concatenate([rows, cols])
    fc = np.concatenate([cols, rows])
    fv = np.concatenate([sent, -sent])
    flow = COO((fv.astype(np.float64), (fr, fc)), shape=(n, n))
    return MaximumFlowResult(int(flow_value), flow)


def min_weight_full_bipartite_matching(biadjacency, maximized=False):
    """Minimum-weight full bipartite matching (scipy-compatible
    ``(row_ind, col_ind)``), solved by the dense Jonker-Volgenant
    assignment (``scipy.optimize.linear_sum_assignment``) with +inf for
    absent edges — intended for small/medium biadjacency matrices; raises
    when no full matching exists.

    Note scipy's sparse convention: explicit zero entries are not
    representable as edges here (we treat stored entries as edges with
    their weight).
    """
    import scipy.optimize

    rows, cols, w, _ = _graph_triplet(biadjacency, directed=True, square=False)
    n_rows, n_cols = biadjacency.shape
    # linear_sum_assignment rejects inf: shift edge costs non-negative
    # first (every full matching has the same size, so the argmin is
    # unchanged) and mark absent edges with a finite sentinel that then
    # provably dominates any full matching; without the shift, negative
    # weights let LSA prefer a sentinel entry over a real full matching
    wv = -w if maximized else w
    shift = float(wv.min()) if wv.size else 0.0
    wv = wv - min(shift, 0.0)
    span = float(wv.max()) if wv.size else 1.0
    big = (span + 1.0) * (min(n_rows, n_cols) + 1)
    cost = np.full((n_rows, n_cols), big)
    cost[rows, cols] = wv
    r, c = scipy.optimize.linear_sum_assignment(cost)
    present = np.zeros((n_rows, n_cols), dtype=bool)
    present[rows, cols] = True
    if not present[r, c].all():
        raise ValueError("no full matching exists")
    return r.astype(np.int64), c.astype(np.int64)


def _dijkstra_host(indptr, indices, weights, src, dst, banned_nodes, banned_edges):
    """Single-pair host Dijkstra over CSR arcs with node/edge bans; returns
    ``(dist, path-as-node-list)`` or ``(inf, None)``. The spur searches in
    Yen's algorithm modify the graph per call, so a heap walk beats
    re-staging a device relaxation each time."""
    import heapq

    n = indptr.shape[0] - 1
    dist = np.full(n, np.inf)
    prev = np.full(n, -1, dtype=np.int64)
    dist[src] = 0.0
    heap = [(0.0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        if u == dst:
            break
        for e in range(int(indptr[u]), int(indptr[u + 1])):
            if e in banned_edges:
                continue
            v = int(indices[e])
            if v in banned_nodes:
                continue
            nd = d + float(weights[e])
            if nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))
    if not np.isfinite(dist[dst]):
        return np.inf, None
    path = [dst]
    node = dst
    while node != src:
        node = int(prev[node])
        path.append(node)
    return float(dist[dst]), path[::-1]


def yen(csgraph, source, sink, K, *, directed=True, unweighted=False):
    """K shortest loopless paths from ``source`` to ``sink`` (Yen's
    algorithm, scipy-compatible): returns the array of up to ``K`` path
    lengths in nondecreasing order (fewer if the graph has fewer distinct
    loopless paths)."""
    rows, cols, w, n = _graph_triplet(csgraph, directed=directed, unweighted=unweighted)
    source = _canon_index(source, n, "source")
    sink = _canon_index(sink, n, "sink")
    if rows.size and w.min() < 0:
        raise ValueError("yen requires non-negative edge weights")
    order = np.lexsort((w, cols, rows))
    rows_s, cols_s, w_s = rows[order], cols[order], w[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows_s + 1, 1)
    np.cumsum(indptr, out=indptr)

    d0, p0 = _dijkstra_host(indptr, cols_s, w_s, source, sink, set(), set())
    if p0 is None:
        return np.empty(0)
    import heapq

    A = [(d0, p0)]
    B: list = []
    seen_paths = {tuple(p0)}
    while len(A) < K:
        prev_path = A[-1][1]
        for j in range(len(prev_path) - 1):
            spur = prev_path[j]
            root = prev_path[: j + 1]
            banned_edges = set()
            for dp, p in A:
                if len(p) > j and p[: j + 1] == root:
                    u, v = p[j], p[j + 1]
                    for e in range(int(indptr[u]), int(indptr[u + 1])):
                        if int(cols_s[e]) == v:
                            banned_edges.add(e)
            banned_nodes = set(root[:-1])
            sd, sp = _dijkstra_host(indptr, cols_s, w_s, spur, sink, banned_nodes, banned_edges)
            if sp is None:
                continue
            root_cost = 0.0
            for a, b in zip(root[:-1], root[1:]):
                best = np.inf
                for e in range(int(indptr[a]), int(indptr[a + 1])):
                    if int(cols_s[e]) == b:
                        best = min(best, float(w_s[e]))
                root_cost += best
            cand = root[:-1] + sp
            tc = tuple(cand)
            if tc not in seen_paths:
                seen_paths.add(tc)
                heapq.heappush(B, (root_cost + sd, cand))
        if not B:
            break
        A.append(heapq.heappop(B))
    return np.asarray([d for d, _ in A[:K]])


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n",))
def _label_propagation_device(rows, cols, *, n):
    """Min-label propagation to a fixed point: every node takes the smallest
    label among itself and its in-neighbors. On a symmetrized edge list the
    fixed point labels each weakly-connected component by its smallest node
    id. Converges in ≤ diameter rounds, each one segment-min pass."""

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        best = jax.ops.segment_min(labels[rows], cols, num_segments=n)
        new = jnp.minimum(labels, best)
        return new, jnp.any(new < labels)

    labels0 = jnp.arange(n, dtype=rows.dtype)
    labels, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def connected_components(csgraph, directed=True, connection="weak", return_labels=True):
    """Connected components, scipy-compatible ``(n_components, labels)``.

    Weak components run min-label propagation on device (symmetrized edge
    list). Strong components use the dense boolean transitive closure by
    repeated squaring (O(n²) memory — intended for small/medium graphs;
    use ``connection='weak'`` at scale).
    """
    if connection not in ("weak", "strong"):
        raise ValueError("connection must be 'weak' or 'strong'")
    if connection == "strong" and directed:
        labels = _strong_components(csgraph)
    else:
        rows, cols, _, n = _graph_triplet(csgraph, directed=False)
        if rows.size == 0:
            labels = np.arange(n, dtype=np.int64)
        else:
            idt = _device_int()
            labels = np.asarray(
                _label_propagation_device(
                    jnp.asarray(rows, dtype=idt), jnp.asarray(cols, dtype=idt), n=n
                )
            )
    # representative = smallest node id in the component, so ascending
    # representative order == first-occurrence order (scipy's labeling)
    _, labels = np.unique(labels, return_inverse=True)
    n_components = int(labels.max()) + 1 if labels.size else 0
    if return_labels:
        return n_components, labels.astype(np.int32)
    return n_components


@functools.partial(jax.jit, static_argnames=("n", "rounds"))
def _closure_device(rows, cols, *, n, rounds):
    reach = jnp.zeros((n, n), dtype=jnp.bool_).at[rows, cols].set(True)
    reach = reach | jnp.eye(n, dtype=jnp.bool_)

    def body(_, r):
        rf = r.astype(jnp.float32)
        return (rf @ rf) > 0

    return lax.fori_loop(0, rounds, body, reach)


def _strong_components(csgraph):
    rows, cols, _, n = _graph_triplet(csgraph, directed=True)
    if n == 0:
        return np.arange(0, dtype=np.int64)
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    idt = _device_int()
    reach = np.asarray(
        _closure_device(
            jnp.asarray(rows, dtype=idt), jnp.asarray(cols, dtype=idt), n=n, rounds=rounds
        )
    )
    strong = reach & reach.T
    return np.argmax(strong, axis=1).astype(np.int64)  # smallest mutual node id


def _pagerank_inputs(csgraph, personalize):
    """Shared normalization for the single-device and partitioned PageRank:
    out-degree-normalized edge weights, dangling mask, teleport vector."""
    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    fdt = _device_float()
    out_deg = np.zeros(n)
    np.add.at(out_deg, rows, w)
    dangling = out_deg == 0
    with np.errstate(invalid="ignore", divide="ignore"):
        w_norm = np.where(out_deg[rows] > 0, w / out_deg[rows], 0.0).astype(fdt)
    tele = (
        np.full(n, 1.0 / n) if personalize is None else np.asarray(personalize, dtype=np.float64)
    )
    tele = (tele / tele.sum()).astype(fdt)
    return rows, cols, w_norm, dangling, tele, n


def pagerank(csgraph, *, alpha=0.85, tol=1e-10, maxiter=200, personalize=None):
    """PageRank scores by damped power iteration, whole-loop jitted.

    One sparse matvec (segment-sum over the out-normalized edge list) +
    dangling-mass and teleport corrections per round inside a
    ``lax.while_loop``; L1 convergence like networkx. Not part of
    scipy.csgraph — included because it is the canonical semiring workload
    on an adjacency matrix (HITS has an example; this is the API form).
    """
    rows, cols, w_norm, dangling, tele, n = _pagerank_inputs(csgraph, personalize)
    fdt, idt = _device_float(), _device_int()

    rj = jnp.asarray(rows, dtype=idt)
    cj = jnp.asarray(cols, dtype=idt)
    wj = jnp.asarray(w_norm)
    dj = jnp.asarray(dangling)
    tj = jnp.asarray(tele)

    # module-level cache: a per-call @jax.jit closure would re-trace +
    # re-compile the while-program on every pagerank() call
    run = _pagerank_fn(n, maxiter)
    p, it = run(rj, cj, wj, dj, tj, jnp.asarray(alpha, wj.dtype), jnp.asarray(tol, wj.dtype))
    return np.asarray(p), int(it)


@functools.cache
def _pagerank_fn(n, maxiter):
    @jax.jit
    def run(rj, cj, wj, dj, tj, alpha, tol):
        p0 = jnp.full((n,), 1.0 / n, dtype=wj.dtype)

        def step(p):
            spread = jax.ops.segment_sum(p[rj] * wj, cj, num_segments=n)
            dangling_mass = jnp.sum(jnp.where(dj, p, 0.0))
            return alpha * (spread + dangling_mass * tj) + (1.0 - alpha) * tj

        def cond(state):
            _, delta, it = state
            return (delta > tol) & (it < maxiter)

        def body(state):
            p, _, it = state
            new = step(p)
            return new, jnp.sum(jnp.abs(new - p)), it + 1

        p, _, it = lax.while_loop(cond, body, (p0, jnp.asarray(jnp.inf, wj.dtype), 0))
        return p, it

    return run


@functools.cache
def _pagerank_sharded_fn(mesh, axis_name, n, alpha, maxiter):
    from jax.sharding import PartitionSpec as P

    def local(rows_l, cols_l, w_l, dj, tj, p0, tol):
        # edge shard per device; rank vector replicated. One local
        # segment-sum + psum per round — the distributed (+,*) analogue of
        # the sharded Bellman-Ford's segment-min + pmin.
        def step(p):
            local_spread = jax.ops.segment_sum(p[rows_l] * w_l, cols_l, num_segments=n)
            spread = lax.psum(local_spread, axis_name)
            dangling_mass = jnp.sum(jnp.where(dj, p, 0.0))
            return alpha * (spread + dangling_mass * tj) + (1.0 - alpha) * tj

        def cond(state):
            _, delta, it = state
            return (delta > tol) & (it < maxiter)

        def body(state):
            p, _, it = state
            new = step(p)
            return new, jnp.sum(jnp.abs(new - p)), it + 1

        p, _, it = lax.while_loop(cond, body, (p0, jnp.asarray(jnp.inf, p0.dtype), 0))
        return p, it

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P(), P()),
            out_specs=(P(), P()),
        )
    )


def pagerank_partitioned(
    csgraph, mesh, *, alpha=0.85, tol=1e-10, maxiter=200, personalize=None, axis_name="x"
):
    """PageRank with the edge list partitioned across a device mesh: each
    device scatters its shard's rank mass (local segment-sum) and rounds
    combine with one ``psum`` — the whole damped iteration stays inside a
    single ``shard_map``-ped ``lax.while_loop``. Matches :func:`pagerank`.
    Padding edges carry zero weight (no-ops under +)."""
    rows, cols, w_norm, dangling, tele, n = _pagerank_inputs(csgraph, personalize)
    fdt, idt = _device_float(), _device_int()

    n_dev = int(np.prod([mesh.shape[a] for a in (axis_name if isinstance(axis_name, tuple) else (axis_name,))]))
    cap = max(-(-rows.size // n_dev), 1)
    pad = cap * n_dev - rows.size
    rows_p = np.concatenate([rows, np.zeros(pad, dtype=rows.dtype)]).astype(idt)
    cols_p = np.concatenate([cols, np.zeros(pad, dtype=cols.dtype)]).astype(idt)
    w_p = np.concatenate([w_norm, np.zeros(pad, dtype=fdt)])

    f = _pagerank_sharded_fn(mesh, axis_name, n, float(alpha), int(maxiter))
    p0 = jnp.full((n,), 1.0 / n, dtype=fdt)
    p, it = f(
        jnp.asarray(rows_p), jnp.asarray(cols_p), jnp.asarray(w_p),
        jnp.asarray(dangling), jnp.asarray(tele), p0, jnp.asarray(tol, dtype=fdt),
    )
    return np.asarray(p), int(it)


# ---------------------------------------------------------------------------
# Laplacian
# ---------------------------------------------------------------------------


def laplacian(csgraph, normed=False, return_diag=False, use_out_degree=False):
    """Graph Laplacian ``L = D - A`` (or the symmetric-normalized form), as COO.

    Matches scipy: the input diagonal is ignored, degrees count the
    remaining entries (in-degree by default, out-degree with
    ``use_out_degree``), and isolated nodes get degree 1 in the normalized
    form.
    """
    from .core.coo import COO

    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    off = rows != cols
    rows, cols, w = rows[off], cols[off], w[off]
    deg = np.zeros(n)
    np.add.at(deg, rows if use_out_degree else cols, w)
    if normed:
        isolated = deg == 0
        dsqrt = np.sqrt(np.where(isolated, 1.0, deg))
        off_data = -w / (dsqrt[rows] * dsqrt[cols])
        diag_data = np.where(isolated, 0.0, 1.0)
        # scipy returns the sqrt-degree scaling vector (isolated nodes -> 1)
        diag_out = dsqrt
    else:
        off_data = -w
        diag_data = deg
        diag_out = deg
    all_rows = np.concatenate([rows, np.arange(n)])
    all_cols = np.concatenate([cols, np.arange(n)])
    all_data = np.concatenate([off_data, diag_data])
    lap = COO(np.stack([all_rows, all_cols]), all_data, shape=(n, n), prune=True)
    if return_diag:
        return lap, diag_out
    return lap


# ---------------------------------------------------------------------------
# minimum spanning tree (Borůvka, vectorized host rounds)
# ---------------------------------------------------------------------------


def minimum_spanning_tree(csgraph, overwrite=False):
    """Minimum spanning forest via Borůvka's algorithm.

    Each round every component picks its lightest outgoing edge (one
    vectorized ``minimum.at`` per side — the host analogue of the device
    segment-min) and components merge by hooking + pointer jumping;
    ≤ log₂(n) rounds, no per-edge Python loops. Returns the forest as an
    upper-triangular COO (``tree[min(u,v), max(u,v)] = w``), matching
    scipy's nnz and total weight.
    """
    from .core.coo import COO

    rows, cols, w, n = _graph_triplet(csgraph, directed=False)
    # undirected: each edge appears both ways; keep one canonical copy
    keep = rows < cols
    u, v, w = rows[keep], cols[keep], w[keep]
    # dedupe parallel edges keeping the lightest (sort by weight, first wins)
    order = np.lexsort((w, v, u))
    u, v, w = u[order], v[order], w[order]
    first = np.ones(u.size, dtype=bool)
    if u.size:
        first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    u, v, w = u[first], v[first], w[first]

    m = u.size
    # rank: index into the weight-sorted edge list — integer minimum over
    # ranks == lexicographic (weight, tiebreak) minimum over edges
    rank_order = np.argsort(w, kind="stable")
    rank = np.empty(m, dtype=np.int64)
    rank[rank_order] = np.arange(m)

    comp = np.arange(n, dtype=np.int64)
    chosen = np.zeros(m, dtype=bool)
    while True:
        cu, cv = comp[u], comp[v]
        cross = cu != cv
        if not np.any(cross):
            break
        best = np.full(n, m, dtype=np.int64)
        np.minimum.at(best, cu[cross], rank[cross])
        np.minimum.at(best, cv[cross], rank[cross])
        sel = rank_order[np.unique(best[best < m])]
        chosen[sel] = True
        # hook: the larger component root points at the smaller
        a, b = comp[u[sel]], comp[v[sel]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        parent = np.arange(n, dtype=np.int64)
        # multiple hooks may target one root; keep the smallest destination
        np.minimum.at(parent, hi, lo)
        # pointer jumping to full compression
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]

    tu, tv, tw = u[chosen], v[chosen], w[chosen]
    return COO(np.stack([tu, tv]), tw, shape=(n, n))


# ---------------------------------------------------------------------------
# graph construction / representation helpers (scipy.sparse.csgraph parity:
# scipy/sparse/csgraph/_tools.pyx — semantics re-derived, host numpy impl)
# ---------------------------------------------------------------------------

_NULL_IDX = -9999


def _null_mask(a, null_value, nan_null, infinity_null):
    null = np.zeros(a.shape, dtype=bool)
    if null_value is not None:
        if np.isnan(null_value):
            null |= np.isnan(a)
        elif np.isinf(null_value):
            null |= np.isinf(a) & (np.sign(a) == np.sign(null_value))
        else:
            null |= a == null_value
    if nan_null:
        null |= np.isnan(a)
    if infinity_null:
        null |= np.isinf(a)
    return null


def csgraph_from_dense(graph, null_value=0, nan_null=True, infinity_null=True):
    """Dense adjacency matrix -> sparse graph (COO).

    Entries equal to ``null_value`` (and NaN / infinities per the flags)
    are non-edges; everything else — including explicit zeros when
    ``null_value`` is not 0 — is a stored edge. Mirrors
    ``scipy.sparse.csgraph.csgraph_from_dense``.
    """
    from .core.coo import COO

    a = np.asarray(graph, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {a.shape}")
    keep = ~_null_mask(a, null_value, nan_null, infinity_null)
    rows, cols = np.nonzero(keep)
    return COO(np.stack([rows, cols]), a[rows, cols], shape=a.shape)


def csgraph_from_masked(graph):
    """Masked dense adjacency matrix -> sparse graph (COO); masked entries
    are non-edges, unmasked zeros are stored edges."""
    from .core.coo import COO

    a = np.ma.asarray(graph)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {a.shape}")
    keep = ~np.ma.getmaskarray(a)
    rows, cols = np.nonzero(keep)
    return COO(np.stack([rows, cols]), np.asarray(a.data, dtype=np.float64)[rows, cols], shape=a.shape)


def csgraph_masked_from_dense(graph, null_value=0, nan_null=True, infinity_null=True, copy=True):
    """Dense adjacency matrix -> ``np.ma.MaskedArray`` with non-edges masked."""
    a = np.array(graph, dtype=np.float64, copy=copy)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"csgraph requires a square 2-D adjacency matrix, got {a.shape}")
    return np.ma.masked_array(a, mask=_null_mask(a, null_value, nan_null, infinity_null))


def csgraph_to_dense(csgraph, null_value=0):
    """Sparse graph -> dense adjacency matrix with non-edges set to
    ``null_value`` (stored zero-weight edges stay 0, distinct from null).
    Duplicate edges collapse to the minimum weight, like scipy."""
    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    out = np.full((n, n), np.float64(null_value))
    # duplicates -> min: sort descending by weight so the smallest lands last
    order = np.lexsort((-w,))
    out[rows[order], cols[order]] = w[order]
    return out


def csgraph_to_masked(csgraph):
    """Sparse graph -> ``np.ma.MaskedArray`` with non-edges masked."""
    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    mask = np.ones((n, n), dtype=bool)
    mask[rows, cols] = False
    data = np.zeros((n, n))
    order = np.lexsort((-w,))
    data[rows[order], cols[order]] = w[order]
    return np.ma.masked_array(data, mask=mask)


def _edge_weights(rows, cols, w, n, q_rows, q_cols, *, directed):
    """Vectorized weight lookup ``G[q_rows, q_cols]`` over the edge triplet;
    missing edges -> +inf. Undirected: min over the two stored directions."""
    key = rows * n + cols
    # duplicates keep the min weight: sort (key asc, weight asc) so the
    # side="left" searchsorted hit is the group's minimum
    order = np.lexsort((w, key))
    skey, sw = key[order], w[order]
    first = np.searchsorted(skey, q_rows * n + q_cols, side="left")
    first_c = np.minimum(first, max(skey.size - 1, 0))
    if skey.size == 0:
        found = np.zeros(q_rows.shape, dtype=bool)
    else:
        found = (first < skey.size) & (skey[first_c] == q_rows * n + q_cols)
    vals = np.where(found, sw[first_c] if skey.size else 0.0, np.inf)
    if not directed:
        rev = _edge_weights(rows, cols, w, n, q_cols, q_rows, directed=True)
        vals = np.minimum(vals, rev)
    return vals


def reconstruct_path(csgraph, predecessors, directed=True):
    """Tree of the edges ``(predecessors[j], j)`` with weights taken from
    ``csgraph``, as COO — scipy's ``reconstruct_path``."""
    from .core.coo import COO

    rows, cols, w, n = _graph_triplet(csgraph, directed=True)
    pred = np.asarray(predecessors)
    if pred.shape != (n,):
        raise ValueError(f"predecessors must have shape ({n},), got {pred.shape}")
    j = np.nonzero(pred >= 0)[0]
    p = pred[j].astype(np.int64)
    data = _edge_weights(rows, cols, w, n, p, j, directed=directed)
    data = np.where(np.isinf(data), 0.0, data)
    return COO(np.stack([p, j]), data, shape=(n, n))


def construct_dist_matrix(graph, predecessors, directed=True, null_value=np.inf):
    """Distance matrix from a full ``(n, n)`` predecessor matrix: entry
    ``(i, j)`` sums the edge weights along the predecessor path from ``i``
    to ``j`` (``null_value`` where no path exists, 0 on the diagonal).
    Path sums run by pointer doubling — O(n^2 log n) vectorized, not the
    O(n^3) scalar walk."""
    rows, cols, w, n = _graph_triplet(graph, directed=True)
    pred = np.asarray(predecessors)
    if pred.shape != (n, n):
        raise ValueError(f"predecessors must have shape ({n}, {n}), got {pred.shape}")

    idx = np.arange(n)
    valid = pred >= 0
    p = np.where(valid, pred, idx[None, :]).astype(np.int64)
    # edge weight into j from its predecessor (0 at roots/self-loops)
    e = np.where(
        valid,
        _edge_weights(rows, cols, w, n, p.ravel(), np.tile(idx, n), directed=directed).reshape(n, n),
        0.0,
    )
    # pointer doubling to the root of each predecessor tree, accumulating
    # path weight; roots self-loop with weight 0 so both converge
    jump, acc = p, e
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)):
        ri = idx[:, None]
        acc = acc + acc[ri, jump]
        jump = jump[ri, jump]
    dist = np.where(jump == idx[:, None], acc, np.float64(null_value))
    np.fill_diagonal(dist, 0.0)
    return dist
