"""Differential soak harness: long randomized sweeps of the eager surface
against dense numpy oracles (beyond the CI-sized fuzz in tests/test_fuzz.py).

    python scripts/soak.py [n_scale]

Covers: binary elemwise across formats/dtypes, reductions, leading-axis and
general mixed indexing (int/slice/array/None), DOK mutation, and random
3-6-op chains (add/mul/transpose/reshape/abs/slice/clip-fill/sum/round with
format round-trips). Exits nonzero on any mismatch or canonicality break.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import sparse_tpu as st
from sparse_tpu._utils import is_canonical

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
FAILS = 0


def report(kind, *info):
    global FAILS
    FAILS += 1
    print("FAIL", kind, *info)


def elemwise_sweep(rng, n):
    for case in range(n):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(s) for s in rng.integers(1, 12, ndim))
        d1 = rng.random(shape) * (rng.random(shape) < rng.uniform(0.05, 0.6))
        d2 = rng.random(shape) * (rng.random(shape) < rng.uniform(0.05, 0.6))
        if case % 5 == 0:
            d1, d2 = d1.astype(np.float32), d2.astype(np.float32)
        if case % 7 == 0:
            d1, d2 = (d1 * 10).astype(np.int64), (d2 * 10).astype(np.int64)
        fmt = ["coo", "gcxs", "dok"][case % 3]
        x1 = st.asarray(st.COO.from_numpy(d1), format=fmt)
        x2 = st.COO.from_numpy(d2)
        for op in (np.add, np.multiply, np.maximum, np.subtract):
            got = op(x1, x2)
            gd = got.todense() if hasattr(got, "todense") else got
            if not np.allclose(np.asarray(gd, np.float64), op(d1, d2).astype(np.float64)):
                report("elemwise", shape, fmt, op.__name__)
            if isinstance(got, st.COO) and not is_canonical(got):
                report("elemwise-canon", shape, fmt, op.__name__)


def reduction_sweep(rng, n):
    for case in range(n):
        ndim = int(rng.integers(1, 5))
        shape = tuple(int(s) for s in rng.integers(1, 10, ndim))
        d = rng.random(shape) * (rng.random(shape) < 0.4)
        if case % 4 == 1:
            d = (d * 9).astype(np.int64)
        x = st.COO.from_numpy(d)
        naxes = int(rng.integers(1, ndim + 1))
        axes = tuple(sorted(rng.choice(ndim, naxes, replace=False).tolist()))
        ax = axes if len(axes) < ndim else None
        for red, npred in (("sum", np.sum), ("max", np.max), ("min", np.min), ("prod", np.prod)):
            got = getattr(x, red)(axis=ax)
            gd = got.todense() if hasattr(got, "todense") else got
            exp = npred(d, axis=ax)
            if not np.allclose(np.asarray(gd, np.float64), exp, rtol=1e-5):
                report("reduce", red, shape, axes)


def indexing_sweep(rng, n):
    for case in range(n):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(s) for s in rng.integers(1, 10, ndim))
        d = rng.random(shape) * (rng.random(shape) < 0.5)
        x = st.COO.from_numpy(d)
        idx = []
        n_adv = 0
        for s in shape:
            r = rng.random()
            if r < 0.2:
                idx.append(int(rng.integers(-s, s)))
            elif r < 0.45:
                a, b = sorted(rng.integers(0, s + 1, 2).tolist())
                idx.append(slice(a, b, int(rng.choice([1, 2]))))
            elif r < 0.7 and n_adv < 2:
                idx.append(rng.integers(-s, s, int(rng.integers(0, 5))))
                n_adv += 1
            else:
                idx.append(slice(None))
            if rng.random() < 0.1:
                idx.append(None)
        idx = tuple(idx)
        try:
            exp = d[idx]
        except IndexError:
            continue
        got = x[idx]
        gd = got.todense() if hasattr(got, "todense") else got
        if np.asarray(gd).shape != exp.shape or not np.allclose(np.asarray(gd, np.float64), exp):
            report("indexing", shape, idx)
        if hasattr(got, "coords") and not is_canonical(got):
            report("indexing-canon", shape, idx)


def chain_sweep(rng, n):
    for case in range(n):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(s) for s in rng.integers(2, 10, ndim))
        d = rng.random(shape) * (rng.random(shape) < 0.4)
        x = st.COO.from_numpy(d)
        for _ in range(int(rng.integers(3, 7))):
            op = int(rng.integers(0, 9))
            try:
                if op == 0:
                    d2 = rng.random(d.shape) * (rng.random(d.shape) < 0.4)
                    x = x + st.COO.from_numpy(d2)
                    d = d + d2
                elif op == 1:
                    x, d = x * 1.5, d * 1.5
                elif op == 2 and d.ndim >= 2:
                    perm = tuple(rng.permutation(d.ndim).tolist())
                    x, d = x.transpose(perm), d.transpose(perm)
                elif op == 3:
                    x, d = x.reshape((d.size,)), d.reshape((d.size,))
                elif op == 4:
                    x, d = abs(x), abs(d)
                elif op == 5 and d.shape[0] > 1:
                    k = int(rng.integers(1, d.shape[0]))
                    x, d = x[k:], d[k:]
                elif op == 6:
                    x, d = np.maximum(x, 0.3), np.maximum(d, 0.3)
                elif op == 7 and d.ndim >= 2:
                    ax = int(rng.integers(0, d.ndim))
                    x, d = x.sum(axis=ax), d.sum(axis=ax)
                else:
                    x = st.asarray(x, format="gcxs").tocoo()
            except ValueError:
                continue
            if d.ndim == 0:
                break
        gd = x.todense() if hasattr(x, "todense") else x
        if np.asarray(gd).shape != d.shape or not np.allclose(np.asarray(gd, np.float64), d, atol=1e-10):
            report("chain", case, shape)


def matmul_sweep(rng, n):
    for case in range(n):
        m, k, p = (int(s) for s in rng.integers(1, 40, 3))
        da = rng.random((m, k)) * (rng.random((m, k)) < rng.uniform(0.05, 0.5))
        db = rng.random((k, p)) * (rng.random((k, p)) < rng.uniform(0.05, 0.5))
        if case % 4 == 0:
            da, db = da.astype(np.float32), db.astype(np.float32)
        fa = ["coo", "gcxs", "csr", "csc"][case % 4]
        fb = ["coo", "gcxs", "csc", "csr"][(case + 1) % 4]
        sa = st.asarray(st.COO.from_numpy(da), format=fa)
        sb = st.asarray(st.COO.from_numpy(db), format=fb)
        X = rng.random((int(rng.integers(1, 34)), m))
        v = rng.random(k)
        ref = np.float64
        checks = [
            (sa @ sb, da @ db, "sp@sp"),
            (sa @ db, da @ db, "sp@dn"),
            (X @ sa, X @ da, "dn@sp"),
            (sa @ v, da @ v, "sp@vec"),
            (v @ sb, v @ db, "vec@sp"),
        ]
        for got, want, tag in checks:
            gd = got.todense() if hasattr(got, "todense") else got
            tol = 1e-4 if np.asarray(gd).dtype == np.float32 else 1e-9
            if not np.allclose(np.asarray(gd, ref), want.astype(ref), atol=tol, rtol=tol):
                report("matmul", tag, fa, fb, (m, k, p))


def gcxs_index_transpose_sweep(rng, n):
    import scipy.sparse as sp

    from sparse_tpu.core.gcxs import GCXS

    for case in range(n):
        m, p = (int(s) for s in rng.integers(2, 60, 2))
        d = rng.random((m, p)) * (rng.random((m, p)) < rng.uniform(0.02, 0.5))
        x = st.COO.from_numpy(d)
        g = GCXS.from_coo(x, compressed_axes=(case % 2,))

        def pick(size):
            r = int(rng.integers(0, 5))
            if r == 0:
                return int(rng.integers(-size, size))
            if r == 1:
                a, b = sorted(rng.integers(0, size + 1, 2).tolist())
                return slice(int(a), int(b))
            if r == 2:
                cnt = int(rng.integers(0, min(size, 6) + 1))
                arr = rng.choice(size, cnt, replace=bool(rng.integers(0, 2)))
                return arr.astype([np.int32, np.int64][case % 2])
            if r == 3:
                return rng.random(size) < 0.4
            return slice(None)

        idx = (pick(m), pick(p))
        try:
            ref = d[idx]
            got = g[idx]
        except IndexError:
            # e.g. two advanced indices of incompatible lengths
            continue
        gd = got.todense() if hasattr(got, "todense") else got
        if np.asarray(gd).shape != np.asarray(ref).shape or not np.allclose(np.asarray(gd), ref):
            report("gcxs-index", case, idx)
        # transpose / scipy conversion round-trips
        t = x.T
        if not (is_canonical(t) and np.allclose(t.todense(), d.T)):
            report("transpose", case)
        if x.nnz:
            refm = sp.coo_matrix((np.asarray(x.data), tuple(np.asarray(x.coords))), shape=x.shape)
            if (x.tocsr() != refm.tocsr()).nnz or (x.tocsc() != refm.tocsc()).nnz:
                report("tocsr/tocsc", case)


def csgraph_linalg_sweep(rng, n):
    """Random graphs/systems vs the scipy oracles: shortest paths (incl.
    negative weights + cycle detection), components, MST, structural rank,
    and a CG/GMRES solve per round."""
    import scipy.sparse as sps
    import scipy.sparse.csgraph as spc
    import scipy.sparse.linalg as spla

    from sparse_tpu import csgraph, linalg

    for i in range(n):
        nn = int(rng.integers(5, 120))
        density = float(rng.uniform(0.01, 0.2))
        directed = bool(rng.integers(0, 2))
        neg = bool(rng.integers(0, 4) == 0)
        g = sps.random(nn, nn, density=density, random_state=int(rng.integers(1 << 30)))
        g.setdiag(0)
        g.eliminate_zeros()
        if g.nnz == 0:
            continue
        g.data = rng.random(g.nnz) + 0.05
        if neg:
            g.data[rng.random(g.nnz) < 0.2] -= 0.5
        A = st.COO.from_scipy_sparse(g.tocoo())
        src = int(rng.integers(0, nn))
        try:
            got = csgraph.bellman_ford(A, indices=src, directed=directed)
            err = None
        except csgraph.NegativeCycleError:
            got, err = None, "neg"
        try:
            ref = spc.bellman_ford(g.tocsr(), indices=src, directed=directed)
            ref_err = None
        except spc.NegativeCycleError:
            ref, ref_err = None, "neg"
        if err != ref_err:
            report("csgraph-bf-cycle", i, nn, density, err, ref_err)
        elif err is None:
            fin = np.isfinite(ref)
            if not (np.isfinite(got) == fin).all() or not np.allclose(got[fin], ref[fin]):
                report("csgraph-bf", i, nn, density)
        gn, gl = csgraph.connected_components(A, directed=directed, connection="weak")
        rn, rl = spc.connected_components(g.tocsr(), directed=directed, connection="weak")
        if gn != rn or not (gl == rl).all():
            report("csgraph-cc", i, nn, density)
        und = g.maximum(g.T)
        if und.nnz and und.data.min() > 0:
            t1 = csgraph.minimum_spanning_tree(st.COO.from_scipy_sparse(und.tocoo()))
            t2 = spc.minimum_spanning_tree(und.tocsr())
            if t1.nnz != t2.nnz or not np.isclose(t1.data.sum(), t2.data.sum()):
                report("csgraph-mst", i, nn, density)
        if csgraph.structural_rank(A) != spc.structural_rank(g.tocsr()):
            report("csgraph-rank", i, nn)
        # solvers on a diagonally-dominant shifted system
        spd = (und + (abs(und).sum(axis=1).max() + 1.0) * sps.eye(nn)).tocsr()
        As = st.COO.from_scipy_sparse(spd.tocoo())
        b = rng.standard_normal(nn)
        x, info = linalg.cg(As, b, tol=1e-10)
        if int(info) != 0 or not np.allclose(spd @ np.asarray(x), b, atol=1e-6 * max(np.abs(b).max(), 1)):
            report("linalg-cg", i, nn)
        x, info = linalg.gmres(As, b, tol=1e-9, restart=int(rng.integers(3, 40)))
        if int(info) != 0 or not np.allclose(spd @ np.asarray(x), b, atol=1e-5 * max(np.abs(b).max(), 1)):
            report("linalg-gmres", i, nn)


def main():
    rng = np.random.default_rng(2026)
    elemwise_sweep(rng, 1500 * SCALE)
    print("elemwise sweep done")
    reduction_sweep(rng, 800 * SCALE)
    print("reduction sweep done")
    indexing_sweep(rng, 1500 * SCALE)
    print("indexing sweep done")
    chain_sweep(rng, 400 * SCALE)
    print("chain sweep done")
    matmul_sweep(rng, 600 * SCALE)
    print("matmul sweep done")
    gcxs_index_transpose_sweep(rng, 800 * SCALE)
    print("gcxs index/transpose sweep done")
    csgraph_linalg_sweep(rng, 60 * SCALE)
    print("csgraph/linalg sweep done")
    print(f"soak complete: {FAILS} failures")
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
