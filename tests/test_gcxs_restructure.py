"""GCXS._restructure (direct relinearization, round 3) vs the COO-route
oracle — EXACT layout equality (indptr, indices, data), not just dense
equality, across random shapes / compressed-axes / permutations.

The direct path must reproduce GCXS.from_coo(tocoo().op()) bit-for-bit:
it exercises all three reorder strategies (already-sorted, stable
counting scatter, counting+per-row sort) and the native relinearize
kernel's mixed-radix term evaluation (pow2 and non-pow2 dims).
"""

import numpy as np
import pytest

import sparse_tpu as sparse
from sparse_tpu import COO, GCXS


def _assert_same_layout(a, b, ctx):
    assert a.compressed_axes == b.compressed_axes, ctx
    assert np.array_equal(np.asarray(a.indptr), np.asarray(b.indptr)), ctx
    assert np.array_equal(np.asarray(a.indices), np.asarray(b.indices)), ctx
    assert np.allclose(np.asarray(a.data), np.asarray(b.data)), ctx


@pytest.mark.parametrize("trial", range(20))
def test_restructure_matches_coo_route(trial):
    rng = np.random.default_rng(trial)
    ndim = int(rng.integers(2, 5))
    shape = tuple(int(rng.integers(2, 9)) for _ in range(ndim))
    c = sparse.random(shape, density=0.3, random_state=trial)
    ca = tuple(sorted(rng.choice(ndim, size=int(rng.integers(1, ndim)), replace=False).tolist()))
    g = GCXS.from_coo(COO(np.asarray(c.coords), np.asarray(c.data), shape=shape), compressed_axes=ca)

    # change_compressed_axes
    ca2 = tuple(sorted(rng.choice(ndim, size=int(rng.integers(1, ndim)), replace=False).tolist()))
    if ca2 != ca:
        _assert_same_layout(
            g.change_compressed_axes(ca2),
            GCXS.from_coo(g.tocoo(), compressed_axes=ca2),
            ("change_ca", trial, ca, ca2),
        )

    # transpose (the 2-D compressed_axes=None case takes the intentional
    # O(1) CSR<->CSC swap, a different-but-equivalent layout — skip there)
    axes = tuple(rng.permutation(ndim).tolist())
    if axes != tuple(range(ndim)):
        for ca3 in ([(0,)] if ndim == 2 else [None, (0,)]):
            _assert_same_layout(
                g.transpose(axes, compressed_axes=ca3),
                GCXS.from_coo(g.tocoo().transpose(axes), compressed_axes=ca3),
                ("transpose", trial, axes, ca3),
            )

    # reshape (2-D targets incl. non-pow2 splits)
    sz = int(np.prod(shape))
    for ns in ((sz // shape[-1], shape[-1]), (shape[0], sz // shape[0])):
        if int(np.prod(ns)) == sz and ns != shape:
            _assert_same_layout(
                g.reshape(ns),
                GCXS.from_coo(g.tocoo().reshape(ns), compressed_axes=None),
                ("reshape", trial, ns),
            )


def test_restructure_non_float_dtype_and_empty():
    rng = np.random.default_rng(7)
    gi = GCXS.from_numpy(rng.integers(0, 5, size=(6, 7, 8)), compressed_axes=(0,))
    _assert_same_layout(
        gi.change_compressed_axes((2,)),
        GCXS.from_coo(gi.tocoo(), compressed_axes=(2,)),
        "int dtype (argsort fallback)",
    )
    ge = GCXS.from_numpy(np.zeros((4, 5, 6)), compressed_axes=(0,))
    out = ge.change_compressed_axes((2,))
    assert out.nnz == 0 and out.shape == (4, 5, 6) and out.compressed_axes == (2,)
    t = ge.transpose((1, 2, 0))
    assert t.shape == (5, 6, 4) and t.nnz == 0


def test_restructure_index_dtype_upcast_semantics():
    # reference upcast rule: keep the stored dtype when it can address the
    # result, minimal upcast otherwise (uint8 -> uint16)
    a = sparse.random((8, 7, 6), density=0.5, format="gcxs", idx_dtype=np.uint8)
    r = sparse.concatenate((a, a))
    assert r.indptr.dtype == np.uint16
