"""Shared helpers: fill-value equivalence, axis normalization, dtype sizing,
sparse random generation, and the test oracle ``assert_eq``.

Semantics follow the reference helpers in
``/root/reference/sparse/numba_backend/_utils.py`` (``equivalent:406``,
``normalize_axis:367``, ``can_store:651``, ``random:221``, ``assert_eq:11``),
re-implemented for a JAX-backed library: host logic uses NumPy, device logic
uses jnp/lax equivalents.
"""

from __future__ import annotations

import functools
import warnings
from collections.abc import Iterable
from numbers import Integral

import numpy as np

import jax
import jax.numpy as jnp


def equivalent(x, y, /, loose=False):
    """Element-wise equivalence with *bitwise* float semantics.

    For float/complex dtypes, two values are equivalent iff their bit patterns
    match — so ``NaN ≡ NaN`` and ``0.0 ≢ -0.0``. With ``loose=True``, uses
    value equality but still treats NaNs as equal (``NaN ≡ NaN``,
    ``0.0 ≡ -0.0``). Non-float dtypes use ``==``.

    Mirrors reference ``_utils.py:406-452``.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    dt = np.result_type(x.dtype, y.dtype)
    if not (np.issubdtype(dt, np.floating) or np.issubdtype(dt, np.complexfloating)):
        return x == y

    if loose:
        if np.issubdtype(dt, np.complexfloating):
            return equivalent(x.real, y.real, loose=True) & equivalent(x.imag, y.imag, loose=True)
        return (x == y) | ((x != x) & (y != y))

    if x.size == 0 or y.size == 0:
        shape = np.broadcast_shapes(x.shape, y.shape)
        return np.empty(shape, dtype=np.bool_)

    if np.issubdtype(dt, np.complexfloating):
        xc = np.ascontiguousarray(x.astype(dt))
        yc = np.ascontiguousarray(y.astype(dt))
        return equivalent(xc.real, yc.real) & equivalent(xc.imag, yc.imag)

    # single-pass bit compare through a matching-width unsigned view
    bits = {2: np.uint16, 4: np.uint32, 8: np.uint64}[np.dtype(dt).itemsize]
    if y.ndim == 0:
        # scalar rhs (the `_prune`/fill-check shape): one vectorized compare
        # against the scalar's bit pattern, no broadcast materialization
        xb = np.ascontiguousarray(x.astype(dt, copy=False))
        yb = y.astype(dt).reshape(1).view(bits)[0]
        return xb.view(bits) == yb
    shape = np.broadcast_shapes(x.shape, y.shape)
    xb = np.ascontiguousarray(np.broadcast_to(x.astype(dt), shape))
    yb = np.ascontiguousarray(np.broadcast_to(y.astype(dt), shape))
    return (xb.view(bits) == yb.view(bits)).reshape(shape)


def equivalent_jnp(x, fill_value):
    """Traced element-wise bitwise equivalence of a jnp array against a scalar.

    Device-side analogue of :func:`equivalent` used when pruning results
    inside jitted kernels.
    """
    x = jnp.asarray(x)
    fv = jnp.asarray(fill_value, dtype=x.dtype)
    dt = x.dtype
    if jnp.issubdtype(dt, jnp.complexfloating):
        return equivalent_jnp(x.real, fv.real) & equivalent_jnp(x.imag, fv.imag)
    if jnp.issubdtype(dt, jnp.floating):
        bits_dtype = {2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[dt.itemsize]
        xb = jax.lax.bitcast_convert_type(x, bits_dtype)
        fb = jax.lax.bitcast_convert_type(fv, bits_dtype)
        return xb == fb
    return x == fv


def zero_of_dtype(dtype):
    return np.zeros((), dtype=dtype)[()]


def normalize_axis(axis, ndim):
    """Normalize negative/iterable axes against ``ndim``; raise on overflow."""
    if axis is None:
        return None
    if isinstance(axis, Integral):
        axis = int(axis)
        if axis < 0:
            axis += ndim
        if axis < 0 or axis >= ndim:
            raise ValueError(f"Invalid axis index {axis} for ndim={ndim}")
        return axis
    if isinstance(axis, Iterable):
        if not all(isinstance(a, Integral) for a in axis):
            raise ValueError(f"axis {axis} not understood")
        return tuple(normalize_axis(a, ndim) for a in axis)
    raise ValueError(f"axis {axis} not understood")


def can_store(dtype, nelem):
    """Whether ``dtype`` can represent the scalar ``nelem`` exactly
    (reference ``_utils.py:651`` — handles negatives and overflow)."""
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            warnings.filterwarnings("error", "out-of-bound", DeprecationWarning)
            return bool(np.array(nelem, dtype=np.dtype(dtype)) == np.array(nelem))
    except (ValueError, OverflowError):
        return False


def index_dtype_for(max_value):
    """Smallest of int32/int64 that can hold ``max_value``."""
    from ._settings import DEFAULT_INDEX_DTYPE

    if DEFAULT_INDEX_DTYPE == "int64":
        return np.int64
    return np.int32 if max_value <= np.iinfo(np.int32).max else np.int64


def get_out_dtype(arr_dtype, max_value):
    """Index dtype for outputs: keep ``arr_dtype`` when it can store the
    value, else the minimal upcast (uint8 → uint16, ...; reference
    ``_utils.py:644``)."""
    if can_store(arr_dtype, max_value):
        return np.dtype(arr_dtype)
    return np.dtype(np.min_scalar_type(int(max_value)))


def np_array(x):
    """Host copy of a (possibly device) array."""
    return np.asarray(x)


def check_fill_value(arr, accept_fv, func_name=""):
    accept = accept_fv if isinstance(accept_fv, Iterable) and not isinstance(accept_fv, str) else [accept_fv]
    if not any(bool(np.all(equivalent(arr.fill_value, fv, loose=True))) for fv in accept):
        # message wording matches the reference's _utils.py:559
        raise ValueError(f"fill_value={arr.fill_value!r} but should be in {accept}.")


def check_zero_fill_value(*args, func_name=""):
    # the bitwise zero test is memoized per instance, KEYED on the
    # fill_value object identity: shallow-copy constructors (e.g.
    # GCXS(other, fill_value=...)) copy __dict__ — and the memo with it —
    # then reassign fill_value, so an unkeyed memo would let a nonzero
    # fill slip through the guard that fronts every matmul/dot call
    for i, arr in enumerate(args):
        if hasattr(arr, "fill_value"):
            if getattr(arr, "size", 1) == 0:
                continue  # reference skips empty operands (_utils.py:591)
            fv = arr.fill_value
            memo = getattr(arr, "_fv_is_zero_memo", None)
            if memo is not None and memo[0] is fv:
                ok = memo[1]
            else:
                # loose: -0.0 and -0j count as zero (reference default)
                ok = bool(np.all(equivalent(fv, zero_of_dtype(np.asarray(fv).dtype), loose=True)))
                try:
                    arr._fv_is_zero_memo = (fv, ok)
                except AttributeError:
                    pass
            if not ok:
                raise ValueError(
                    f"This operation requires zero fill values, but argument {i:d} had a fill value of {fv!s}."
                )


def check_consistent_fill_value(arrays):
    arrays = list(arrays)
    if not arrays:
        raise ValueError("At least one array required.")
    fv = arrays[0].fill_value
    for i, arr in enumerate(arrays):
        if not bool(np.all(equivalent(arr.fill_value, fv))):
            raise ValueError(
                f"This operation requires consistent fill-values, but argument {i} has fill value {arr.fill_value!s}"
                f" while argument 0 has fill value {fv!s}."
            )


def isscalar(x):
    return np.ndim(x) == 0 and not hasattr(x, "fill_value")


#: Shared module-level RNG, mirroring the reference's ``_utils.py:218``
#: (``default_rng = np.random.default_rng()``) used by its test fixtures.
default_rng = np.random.default_rng()


def is_unsigned_dtype(dtype):
    return np.issubdtype(dtype, np.integer) and np.iinfo(dtype).min == 0


def convert_format(format):
    """Normalize a format spec (class or string) to its lowercase string name.

    Parity with the reference's ``_utils.py:665``.
    """
    from .core.base import SparseArray

    if isinstance(format, type):
        if not issubclass(format, SparseArray):
            raise ValueError(f"Invalid format: {format}")
        return format.__name__.lower()
    if isinstance(format, str):
        return format
    raise ValueError(f"Invalid format: {format}")


def assert_gcxs_slicing(s, x):
    """Check row slicing of a 3-D GCXS product against its dense oracle.

    Parity helper for the reference's ``_utils.py:52`` test utility: pick a
    random row of the (batch, rows, cols) product and verify the sparse
    slice's stored values match the dense row's non-fill entries.
    """
    rng = np.random.default_rng()
    row = int(rng.integers(s.shape[s.ndim - 2]))
    dense_row = np.asarray(x)[0][row]
    sparse_vals = np.asarray(s[0][row].todense())
    assert np.allclose(sparse_vals, dense_row)


def random_value_array(value, fraction):
    """Data generator returning arrays where ``fraction`` of entries equal
    ``value`` (used by tests for NaN-laden data). Mirrors ``_utils.py:355``."""

    def replace_values(n):
        i = int(n * fraction)
        ar = np.empty((n,), dtype=np.float64)
        ar[:i] = value
        ar[i:] = np.random.rand(n - i)
        return ar

    return replace_values


def random(
    shape,
    density=None,
    nnz=None,
    random_state=None,
    data_rvs=None,
    format="coo",
    fill_value=None,
    idx_dtype=None,
    **kwargs,
):
    """Generate a random sparse array with the given density or nnz.

    Sampling without replacement over the linearized index space uses
    draw-and-dedup rejection (uniform over fixed-size subsets by
    exchangeability) instead of the reference's sequential Vitter algD/algA
    (``_utils.py:103-215``) — the vectorized form is host/TPU friendly.

    Examples
    --------
    >>> import sparse_tpu as sparse
    >>> s = sparse.random((10, 10), density=0.1, random_state=42)
    >>> s.nnz
    10
    >>> s.shape
    (10, 10)
    """
    from .core.coo import COO

    if not isinstance(shape, Iterable):
        shape = (shape,)
    shape = tuple(int(s) for s in shape)
    elements = int(np.prod(shape, dtype=np.float64)) if len(shape) else 1
    if density is not None and nnz is not None:
        raise ValueError("'density' and 'nnz' are mutually exclusive")
    if density is None:
        density = 0.01
    if not (0 <= density <= 1):
        raise ValueError(f"density {density} is not in the unit interval")
    if nnz is None:
        nnz = int(round(elements * density))
    if not (0 <= nnz <= elements):
        raise ValueError(f"cannot generate {nnz} samples from {elements} elements")

    if random_state is None:
        rng = np.random.default_rng()
    elif isinstance(random_state, Integral):
        rng = np.random.default_rng(random_state)
    elif isinstance(random_state, np.random.RandomState | np.random.Generator):
        rng = random_state
    else:
        raise ValueError("random_state must be None, an int, RandomState, or Generator")

    ind = _sample_without_replacement(rng, elements, nnz)

    if data_rvs is None:
        data = rng.random(nnz)
    else:
        data = data_rvs(nnz)

    if len(shape):
        coords = np.stack(np.unravel_index(ind, shape), axis=0)
    else:
        coords = np.empty((0, nnz), dtype=np.intp)
    ar = COO(
        coords,
        data,
        shape=shape,
        fill_value=fill_value,
        has_duplicates=False,
        sorted=True,
        idx_dtype=idx_dtype,
    )
    return ar.asformat(format, **kwargs)


def _sample_without_replacement(rng, n, k):
    """k distinct sorted integers uniform over [0, n)."""
    if k == 0:
        return np.empty(0, dtype=np.int64)
    if k == n:
        return np.arange(n, dtype=np.int64)
    if n <= 1 << 24 or k > n // 2:
        # small space (or dense sample): permutation-based choice is fine
        if k > n // 2:
            # sample the complement when over half
            comp = _sample_without_replacement(rng, n, n - k)
            mask = np.ones(n, dtype=bool)
            mask[comp] = False
            return np.flatnonzero(mask).astype(np.int64)
        return np.sort(rng.choice(n, size=k, replace=False).astype(np.int64))
    # sparse sample over a huge space: draw with replacement, dedup, top up.
    out = np.empty(0, dtype=np.int64)
    need = k
    while need > 0:
        draw = rng.integers(0, n, size=int(need * 1.1) + 16, dtype=np.int64)
        out = np.unique(np.concatenate([out, draw]))
        need = k - out.size
    if out.size > k:
        sel = rng.choice(out.size, size=k, replace=False)
        out = np.sort(out[sel])
    return out


# ---------------------------------------------------------------------------
# Test oracle helpers (mirrors reference assert_eq / is_canonical)
# ---------------------------------------------------------------------------


def is_canonical(x):
    """True iff a COO array is sorted, deduplicated, and pruned."""
    from .core.coo import COO

    if not isinstance(x, COO):
        return True
    lin = np.asarray(x.linear_loc())
    return bool((np.diff(lin) > 0).all()) and not bool(equivalent(np.asarray(x.data), np.asarray(x.fill_value)).any())


def assert_nnz(s, x):
    fill_value = np.asarray(s.fill_value)
    assert np.sum(~equivalent(x, fill_value)) == s.nnz


def assert_eq(x, y, check_nnz=True, compare_dtype=True, **kwargs):
    """Oracle equality assert between any mix of sparse arrays / ndarrays.

    Checks shape, dtype, canonical form + nnz for COO operands, fill_value
    consistency when both are sparse, and element-wise closeness of the dense
    forms (``allclose(equal_nan=True)`` for floats, exact otherwise) — the
    same contract as reference ``_utils.py:11-49``.
    """
    from .core.base import SparseArray
    from .core.coo import COO

    assert x.shape == y.shape, f"shape mismatch: {x.shape} vs {y.shape}"

    if compare_dtype:
        assert np.dtype(x.dtype) == np.dtype(y.dtype), f"dtype mismatch: {x.dtype} vs {y.dtype}"

    if isinstance(x, COO):
        assert is_canonical(x), "left operand not canonical"
    if isinstance(y, COO):
        assert is_canonical(y), "right operand not canonical"

    if isinstance(x, SparseArray) and isinstance(y, SparseArray):
        assert np.all(equivalent(np.asarray(x.fill_value), np.asarray(y.fill_value))), (
            f"fill_value mismatch: {x.fill_value} vs {y.fill_value}"
        )

    def _densify(v):
        if isinstance(v, SparseArray):
            return np.asarray(v.todense())
        if hasattr(v, "toarray"):  # scipy.sparse operands
            return np.asarray(v.toarray())
        return np.asarray(v)

    xx = _densify(x)
    yy = _densify(y)

    if check_nnz:
        if isinstance(x, SparseArray):
            assert_nnz(x, xx)
        if isinstance(y, SparseArray):
            assert_nnz(y, yy)

    if np.issubdtype(xx.dtype, np.floating) or np.issubdtype(xx.dtype, np.complexfloating):
        # f32-precision components (float32 and complex64) get
        # accumulation-order slack
        if "rtol" not in kwargs and np.finfo(xx.dtype).eps >= np.finfo(np.float32).eps:
            kwargs["rtol"] = 1e-5
        np.testing.assert_allclose(xx, yy, equal_nan=True, **kwargs)
    else:
        np.testing.assert_array_equal(xx, yy)


def html_table(arr):
    """Small HTML summary table used by ``_repr_html_``."""
    table = ["<table><tbody>"]
    headings = ["Format", "Data Type", "Shape", "nnz", "Density", "Read-only"]
    info = [
        type(arr).__name__.lower(),
        str(arr.dtype),
        str(arr.shape),
        str(arr.nnz),
        str(arr.density),
        str(not hasattr(arr, "__setitem__")),
    ]
    if hasattr(arr, "nbytes"):
        headings.append("Size")
        info.append(human_readable_size(arr.nbytes))
        headings.append("Storage ratio")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            ratio = float(np.float64(arr.nbytes) / np.float64(arr.size * arr.dtype.itemsize))
        info.append(f"{ratio:.2f}")
    if type(arr).__name__ == "GCXS":
        headings.append("Compressed Axes")
        info.append(str(arr.compressed_axes))
    for h, i in zip(headings, info):
        table.append(f'<tr><th style="text-align: left">{h}</th><td style="text-align: left">{i}</td></tr>')
    table.append("</tbody></table>")
    return "".join(table)


def human_readable_size(size):
    for limit, suffix in [(2**10, ""), (2**20, "K"), (2**30, "M"), (2**40, "G")]:
        if size < limit:
            if not suffix:
                return str(size)
            return f"{size / (limit / 2**10):.1f}{suffix}"
    return f"{size / 2**40:.1f}T"


@functools.cache
def _cached_jit(fn, **kwargs):
    return jax.jit(fn, **kwargs)
