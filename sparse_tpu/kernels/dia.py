"""DIA (diagonal/banded) kernels — the TPU-optimal layout for banded
matrices.

Stencil-structured matrices (grid Laplacians, tridiagonal systems,
finite-difference operators) store all of their entries on a handful of
diagonals. In DIA form the matvec is a sum of *statically shifted*
elementwise products — no gathers at all, so it runs at HBM bandwidth on
the VPU where the general COO/ELL paths pay per-entry gather cost
(5-pt Laplacian 256²: ~30 µs/SpMV vs ~1.2 ms for the block-ELL one-hot
form on v5e).

scipy's equivalent is ``scipy.sparse.dia_matrix``; the upstream reference
has no DIA format, so this is a TPU-native extension. Offsets are static
Python ints (part of the compiled program); ``bands`` is a dense
``(k, n)`` array, a JAX pytree leaf.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

__all__ = ["DiaMatrix", "build_dia", "dia_spmv", "dia_spmm", "dia_spmv_sharded"]

#: refuse conversions that would pad more than this many stored values per nnz
_MAX_FILL_RATIO = 8.0
#: refuse matrices with more distinct diagonals than this
_MAX_BANDS = 64


class DiaMatrix(NamedTuple):
    """Banded matrix: ``bands[i, r] == A[r, r + offsets[i]]`` (0 outside)."""

    offsets: tuple  # static diagonal offsets (col - row), sorted
    bands: jnp.ndarray  # (k, n) float
    shape: tuple  # (n, n)


def build_dia(rows, cols, data, n, max_bands=_MAX_BANDS, max_fill=_MAX_FILL_RATIO):
    """Convert canonical COO triplets of an ``n×n`` matrix to DIA form.

    Returns ``None`` when the matrix isn't usefully banded: more than
    ``max_bands`` distinct diagonals, or band storage exceeding
    ``max_fill`` × nnz.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)
    if data.size == 0:
        return None
    diffs = cols.astype(np.int64) - rows.astype(np.int64)
    offsets = np.unique(diffs)
    if offsets.size > max_bands or offsets.size * n > max_fill * data.size:
        return None
    bands = np.zeros((offsets.size, n), dtype=data.dtype)
    band_idx = np.searchsorted(offsets, diffs)
    bands[band_idx, rows] = data
    # host numpy bands: building (and caching) the layout is then safe even
    # under an outer jit trace — jnp ops consume numpy operands directly
    return DiaMatrix(tuple(int(o) for o in offsets), bands, (n, n))


def dia_spmv(offsets, bands, x):
    """``y = A @ x`` for a DIA matrix — k static shifts + multiply-adds.

    ``offsets`` must be static Python ints (hashable under ``jit``); the
    body is a fully unrolled sum of slice-multiplies that XLA fuses into a
    single bandwidth-bound loop.
    """
    n = bands.shape[1]
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    xp = jnp.pad(x, (lo, hi))
    y = jnp.zeros(n, dtype=jnp.result_type(bands.dtype, x.dtype))
    for i, o in enumerate(offsets):
        y = y + bands[i] * xp[lo + o : lo + o + n]
    return y


@functools.cache
def _dia_sharded_fn(mesh, axis_name, offsets, seg):
    from jax import lax
    from jax.sharding import PartitionSpec as P

    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)

    def local(bl, xl):
        # bl: (k, seg) local band columns; xl: (seg,) local x block
        n_dev = lax.axis_size(axis_name)
        fwd = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        bwd = [(j, (j - 1) % n_dev) for j in range(n_dev)]
        parts = []
        if lo:
            parts.append(lax.ppermute(xl[-lo:], axis_name, fwd))
        parts.append(xl)
        if hi:
            parts.append(lax.ppermute(xl[:hi], axis_name, bwd))
        xp = jnp.concatenate(parts) if len(parts) > 1 else xl
        # ring wrap-around at the global edges is harmless: the out-of-range
        # band entries are zero by construction (build_dia)
        y = jnp.zeros(seg, dtype=jnp.result_type(bl.dtype, xl.dtype))
        for i, o in enumerate(offsets):
            y = y + bl[i] * xp[lo + o : lo + o + seg]
        return y

    import jax

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(axis_name)),
            out_specs=P(axis_name),
        )
    )


def dia_spmv_sharded(offsets, bands, x, mesh, axis_name="x"):
    """Row-sharded banded matvec: bands and x split over a 1-D mesh, each
    device exchanging only ``max|offset|``-wide x halos with its ring
    neighbors (``ppermute`` over ICI) — the classic distributed-stencil
    halo pattern. O(bandwidth · k) communication per matvec.

    ``n`` must divide over the mesh and the halo must fit one segment.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = bands.shape[1]
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"n={n} must divide over {n_dev} devices")
    seg = n // n_dev
    if max(-min(min(offsets), 0), max(max(offsets), 0)) > seg:
        raise ValueError("band halo wider than a device segment; use fewer devices")
    f = _dia_sharded_fn(mesh, axis_name, tuple(int(o) for o in offsets), seg)
    bands_s = jax.device_put(jnp.asarray(bands), NamedSharding(mesh, P(None, axis_name)))
    x_s = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(axis_name)))
    return f(bands_s, x_s)


def dia_spmm(offsets, bands, dense):
    """``Y = A @ X`` for a DIA matrix and dense ``X`` of shape (n, m)."""
    n = bands.shape[1]
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    xp = jnp.pad(dense, ((lo, hi), (0, 0)))
    y = jnp.zeros((n, dense.shape[1]), dtype=jnp.result_type(bands.dtype, dense.dtype))
    for i, o in enumerate(offsets):
        y = y + bands[i][:, None] * xp[lo + o : lo + o + n, :]
    return y
