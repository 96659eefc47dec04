"""``save_npz`` / ``load_npz`` — the same custom (scipy-incompatible) npz
schema as the reference (``_io.py:7-132``): COO stores
coords/data/shape/fill_value, GCXS stores data/indices/indptr/
compressed_axes/shape/fill_value.
"""

from __future__ import annotations

import numpy as np

from .core.coo import COO
from .core.gcxs import GCXS


def save_npz(filename, matrix, compressed=True):
    """Save a COO or GCXS array to .npz.

    Note: the format is not compatible with ``scipy.sparse.save_npz``."""
    nodes = {}
    if isinstance(matrix, COO):
        nodes = {
            "data": np.asarray(matrix.data),
            "coords": np.asarray(matrix.coords),
            "shape": np.asarray(matrix.shape),
            "fill_value": np.asarray(matrix.fill_value),
        }
    elif isinstance(matrix, GCXS):
        nodes = {
            "data": np.asarray(matrix.data),
            "indices": np.asarray(matrix.indices),
            "indptr": np.asarray(matrix.indptr),
            "shape": np.asarray(matrix.shape),
            "fill_value": np.asarray(matrix.fill_value),
            "compressed_axes": np.asarray(matrix.compressed_axes),
        }
    else:
        raise ValueError(f"This object cannot be saved: {type(matrix).__name__}")

    if compressed:
        np.savez_compressed(filename, **nodes)
    else:
        np.savez(filename, **nodes)


def load_npz(filename):
    """Load a COO or GCXS array saved with :func:`save_npz`."""
    with np.load(filename) as fp:
        try:
            coords = fp["coords"]
            data = fp["data"]
            shape = tuple(fp["shape"])
            fill_value = fp["fill_value"][()]
            return COO(
                coords=coords,
                data=data,
                shape=shape,
                sorted=True,
                has_duplicates=False,
                fill_value=fill_value,
            )
        except KeyError:
            pass
        try:
            data = fp["data"]
            indices = fp["indices"]
            indptr = fp["indptr"]
            compressed_axes = tuple(int(a) for a in fp["compressed_axes"])
            shape = tuple(fp["shape"])
            fill_value = fp["fill_value"][()]
            return GCXS._make(data, indices, indptr, shape, compressed_axes, fill_value)
        except KeyError as e:
            raise RuntimeError(f"The file {filename!s} does not contain a valid sparse matrix") from e
