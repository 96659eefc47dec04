"""Global settings and Array-API inspection for sparse_tpu.

Mirrors the semantics knobs of the reference library
(``/root/reference/sparse/numba_backend/_settings.py``):

- ``SPARSE_AUTO_DENSIFY`` — if truthy, ``np.asarray(sparse_array)`` silently
  densifies instead of raising.
- ``SPARSE_WARN_ON_TOO_DENSE`` — if truthy, constructing a sparse array whose
  sparse storage is larger than its dense storage emits a RuntimeWarning.

Additional TPU-native knobs:

- ``SPARSE_TPU_DEFAULT_INDEX_DTYPE`` — "int32" (default) or "int64"; the
  coordinate dtype used when the array shape fits.
"""

from __future__ import annotations

import os

AUTO_DENSIFY = bool(int(os.environ.get("SPARSE_AUTO_DENSIFY", "0")))
WARN_ON_TOO_DENSE = bool(int(os.environ.get("SPARSE_WARN_ON_TOO_DENSE", "0")))

# NEP-18 (__array_function__) dispatch is unconditionally available on the
# NumPy versions this package supports; kept as a named flag for parity with
# the reference's ``_settings.py:21``.
NEP18_ENABLED = True

import numpy as _np

IS_NUMPY2 = _np.lib.NumpyVersion(_np.__version__) >= "2.0.0"
DEFAULT_INDEX_DTYPE = os.environ.get("SPARSE_TPU_DEFAULT_INDEX_DTYPE", "int32")

# "cpu" (default): eager sparse×dense runs the C++/host kernels — right for
# remote-accelerator setups where each eager op would pay a transfer RTT.
# "default": run on jax's default backend (the TPU on an attached host)
# through the block-ELL MXU kernel, with the layout cached on the array.
EAGER_MATMUL_DEVICE = os.environ.get("SPARSE_TPU_EAGER_MATMUL", "cpu")


class _Info:
    """Array-API namespace inspection object.

    Semantics follow the reference ``__array_namespace_info__``
    (``_settings.py:24-46``): no boolean-mask indexing inside jit, shapes with
    data-dependent output sizes are eager-only.
    """

    def capabilities(self):
        return {
            "boolean indexing": True,
            "data-dependent shapes": True,
            "max dimensions": 64,
        }

    def default_device(self):
        import jax

        return jax.devices()[0]

    def default_dtypes(self, *, device=None):
        import numpy as np

        return {
            "real floating": np.dtype(np.float64),
            "complex floating": np.dtype(np.complex128),
            "integral": np.dtype(np.int64),
            "indexing": np.dtype(np.int64),
        }

    def devices(self):
        import jax

        return jax.devices()

    def dtypes(self, *, device=None, kind=None):
        import numpy as np

        full = {
            "bool": np.dtype(np.bool_),
            "int8": np.dtype(np.int8),
            "int16": np.dtype(np.int16),
            "int32": np.dtype(np.int32),
            "int64": np.dtype(np.int64),
            "uint8": np.dtype(np.uint8),
            "uint16": np.dtype(np.uint16),
            "uint32": np.dtype(np.uint32),
            "uint64": np.dtype(np.uint64),
            "float32": np.dtype(np.float32),
            "float64": np.dtype(np.float64),
            "complex64": np.dtype(np.complex64),
            "complex128": np.dtype(np.complex128),
        }
        if kind is None:
            return full
        if isinstance(kind, str):
            kinds = (kind,)
        else:
            kinds = tuple(kind)
        out = {}
        for name, dt in full.items():
            for k in kinds:
                if k == "bool" and dt == np.bool_:
                    out[name] = dt
                elif k == "signed integer" and np.issubdtype(dt, np.signedinteger):
                    out[name] = dt
                elif k == "unsigned integer" and np.issubdtype(dt, np.unsignedinteger):
                    out[name] = dt
                elif k == "integral" and np.issubdtype(dt, np.integer):
                    out[name] = dt
                elif k == "real floating" and np.issubdtype(dt, np.floating):
                    out[name] = dt
                elif k == "complex floating" and np.issubdtype(dt, np.complexfloating):
                    out[name] = dt
                elif k == "numeric" and np.issubdtype(dt, np.number):
                    out[name] = dt
        return out


def __array_namespace_info__():
    return _Info()
