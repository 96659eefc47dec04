"""Pytest plugin aliasing ``sparse`` to ``sparse_tpu`` for parity auditing.

Lets the upstream reference's own test suite (read-only at
``/root/reference/sparse/numba_backend/tests``) run unmodified against this
package: the strongest available check that a user of the reference can
switch to ``sparse_tpu`` and find the same API and semantics.

Loaded early via ``pytest -p shim_plugin`` (see run_reference_tests.sh), so
the aliases are installed before the reference's conftest files import
``sparse``.
"""

from __future__ import annotations

import enum
import sys
import types

import jax

# The axon TPU-tunnel plugin overrides JAX_PLATFORMS; force the CPU backend
# in-process (same as tests/conftest.py) so the audit runs locally.
jax.config.update("jax_platforms", "cpu")

import sparse_tpu
import sparse_tpu._settings
import sparse_tpu._utils
import sparse_tpu.core.gcxs as _gcxs_mod


class _BackendType(enum.Enum):
    Numba = "Numba"
    Finch = "Finch"
    MLIR = "MLIR"


# The reference's root conftest collects numba_backend tests only when
# ``sparse._BACKEND == _BackendType.Numba``; this package has a single
# JAX/XLA backend that plays that role.
sparse_tpu._BackendType = _BackendType
sparse_tpu._BACKEND = _BackendType.Numba

_compressed = types.ModuleType("sparse.numba_backend._compressed")
_compressed.GCXS = sparse_tpu.GCXS
_compressed.CSR = _gcxs_mod.CSR
_compressed.CSC = _gcxs_mod.CSC
_compressed.compressed = _gcxs_mod

# Attribute paths the reference tests touch (sparse._compressed.CSR,
# sparse.numba_backend._compressed.CSC, ...).
sparse_tpu._compressed = _compressed
sparse_tpu.numba_backend = sparse_tpu

sys.modules["sparse"] = sparse_tpu
sys.modules["sparse.numba_backend"] = sparse_tpu
sys.modules["sparse.numba_backend._utils"] = sparse_tpu._utils
sys.modules["sparse.numba_backend._settings"] = sparse_tpu._settings
sys.modules["sparse.numba_backend._compressed"] = _compressed
sys.modules["sparse.numba_backend._compressed.compressed"] = _gcxs_mod
