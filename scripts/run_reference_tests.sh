#!/usr/bin/env bash
# Run the upstream reference's own test suite against sparse_tpu via the
# module-alias shim (scripts/reference_shim/shim_plugin.py).
#
# The test files are staged into a /tmp scratch dir at run time (running them
# in place trips on the reference's package-relative conftest imports once
# ``sparse`` is aliased). Nothing is copied into this repository.
#
# Excluded files test reference-private machinery with no analogue here:
#   - test_coo_numba.py           numba boxing/unboxing of COO into @njit code
#   - test_compressed_convert.py  numba convert-kernel internals
#
# Usage: bash scripts/run_reference_tests.sh [extra pytest args]
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
REF=/root/reference/sparse/numba_backend/tests
STAGE=$(mktemp -d /tmp/ref_parity.XXXXXX)
trap 'rm -rf "$STAGE"' EXIT

cp "$REF"/test_*.py "$REF"/conftest.py "$STAGE"/
rm -f "$STAGE"/test_coo_numba.py "$STAGE"/test_compressed_convert.py
# dask is not installed in this image
rm -f "$STAGE"/test_dask_interop.py

export PYTHONPATH="$REPO:$REPO/scripts/reference_shim${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS=cpu

# test_{sparse,dense}_broadcasting monkeypatch the reference's private
# `_umath._Elemwise` class to count coordinate-match calls — engine
# internals with no analogue in this package's elemwise engine.
python -m pytest "$STAGE" \
  -p shim_plugin -p no:cacheprovider \
  --rootdir="$STAGE" -o addopts= \
  --continue-on-collection-errors \
  --deselect "test_elemwise.py::test_sparse_broadcasting" \
  --deselect "test_elemwise.py::test_dense_broadcasting" \
  -q "$@"
