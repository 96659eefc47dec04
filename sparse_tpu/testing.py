"""Public testing helpers (oracle asserts) — re-exported from ``_utils`` so
downstream suites can ``from sparse_tpu.testing import assert_eq`` the way
reference-based suites import its test utilities."""

from ._utils import assert_eq, assert_nnz, is_canonical, random_value_array  # noqa: F401
