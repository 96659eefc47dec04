from . import common, creation, dot, einsum, elemwise, indexing, slicing  # noqa: F401
