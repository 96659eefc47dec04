from .base import SparseArray  # noqa: F401
from .coo import COO  # noqa: F401
from .dok import DOK  # noqa: F401
from .gcxs import CSC, CSR, GCXS  # noqa: F401
