"""sparse_tpu — a TPU-native N-D sparse array framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
pydata/sparse: COO / GCXS (CSR/CSC) / DOK formats with first-class fill
values, NumPy-semantics elementwise ops with broadcasting, reductions,
sparse-dense and sparse-sparse matmul/tensordot/einsum (SpMV, SpMM, SpGEMM,
SDDMM, MTTKRP), indexing, and the Array-API namespace — plus what the
reference never had: jit/pjit-compatible pytree arrays, XLA kernels for the
hot paths, and multi-chip execution via ``jax.sharding`` meshes
(``sparse_tpu.parallel``).

Environment flags (same semantics as the reference):
  SPARSE_AUTO_DENSIFY     — allow silent densification in ``np.asarray``
  SPARSE_WARN_ON_TOO_DENSE — warn when sparse storage exceeds dense
  SPARSE_TPU_NO_X64       — set to 1 to skip enabling jax 64-bit mode
"""

from __future__ import annotations

import os as _os
import warnings as _warnings

import jax as _jax

if not bool(int(_os.environ.get("SPARSE_TPU_NO_X64", "0"))):
    # NumPy-parity semantics (float64/int64 defaults) require x64 mode.
    _jax.config.update("jax_enable_x64", True)

# Big cumulative ops / multi-operand sorts inside a lax.scan (e.g. the
# traceable esc_spgemm benched in a scan loop) can fail TPU compiles with
# "scoped allocation ... reduce-window ... vmem limit" at libtpu's 16 MB
# default.  Raise the scoped-vmem limit when the user hasn't configured
# libtpu themselves (must happen before libtpu loads; verified fix on v5e).
if "LIBTPU_INIT_ARGS" not in _os.environ:
    _os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=65536"

# Backend selector parity (reference sparse/__init__.py:10-63): the reference
# dispatches between Numba/Finch/MLIR via SPARSE_BACKEND; here there is one
# JAX/XLA/Pallas backend — honor the variable and warn on unknown values so
# programs written against the reference keep working.
_backend = _os.environ.get("SPARSE_BACKEND", "JAX")
if _backend.lower() not in {"jax", "numba", "auto", ""}:
    _warnings.warn(
        f"SPARSE_BACKEND={_backend!r} is not available in sparse_tpu; using the JAX/XLA/Pallas backend.",
        RuntimeWarning,
        stacklevel=2,
    )
del _backend

from numpy import (  # noqa: E402
    add,
    bitwise_and,
    bitwise_not,
    bitwise_or,
    bitwise_xor,
    ceil,
    complex64,
    complex128,
    conj,
    copysign,
    cos,
    cosh,
    divide,
    e,
    exp,
    expm1,
    finfo,
    float16,
    float32,
    float64,
    floor,
    floor_divide,
    greater,
    greater_equal,
    hypot,
    iinfo,
    inf,
    int8,
    int16,
    int32,
    int64,
    less,
    less_equal,
    log,
    log1p,
    log2,
    log10,
    logaddexp,
    logical_and,
    logical_not,
    logical_or,
    logical_xor,
    maximum,
    minimum,
    multiply,
    nan,
    negative,
    newaxis,
    nextafter,
    not_equal,
    pi,
    positive,
    reciprocal,
    remainder,
    sign,
    signbit,
    sin,
    sinh,
    sqrt,
    square,
    subtract,
    tan,
    tanh,
    trunc,
    uint8,
    uint16,
    uint32,
    uint64,
)
from numpy import arccos as acos  # noqa: E402
from numpy import arccosh as acosh  # noqa: E402
from numpy import arcsin as asin  # noqa: E402
from numpy import arcsinh as asinh  # noqa: E402
from numpy import arctan as atan  # noqa: E402
from numpy import arctan2 as atan2  # noqa: E402
from numpy import arctanh as atanh  # noqa: E402
from numpy import bool_ as bool  # noqa: E402, A001
from numpy import invert as bitwise_invert  # noqa: E402
from numpy import left_shift as bitwise_left_shift  # noqa: E402
from numpy import power as pow  # noqa: E402, A001
from numpy import right_shift as bitwise_right_shift  # noqa: E402

from ._settings import __array_namespace_info__  # noqa: E402
from ._utils import random  # noqa: E402
from ._io import load_npz, save_npz  # noqa: E402
from .core.base import SparseArray  # noqa: E402
from .core.coo import COO  # noqa: E402
from .core.dok import DOK  # noqa: E402
from .core.gcxs import CSC, CSR, GCXS  # noqa: E402
from .ops.elemwise import broadcast_to, elemwise  # noqa: E402
from .ops.dot import dot, matmul, matvec_add, sddmm, tensordot, vecdot  # noqa: E402
from .ops.einsum import einsum  # noqa: E402
from .ops.common import (  # noqa: E402
    argmax,
    argmin,
    argwhere,
    asCOO,
    as_coo,
    asnumpy,
    broadcast_shapes,
    can_cast,
    concat,
    concatenate,
    diagonal,
    diagonalize,
    diff,
    equal,
    expand_dims,
    flip,
    interp,
    isfinite,
    isinf,
    isnan,
    isneginf,
    isposinf,
    kron,
    matrix_transpose,
    moveaxis,
    nanmax,
    nanmean,
    nanmin,
    nanprod,
    nanreduce,
    nansum,
    nonzero,
    outer,
    pad,
    repeat,
    result_type,
    roll,
    sort,
    stack,
    swapaxes,
    take,
    tile,
    tril,
    triu,
    unique_counts,
    unique_values,
    unstack,
    where,
)
from .ops.creation import (  # noqa: E402
    abs,  # noqa: A004
    all,  # noqa: A004
    any,  # noqa: A004
    asarray,
    astype,
    broadcast_arrays,
    empty,
    empty_like,
    eye,
    full,
    full_like,
    imag,
    max,  # noqa: A004
    mean,
    min,  # noqa: A004
    ones,
    ones_like,
    permute_dims,
    prod,
    real,
    reshape,
    round,  # noqa: A004
    squeeze,
    std,
    sum,  # noqa: A004
    transpose,
    var,
    zeros,
    zeros_like,
)
from . import kernels  # noqa: E402
from . import parallel  # noqa: E402
from . import jitops  # noqa: E402
from . import profiling  # noqa: E402
from .profiling import compiled  # noqa: E402
from . import linalg  # noqa: E402
from . import csgraph  # noqa: E402

from numpy import isdtype  # noqa: E402  (Array-API namespace member, reference numba_backend/__init__.py:354)

__version__ = "0.1.0"

__all__ = sorted(
    [
        "COO",
        "DOK",
        "GCXS",
        "SparseArray",
        "abs",
        "acos",
        "acosh",
        "add",
        "all",
        "any",
        "argmax",
        "argmin",
        "argwhere",
        "asCOO",
        "as_coo",
        "asarray",
        "asin",
        "asinh",
        "asnumpy",
        "astype",
        "atan",
        "atan2",
        "atanh",
        "bitwise_and",
        "bitwise_invert",
        "bitwise_left_shift",
        "bitwise_not",
        "bitwise_or",
        "bitwise_right_shift",
        "bitwise_xor",
        "bool",
        "broadcast_arrays",
        "broadcast_shapes",
        "broadcast_to",
        "can_cast",
        "ceil",
        "clip",
        "complex128",
        "complex64",
        "concat",
        "concatenate",
        "conj",
        "copysign",
        "cos",
        "cosh",
        "diagonal",
        "diagonalize",
        "diff",
        "divide",
        "dot",
        "e",
        "einsum",
        "elemwise",
        "empty",
        "empty_like",
        "equal",
        "exp",
        "expand_dims",
        "expm1",
        "eye",
        "finfo",
        "flip",
        "float16",
        "float32",
        "float64",
        "floor",
        "floor_divide",
        "full",
        "full_like",
        "greater",
        "greater_equal",
        "hypot",
        "iinfo",
        "imag",
        "inf",
        "int16",
        "int32",
        "int64",
        "int8",
        "interp",
        "isfinite",
        "isdtype",
        "isinf",
        "isnan",
        "isneginf",
        "isposinf",
        "kron",
        "less",
        "less_equal",
        "load_npz",
        "log",
        "log10",
        "log1p",
        "log2",
        "logaddexp",
        "logical_and",
        "logical_not",
        "logical_or",
        "logical_xor",
        "matmul",
        "matrix_transpose",
        "max",
        "maximum",
        "mean",
        "min",
        "minimum",
        "moveaxis",
        "multiply",
        "nan",
        "nanmax",
        "nanmean",
        "nanmin",
        "nanprod",
        "nanreduce",
        "nansum",
        "negative",
        "newaxis",
        "nextafter",
        "nonzero",
        "not_equal",
        "ones",
        "ones_like",
        "outer",
        "pad",
        "permute_dims",
        "pi",
        "positive",
        "pow",
        "prod",
        "random",
        "real",
        "reciprocal",
        "remainder",
        "repeat",
        "reshape",
        "result_type",
        "roll",
        "round",
        "save_npz",
        "sign",
        "signbit",
        "sin",
        "sinh",
        "sort",
        "sqrt",
        "square",
        "squeeze",
        "stack",
        "std",
        "subtract",
        "sum",
        "take",
        "tan",
        "tanh",
        "tensordot",
        "tile",
        "tril",
        "triu",
        "trunc",
        "uint16",
        "uint32",
        "uint64",
        "uint8",
        "unique_counts",
        "unique_values",
        "unstack",
        "var",
        "vecdot",
        "where",
        "zeros",
        "zeros_like",
    ]
)


def clip(a, min=None, max=None, out=None, *, a_min=None, a_max=None):
    """Clip values to the interval [min, max] (Array-API / reference
    ``_coo/common.py:1028`` signature; ``a_min``/``a_max`` accepted as
    numpy-style aliases)."""
    if a_min is not None:
        min = a_min
    if a_max is not None:
        max = a_max
    return a.clip(min=min, max=max, out=out)
