"""``SparseArray`` — the abstract base of all sparse formats.

Responsibilities (mirroring reference ``_sparse_array.py``):

- shape / fill_value validation and common properties (``nnz``, ``density``…)
- NumPy protocol dispatch: NEP-13 ``__array_ufunc__`` (``:322``), NEP-18
  ``__array_function__`` (``:282``), Array-API ``__array_namespace__``
  (``:952``)
- the generic fill-value-aware ``reduce`` driver (``:372-429``) and the stat
  reductions built on it (sum/max/any/all/min/prod/mean/var/std/…)

The concrete formats (COO, GCXS, DOK) implement ``_reduce_calc`` /
``_reduce_return`` plus storage-specific ops.
"""

from __future__ import annotations

import abc
import warnings
from collections.abc import Iterable
from numbers import Integral

import numpy as np

from .. import _settings
from .._utils import equivalent, normalize_axis, zero_of_dtype

# Reductions whose missing-fill-value correction has a closed form:
# reduce(op, fv repeated k times) == super_op(fv, k).
_reduce_super_ufunc = {np.add: np.multiply, np.multiply: np.power}


class SparseArray(np.lib.mixins.NDArrayOperatorsMixin):
    __array_priority__ = 12.5  # beat ndarray in binary ops

    def __init__(self, shape, fill_value=None):
        if not isinstance(shape, Iterable):
            shape = (shape,)
        if not all(isinstance(sh, Integral) and int(sh) >= 0 for sh in shape):
            raise ValueError(f"shape must be non-negative integers, got {shape}")
        self.shape = tuple(int(sh) for sh in shape)
        if fill_value is not None:
            if (
                not hasattr(fill_value, "dtype")
                or fill_value.dtype == self.dtype
                # flexible dtypes (str/bytes) carry their length in the dtype:
                # an empty-string fill (<U0) is valid for any <U_n array
                or (fill_value.dtype.kind == np.dtype(self.dtype).kind and fill_value.dtype.kind in "SU")
            ):
                self.fill_value = np.asarray(fill_value, dtype=self.dtype)[()]
            else:
                raise ValueError(f"fill_value dtype {fill_value.dtype} does not match array dtype {self.dtype}")
        else:
            self.fill_value = zero_of_dtype(self.dtype)

    # -- abstract storage interface ------------------------------------------------
    @property
    @abc.abstractmethod
    def dtype(self):  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def nnz(self):  # pragma: no cover - abstract
        raise NotImplementedError

    @abc.abstractmethod
    def todense(self):  # pragma: no cover - abstract
        raise NotImplementedError

    @abc.abstractmethod
    def asformat(self, format, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- common properties ---------------------------------------------------------
    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        out = 1
        for sh in self.shape:
            out *= sh
        return out

    @property
    def density(self):
        return self.nnz / self.size if self.size else float("nan")

    @property
    def device(self):
        data = getattr(self, "data", None)
        if data is not None and hasattr(data, "devices"):
            (dev,) = data.devices()
            return dev
        return "cpu"

    def to_device(self, device, /, *, stream=None):
        if device == "cpu" or device is self.device:
            return self
        import jax

        if isinstance(device, str):
            raise ValueError("Only `device='cpu'` or a jax.Device is supported.")
        return jax.device_put(self, device)

    # -- densification gate --------------------------------------------------------
    def _make_shallow_copy_of(self, other):
        self.__dict__ = other.__dict__.copy()

    def __array__(self, *args, **kwargs):
        from .coo import COO

        if not _settings.AUTO_DENSIFY:
            raise RuntimeError(
                "Cannot convert a sparse array to dense automatically. To manually densify, use the todense method."
            )
        x = self.todense() if not isinstance(self, COO) else self.todense()
        return np.asarray(x, *args, **kwargs)

    def _repr_html_(self):
        from .._utils import html_table

        return html_table(self)

    def __sizeof__(self):
        return self.nbytes

    # -- NEP-18: __array_function__ ------------------------------------------------
    def __array_function__(self, func, types, args, kwargs):
        import sparse_tpu

        if func is np.shape:
            return args[0].shape
        if func is np.ndim:
            return args[0].ndim
        if func is np.size:
            return args[0].size

        sparse_func = getattr(sparse_tpu, func.__name__, None)
        if sparse_func is None:
            sparse_func = getattr(type(self), func.__name__, None)
            if sparse_func is None:
                return NotImplemented
            if isinstance(sparse_func, property):
                return sparse_func.fget(args[0])
            # bound method path, e.g. np.transpose -> x.transpose
            return sparse_func(*args, **kwargs)
        try:
            return sparse_func(*args, **kwargs)
        except TypeError:
            return NotImplemented

    # -- NEP-13: __array_ufunc__ ---------------------------------------------------
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        from ..ops.elemwise import elemwise

        out = kwargs.pop("out", None)
        if out is not None and not all(isinstance(x, type(self)) for x in out):
            return NotImplemented

        if out is not None:
            # dry-run on 1-element dense stand-ins: surfaces numpy's casting
            # errors for an incompatible `out` dtype, then pins the result
            # dtype to out's (reference ``_sparse_array.py:330-339``)
            test_args = [np.empty((1,), dtype=a.dtype) if hasattr(a, "dtype") else a for a in inputs]
            test_kwargs = kwargs.copy()
            if method == "reduce":
                test_kwargs["axis"] = None
            test_out = tuple(np.empty((1,), dtype=a.dtype) for a in out)
            if len(test_out) == 1:
                test_out = test_out[0]
            getattr(ufunc, method)(*test_args, out=test_out, **test_kwargs)
            kwargs["dtype"] = out[0].dtype

        if ufunc is np.matmul and method == "__call__":
            from ..ops.dot import matmul

            if len(inputs) == 2:
                result = matmul(*inputs)
            else:
                return NotImplemented
        elif method == "__call__":
            if getattr(ufunc, "signature", None) is not None:
                return NotImplemented
            result = elemwise(ufunc, *inputs, **kwargs)
        elif method == "outer":
            # a.outer(b) == f(a[..., None, ...], b[None, ...]) via expand-dims
            if len(inputs) != 2:
                return NotImplemented
            a, b = inputs
            a = _asarray_any(a)
            b = _asarray_any(b)
            a_e = a[(Ellipsis,) + (None,) * np.ndim(b)] if isinstance(a, np.ndarray) else _expand_trailing(a, np.ndim(b))
            b_e = b[(None,) * np.ndim(a) + (Ellipsis,)] if isinstance(b, np.ndarray) else _expand_leading(b, np.ndim(a))
            result = elemwise(ufunc, a_e, b_e, **kwargs)
        elif method == "reduce":
            result = self._reduce(ufunc, *inputs, **kwargs)
            if result is NotImplemented:
                return NotImplemented
        else:
            return NotImplemented

        if out is not None:
            (out,) = out
            if out.shape != result.shape:
                raise ValueError(f"non-broadcastable output operand with shape {out.shape} doesn't match result shape")
            out._make_shallow_copy_of(result)
            return out
        return result

    @staticmethod
    def _reduce(method, *args, **kwargs):
        from .coo import COO

        assert len(args) == 1
        (self,) = args
        if isinstance(self, np.ndarray):
            self = COO.from_numpy(self)
        return self.reduce(method, **kwargs)

    # -- Array-API -----------------------------------------------------------------
    def __array_namespace__(self, *, api_version=None):
        if api_version is None:
            api_version = "2024.12"
        if api_version not in {"2021.12", "2022.12", "2023.12", "2024.12"}:
            raise ValueError(f'"{api_version}" Array API version not supported.')
        import sparse_tpu

        return sparse_tpu

    # -- generic reduce driver (fill-value algebra) --------------------------------
    def reduce(self, method, axis=(0,), keepdims=False, **kwargs):
        """Apply ``method`` (a numpy ufunc) as a reduction over ``axis``.

        Fill-value legality: the result's fill value is ``method.reduce([fv]*k)``
        for the k collapsed elements; this is only representable when
        ``method(fv, fv) == fv`` or when a closed-form "super ufunc" exists
        (add→multiply, multiply→power). Mirrors reference
        ``_sparse_array.py:372-429``.
        """
        axis = normalize_axis(axis, self.ndim)
        zero_reduce_result = method.reduce([self.fill_value, self.fill_value], **kwargs)
        reduce_super_ufunc = _reduce_super_ufunc.get(method)
        if not equivalent(zero_reduce_result, self.fill_value) and reduce_super_ufunc is None:
            raise ValueError(f"Performing this reduction operation would produce a dense result: {method!s}")

        if axis is None:
            axis = tuple(range(self.ndim))
        if not isinstance(axis, tuple):
            axis = (axis,)

        out = self._reduce_calc(method, axis, keepdims, **kwargs)

        if len(out) == 1:
            from .coo import COO

            res = out[0] if isinstance(out[0], SparseArray) else COO.from_numpy(np.asarray(out[0]))
            if keepdims:
                res = res.reshape((1,) * self.ndim)
            return res

        data, counts, axis, n_cols, arr_attrs = out
        result_fill_value = self.fill_value
        if reduce_super_ufunc is None:
            missing_counts = counts != n_cols
            data[missing_counts] = method(data[missing_counts], self.fill_value, **kwargs)
        elif method is np.add and np.all(self.fill_value == 0):
            # missing positions contribute fv*k = ±0.0, an add identity —
            # skip the three full-width passes (NaN fills don't take this
            # branch: NaN == 0 is False)
            result_fill_value = reduce_super_ufunc(self.fill_value, n_cols)
        else:
            data = method(data, reduce_super_ufunc(self.fill_value, n_cols - counts)).astype(data.dtype)
            result_fill_value = reduce_super_ufunc(self.fill_value, n_cols)

        result_fill_value = np.asarray(result_fill_value, dtype=np.asarray(data).dtype)[()]
        out = self._reduce_return(data, arr_attrs, result_fill_value)

        if keepdims:
            shape = list(self.shape)
            for ax in axis:
                shape[ax] = 1
            out = out.reshape(tuple(shape))

        if out.ndim == 0:
            from .coo import COO

            return COO.from_numpy(out.todense())

        return out

    # -- stat reductions -----------------------------------------------------------
    def sum(self, axis=None, keepdims=False, dtype=None, out=None):
        assert out is None
        return np.add.reduce(self, out=out, axis=axis, keepdims=keepdims, dtype=dtype)

    def max(self, axis=None, keepdims=False, out=None):
        assert out is None
        return np.maximum.reduce(self, out=out, axis=axis, keepdims=keepdims)

    def any(self, axis=None, keepdims=False, out=None):
        assert out is None
        return np.logical_or.reduce(self, out=out, axis=axis, keepdims=keepdims)

    def all(self, axis=None, keepdims=False, out=None):
        assert out is None
        return np.logical_and.reduce(self, out=out, axis=axis, keepdims=keepdims)

    def min(self, axis=None, keepdims=False, out=None):
        assert out is None
        return np.minimum.reduce(self, out=out, axis=axis, keepdims=keepdims)

    def prod(self, axis=None, keepdims=False, dtype=None, out=None):
        assert out is None
        return np.multiply.reduce(self, out=out, axis=axis, keepdims=keepdims, dtype=dtype)

    def mean(self, axis=None, keepdims=False, dtype=None, out=None):
        if axis is None:
            axis = tuple(range(self.ndim))
        elif not isinstance(axis, tuple):
            axis = (axis,)
        den = 1
        for ax in axis:
            den *= self.shape[ax]

        if dtype is None:
            if np.issubdtype(self.dtype, np.integer) or np.issubdtype(self.dtype, np.bool_):
                dtype = inter_dtype = np.dtype("f8")
            else:
                dtype = self.dtype
                inter_dtype = np.dtype("f4") if issubclass(dtype.type, np.float16) else dtype
        else:
            inter_dtype = dtype

        num = self.sum(axis=axis, keepdims=keepdims, dtype=inter_dtype)

        if num.ndim:
            out = np.true_divide(num, den, casting="unsafe")
            return out.astype(dtype) if out.dtype != dtype else out
        return np.divide(num, den, dtype=dtype, out=out)

    def var(self, axis=None, dtype=None, out=None, ddof=0, keepdims=False):
        axis = normalize_axis(axis, self.ndim)
        if axis is None:
            axis = tuple(range(self.ndim))
        if not isinstance(axis, tuple):
            axis = (axis,)

        rcount = 1
        for ax in axis:
            rcount *= self.shape[ax]
        if ddof >= rcount:
            warnings.warn("Degrees of freedom <= 0 for slice", RuntimeWarning, stacklevel=1)

        out_dtype = None
        if dtype is None and (np.issubdtype(self.dtype, np.integer) or np.issubdtype(self.dtype, np.bool_)):
            dtype = np.dtype("f8")
        elif dtype is None and np.issubdtype(self.dtype, np.floating) and np.dtype(self.dtype).itemsize < 8:
            # accumulate sub-f8 floats at f8 (numpy's pairwise f4 var is more
            # accurate than a naive f4 two-pass), cast back at the end
            dtype = np.dtype("f8")
            out_dtype = np.dtype(self.dtype)

        arrmean = self.sum(axis, dtype=dtype, keepdims=True)[...]
        np.divide(arrmean, rcount, out=arrmean)
        x = self.astype(dtype) - arrmean if out_dtype is not None else self - arrmean
        if np.issubdtype(self.dtype, np.complexfloating):
            x = x.real * x.real + x.imag * x.imag
        else:
            x = np.multiply(x, x, out=x)

        ret = x.sum(axis=axis, dtype=dtype, out=out, keepdims=keepdims)

        rcount = max([rcount - ddof, 0])
        ret = ret[...]
        np.divide(ret, rcount, out=ret, casting="unsafe")
        if out_dtype is not None:
            ret = ret.astype(out_dtype)
        return ret

    def std(self, axis=None, dtype=None, out=None, ddof=0, keepdims=False):
        ret = self.var(axis=axis, dtype=dtype, out=out, ddof=ddof, keepdims=keepdims)
        return np.sqrt(ret)

    def round(self, decimals=0, out=None):
        if out is not None and not isinstance(out, tuple):
            out = (out,)
        return self.__array_ufunc__(np.round, "__call__", self, decimals=decimals, out=out)

    round_ = round

    def clip(self, min=None, max=None, out=None):
        if min is None and max is None:
            raise ValueError("One of max or min must be given.")
        if out is not None and not isinstance(out, tuple):
            out = (out,)
        return self.__array_ufunc__(np.clip, "__call__", self, a_min=min, a_max=max, out=out)

    def astype(self, dtype, casting="unsafe", copy=True):
        if self.dtype == dtype and not copy:
            return self
        from ..ops.elemwise import elemwise

        return elemwise(np.ndarray.astype, self, dtype=dtype, casting=casting, copy=copy)

    @property
    def real(self):
        from ..ops.elemwise import elemwise

        return elemwise(np.real, self)

    @property
    def imag(self):
        from ..ops.elemwise import elemwise

        return elemwise(np.imag, self)

    def conj(self):
        from ..ops.elemwise import elemwise

        return elemwise(np.conj, self)

    def isnan(self):
        from ..ops.elemwise import elemwise

        return elemwise(np.isnan, self)

    def isinf(self):
        from ..ops.elemwise import elemwise

        return elemwise(np.isinf, self)

    def maybe_densify(self, max_size=1000, min_density=0.25):
        """Densify if small or dense enough, else raise (reference
        ``_sparse_array.py`` semantics)."""
        if self.size > max_size and self.density < min_density:
            raise ValueError("Operation would require converting large sparse array to dense")
        return self.todense()

    def todok(self):
        return self.asformat("dok")

    # -- scalar conversion ---------------------------------------------------------
    def _to_scalar(self, builtin):
        if self.size != 1 or self.shape != ():
            raise ValueError(f"{builtin.__name__} must be called on an array with one element.")
        return builtin(self.todense().flatten()[0])

    def __bool__(self):
        return self._to_scalar(bool)

    def __float__(self):
        return self._to_scalar(float)

    def __int__(self):
        return self._to_scalar(int)

    def __index__(self):
        return self._to_scalar(int)

    def __matmul__(self, other):
        from ..ops.dot import matmul

        try:
            return matmul(self, other)
        except NotImplementedError:
            return NotImplemented

    def __rmatmul__(self, other):
        from ..ops.dot import matmul

        try:
            return matmul(other, self)
        except NotImplementedError:
            return NotImplemented


def _asarray_any(x):
    if isinstance(x, SparseArray):
        return x
    return np.asarray(x)


def _expand_trailing(a, k):
    out = a
    for _ in range(k):
        out = out[..., None]
    return out


def _expand_leading(b, k):
    out = b
    for _ in range(k):
        out = out[None, ...]
    return out
