"""Profiling and timing helpers — the observability slot (SURVEY §5).

The reference measures wall clock around compiled Finch calls
(``examples/utils.py:9-31``); here the equivalents are device-aware:

- :func:`benchmark` — compile-then-time a jitted callable with a proper
  device sync (scan-loop timing recommended over remote runtimes).
- :func:`nnz_throughput` — per-kernel nnz/s counter.
- :func:`trace` — context manager wrapping ``jax.profiler`` for TPU traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


def benchmark(fn, args, iters=10, warmup=1):
    """Median-free simple timing: run ``fn(*args)`` ``iters`` times after
    ``warmup`` compile/warm calls; returns seconds per call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def nnz_throughput(seconds_per_call, nnz):
    """Stored-entries-per-second for a kernel timing."""
    return nnz / seconds_per_call


@contextlib.contextmanager
def trace(log_dir="/tmp/sparse_tpu_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def compiled(fn, **jit_kwargs):
    """Compile a function over sparse pytrees — the analogue of the
    reference Finch backend's lazy fused mode (``sparse.compiled``).

    The function must stay within the traceable subset: fixed-nnz
    transformations and the kernels in ``sparse_tpu.kernels``
    (matmul/SDDMM/MTTKRP/reductions over ``COO``/``GCXS`` pytree leaves).
    Data-dependent-size ops (general ``__getitem__``, ``unique``, elemwise
    union over differing patterns) are eager-only.
    """
    return jax.jit(fn, **jit_kwargs)
