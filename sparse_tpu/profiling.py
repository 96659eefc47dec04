"""Profiling and timing helpers — the observability slot (SURVEY §5).

The reference measures wall clock around compiled Finch calls
(``examples/utils.py:9-31``); here the equivalents are device-aware:

- :func:`benchmark` — scan-loop device timing with host-RTT calibration,
  truthful over remote/tunneled runtimes where ``block_until_ready`` is not
  a reliable sync point.
- :func:`nnz_throughput` — per-kernel nnz/s counter.
- :func:`trace` — context manager wrapping ``jax.profiler`` for TPU traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def _default_perturb(args, i):
    """Add a loop-dependent float epsilon to every floating leaf so XLA
    cannot hoist loop-invariant work (gathers included) out of the scan.

    ``i.astype(f32) * 1e-6`` survives constant folding; integer ``i - i``
    would not (docs/spmm_roofline.md, "Measurement discipline")."""
    eps = i.astype(jnp.float32) * 1e-6

    def bump(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf + eps.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map(bump, args)


def benchmark(fn, args, iters=50, warmup=1, perturb=_default_perturb):
    """Seconds per call of ``fn(*args)``, measured device-side.

    Runs ``iters`` iterations inside ONE jitted ``lax.scan`` whose inputs
    are perturbed per iteration (so no iteration can be hoisted or CSE'd),
    fetches a single scalar to force synchronisation, and subtracts the
    host↔device round-trip calibrated with an empty jitted fetch.  This is
    the only truthful timing strategy over tunneled/remote runtimes, where
    ``block_until_ready`` returns before device work completes and every
    fetch pays a fixed RTT.

    ``fn`` must be traceable (it is jitted here); ``perturb(args, i)``
    receives the args pytree and the loop counter and must return perturbed
    args — the default adds ``i * 1e-6`` to every float leaf.  Pass
    ``perturb=None`` to time with strictly invariant inputs (only safe if
    you have checked the compiled loop body against LICM).
    """
    if perturb is None:
        perturb = lambda a, i: a  # noqa: E731

    @jax.jit
    def run(*a):
        def body(carry, i):
            out = fn(*perturb(a, i))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.asarray(leaf, jnp.float32).ravel()[0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    @jax.jit
    def _empty(x):
        return x + 1.0

    float(_empty(jnp.float32(0)))  # compile the calibration probe
    rtt = min(
        _timed(lambda: float(_empty(jnp.float32(0)))) for _ in range(3)
    )

    for _ in range(max(warmup, 1)):
        float(run(*args))  # compile + warm
    total = _timed(lambda: float(run(*args)))
    return max(total - rtt, total * 0.1) / iters


def _timed(thunk):
    start = time.perf_counter()
    thunk()
    return time.perf_counter() - start


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
