"""Shared example harness (mirrors reference ``examples/utils.py``): run a
jitted workload once to compile, then time it device-side; CI_MODE skips the
timing but keeps the correctness asserts."""

from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CI_MODE = bool(int(os.getenv("CI_MODE", default="0")))


def use_cpu_if_requested():
    # examples validate against float64 oracles, so they default to the CPU
    # backend; set EXAMPLES_TPU=1 to run the jitted kernels on an accelerator
    if os.getenv("EXAMPLES_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")


def benchmark(func, args, info, iters):
    """Compile + run ``func`` once, then time ``iters`` executions.

    ``func`` must be a jitted callable; timing loops on-device via repeated
    dispatch with a final block."""
    result = jax.block_until_ready(func(*args))

    if CI_MODE:
        print("CI mode - skipping benchmark")
        return result

    print(info)
    start = time.time()
    for _ in range(iters):
        result = func(*args)
    jax.block_until_ready(result)
    elapsed = time.time() - start
    print(f"Took {elapsed / iters} s.\n")
    return result
