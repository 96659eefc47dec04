"""Sparse (sliding-window + global tokens) attention built from the
library's three matmul-family kernels — SDDMM for the masked scores,
segment softmax over the stored pattern, SpMM for the value contraction —
so memory and compute are O(nnz·d) instead of O(L²).

No analogue exists in the reference (a numpy array library); this is the
TPU-native payoff of the kernel layer for long-context model serving."""

import numpy as np

import jax
import jax.numpy as jnp

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

from sparse_tpu.nn import banded_attention, local_attention_pattern, longformer_attention, sparse_attention

L = 512 if CI_MODE else 8192
WINDOW = 32 if CI_MODE else 256
N_GLOBAL = 4
D = 64


def main():
    rng = np.random.default_rng(0)
    rows, cols = local_attention_pattern(L, WINDOW, N_GLOBAL)
    q = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    rows_j, cols_j = jnp.asarray(rows), jnp.asarray(cols)

    fn = jax.jit(sparse_attention)
    out = np.asarray(fn(q, k, v, rows_j, cols_j))

    # dense oracle
    mask = np.full((L, L), -np.inf, np.float32)
    mask[rows, cols] = 0.0
    scores = np.asarray(q) @ np.asarray(k).T / np.sqrt(D) + mask
    attn = np.exp(scores - scores.max(axis=1, keepdims=True))
    attn /= attn.sum(axis=1, keepdims=True)
    expected = attn @ np.asarray(v)
    np.testing.assert_allclose(out, expected, atol=3e-5)
    print(f"sparse attention OK: L={L} window={WINDOW} global={N_GLOBAL} edges={rows.size} "
          f"({rows.size / (L * L):.2%} of dense)")

    # MXU-tiled fast form of the SAME window+global pattern
    lf_fn = jax.jit(lambda q_, k_, v_: longformer_attention(q_, k_, v_, window=WINDOW, n_global=N_GLOBAL))
    fast = np.asarray(lf_fn(q, k, v))
    np.testing.assert_allclose(fast, expected, atol=3e-5)
    print("longformer fast form matches the dense oracle")

    if not CI_MODE:
        benchmark(fn, (q, k, v, rows_j, cols_j), "sparse attention (COO general)", 10)
        band_fn = jax.jit(lambda q_, k_, v_: banded_attention(q_, k_, v_, window=WINDOW))
        benchmark(band_fn, (q, k, v), "banded attention (window only)", 10)
        benchmark(lf_fn, (q, k, v), "longformer attention (window+global)", 10)


if __name__ == "__main__":
    main()
