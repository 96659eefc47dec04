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

from sparse_tpu.nn import banded_attention, local_attention_pattern, sparse_attention

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

    # banded fast form (window-only pattern, dense MXU block tiles)
    rows_w, cols_w = local_attention_pattern(L, WINDOW)
    oracle = np.asarray(jax.jit(sparse_attention)(q, k, v, jnp.asarray(rows_w), jnp.asarray(cols_w)))
    band_fn = jax.jit(lambda q_, k_, v_: banded_attention(q_, k_, v_, window=WINDOW))
    band = np.asarray(band_fn(q, k, v))
    np.testing.assert_allclose(band, oracle, atol=3e-5)
    print("banded fast form matches the COO/segment form")

    if not CI_MODE:
        benchmark(fn, (q, k, v, rows_j, cols_j), "sparse attention (COO general)", 10)
        benchmark(band_fn, (q, k, v), "banded attention (MXU block tiles)", 10)


if __name__ == "__main__":
    main()
