"""End-to-end sparse transformer block: banded (sliding-window) attention +
a block-sparse MLP, trained with jax.grad — the library's full nn stack in
one jitted training step. Attention runs as MXU block tiles (O(L·W·d)),
the MLP weight is BSR contracted by the Pallas kernel on TPU, and the
backward pass flows through the custom BSR VJP.

No analogue exists in the reference (a numpy array library)."""

import numpy as np

import jax
import jax.numpy as jnp

from utils import CI_MODE, use_cpu_if_requested

use_cpu_if_requested()

from sparse_tpu.nn import (
    banded_attention,
    block_sparse_linear,
    init_block_sparse_linear,
)

L = 256 if CI_MODE else 2048
D = 128
WINDOW = 16 if CI_MODE else 128
STEPS = 5
LR = 1e-2


def init_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mlp = init_block_sparse_linear(k4, D, D, block_density=0.5)
    # trainable float leaves only; the BSR layout (int block ids) is static
    params = {
        "wq": jax.random.normal(k1, (D, D), jnp.float32) * 0.05,
        "wk": jax.random.normal(k2, (D, D), jnp.float32) * 0.05,
        "wv": jax.random.normal(k3, (D, D), jnp.float32) * 0.05,
        "mlp_blocks": mlp.blocks,
        "mlp_bias": mlp.bias,
    }
    return params, mlp


def block(params, layout, x):
    q, k, v = x @ params["wq"], x @ params["wk"], x @ params["wv"]
    a = banded_attention(q, k, v, window=WINDOW, causal=True)
    h = x + a  # residual
    mlp = layout._replace(blocks=params["mlp_blocks"], bias=params["mlp_bias"])
    m = jax.nn.gelu(block_sparse_linear(mlp, h))
    return h + m


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    params, layout = init_params(jax.random.PRNGKey(0))

    def loss_fn(params):
        return jnp.mean((block(params, layout, x) - target) ** 2)

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(lambda p, g: p - LR * g, params, grads)
        return params, loss

    losses = []
    for _ in range(STEPS):
        params, loss = step(params)
        losses.append(float(loss))
    print("losses:", [f"{l:.4f}" for l in losses])
    assert losses[-1] < losses[0], "loss did not decrease"
    assert all(np.isfinite(losses)), "non-finite loss"
    print("OK: sparse transformer block trains (attention + BSR MLP, one jitted step)")


if __name__ == "__main__":
    main()
