"""End-to-end differentiable sparse workload: a 2-layer graph convolution
(GCN) trained with ``jax.grad`` where the adjacency matrix lives in our COO
pytree and the propagation runs through ``sparse_tpu.kernels.coo_spmm``.

Nothing like this exists in the reference (a numpy library with no
autodiff); it demonstrates the TPU-native payoff of pytree containers +
pure kernels: the full training step — two SpMM propagations, dense
feature transforms, softmax loss, gradients, SGD update — compiles to one
XLA program.
"""

import numpy as np

import jax
import jax.numpy as jnp

from utils import CI_MODE, benchmark, use_cpu_if_requested

use_cpu_if_requested()

import sparse_tpu as sparse
from sparse_tpu.kernels import coo_spmm

N_NODES = 500 if CI_MODE else 5000
N_FEATS = 32
N_HIDDEN = 64
N_CLASSES = 7
DENSITY = 0.002
ITERS = 3


def main():
    rng = np.random.default_rng(0)
    # symmetric normalized adjacency with self loops (the GCN propagation op)
    g = sparse.random((N_NODES, N_NODES), density=DENSITY, random_state=0)
    adj = ((g + g.T) > 0).astype(np.float64) + sparse.eye(N_NODES)
    deg = np.asarray(adj.sum(axis=1).todense())
    dinv = 1.0 / np.sqrt(deg)
    a_hat = adj * dinv[:, None] * dinv[None, :]  # sparse x dense broadcasting

    rows = jnp.asarray(np.asarray(a_hat.coords[0]))
    cols = jnp.asarray(np.asarray(a_hat.coords[1]))
    vals = jnp.asarray(np.asarray(a_hat.data))

    x = jnp.asarray(rng.random((N_NODES, N_FEATS)))
    labels = jnp.asarray(rng.integers(0, N_CLASSES, N_NODES))
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.1, (N_FEATS, N_HIDDEN))),
        "w2": jnp.asarray(rng.normal(0, 0.1, (N_HIDDEN, N_CLASSES))),
    }

    def forward(params, rows, cols, vals, x):
        h = coo_spmm(rows, cols, vals, x @ params["w1"], n_rows=N_NODES)
        h = jax.nn.relu(h)
        logits = coo_spmm(rows, cols, vals, h @ params["w2"], n_rows=N_NODES)
        return logits

    def loss_fn(params, rows, cols, vals, x, labels):
        logits = forward(params, rows, cols, vals, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    @jax.jit
    def train_step(params, rows, cols, vals, x, labels, lr=0.5):
        loss, grads = jax.value_and_grad(loss_fn)(params, rows, cols, vals, x, labels)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    losses = []
    for _ in range(20):
        params, loss = train_step(params, rows, cols, vals, x, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print(f"GCN loss {losses[0]:.4f} -> {losses[-1]:.4f} over 20 jitted steps (n={N_NODES}, nnz={a_hat.nnz})")

    benchmark(
        lambda p, r, c, v, xx, ll: train_step(p, r, c, v, xx, ll)[1],
        (params, rows, cols, vals, x, labels),
        f"sparse_tpu GCN train step n={N_NODES}",
        ITERS,
    )
    print("OK: loss decreases under jitted sparse training")


if __name__ == "__main__":
    main()
