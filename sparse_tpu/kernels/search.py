"""TPU-friendly searchsorted for sorted probe arrays.

Every lowering JAX offers loses on TPU at scale (r4 measurements, 2.8M
probes into 429k keys):

- default ``method='scan'``: a while_loop of scalar gathers at the
  ~140 M/s issue bound (~460 ms);
- ``method='sort'``: internally inverts a permutation with
  ``zeros.at[argsort(x)].set(iota)`` — an XLA scatter, which SERIALIZES
  on TPU (~495 ms);
- ``method='compare_all'``: O(keys x probes) comparisons.

When the probes are themselves SORTED AND UNIQUE (the package's uses are
all ``arange``-like: slot ids, product ids, segment ids), the rank of a
probe among its own kind is just its index, so one stable double-argsort
of ``concat(keys, probes)`` — two vectorized TPU sorts, no scatter —
gives the answer: ~11 ms for the case above (45x).
"""

from __future__ import annotations

import jax.numpy as jnp


def searchsorted_sorted_probes(keys, probes, side="left"):
    """``jnp.searchsorted(keys, probes, side)`` for probes that are sorted
    and unique (e.g. ``jnp.arange``).  keys must be sorted (ties fine)."""
    n_p = probes.shape[0]
    n_k = keys.shape[0]
    if n_p == 0:
        return jnp.zeros(0, dtype=jnp.int64)
    dt = jnp.promote_types(keys.dtype, probes.dtype)
    keys = keys.astype(dt)
    probes = probes.astype(dt)
    if side == "left":
        # stable sort places probes BEFORE equal keys
        z = jnp.concatenate([probes, keys])
        order = jnp.argsort(z, stable=True)
        rank = jnp.argsort(order, stable=True)  # scatter-free inverse perm
        return rank[:n_p] - jnp.arange(n_p, dtype=rank.dtype)
    # side == 'right': probes AFTER equal keys
    z = jnp.concatenate([keys, probes])
    order = jnp.argsort(z, stable=True)
    rank = jnp.argsort(order, stable=True)
    return rank[n_k:] - jnp.arange(n_p, dtype=rank.dtype)
