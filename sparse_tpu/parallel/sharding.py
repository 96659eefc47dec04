"""Multi-chip execution: mesh-sharded sparse operands + collective matmul.

The reference has **no** distributed layer (SURVEY §2.4); this module is the
new TPU-native scaling design:

- the sparse operand is **row-block partitioned** across a 1-D mesh axis,
  with per-shard nnz padded to a common static capacity (padding entries
  carry ``data == 0`` so they are no-ops under additive kernels);
- the dense operand is either replicated (small N) or **K-sharded and
  rotated around the ring** with ``jax.lax.ppermute`` — the
  ring-attention-shaped schedule applied to SpMM: at each of the D steps a
  shard contracts the column-block of its local rows that matches the dense
  block currently resident, while the next block is in flight over ICI;
- epilogues (full-array reductions) use ``psum``.

Everything is expressed with ``shard_map`` over ``jax.sharding.Mesh`` so XLA
schedules the collectives; no per-device code.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="x", devices=None):
    """1-D device mesh over the first ``n_devices`` devices.

    When the default platform has fewer than ``n_devices`` (e.g. one real
    TPU chip behind a tunnel that overrides ``JAX_PLATFORMS``), falls back
    to the host CPU platform, whose device count is controlled by
    ``--xla_force_host_platform_device_count`` — the simulated-pod testing
    path (SURVEY §4)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(f"requested {n_devices} devices, only {len(devices)} available on any platform")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PartitionedCOO:
    """A 2-D COO matrix row-block partitioned over a mesh axis.

    Arrays have a leading shard dimension of size ``n_shards`` and are laid
    out so that sharding dim 0 over the mesh places each row block on its
    device. ``rows`` are *local* (relative to the shard's row offset).
    Padding entries have ``valid == False`` and ``data == 0``.
    """

    rows: jax.Array  # (n_shards, cap) int32, local row ids
    cols: jax.Array  # (n_shards, cap) int32, global col ids
    data: jax.Array  # (n_shards, cap)
    shape: tuple  # global (M, K) — static
    block_rows: int  # rows per shard (static; last shard may be ragged→padded)

    def tree_flatten(self):
        return (self.rows, self.cols, self.data), (self.shape, self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, cols, data = children
        shape, block_rows = aux
        return cls(rows, cols, data, shape, block_rows)

    @property
    def n_shards(self):
        return self.rows.shape[0]


def partition_coo_rows(coo, n_shards, mesh=None, axis_name="x", balance="rows"):
    """Partition a 2-D COO array into ``n_shards`` row blocks.

    ``balance="rows"`` splits the row space evenly. ``balance="nnz"`` picks
    row boundaries that equalize stored entries per shard (SURVEY §7.4-6:
    skewed matrices otherwise leave most chips idle); shards then cover
    unequal row ranges, all padded to a common ``block_rows``, and local row
    ids are relative to each shard's own start (``row_starts``).

    Each shard's nnz is padded to the global max (static capacity). Returns
    a :class:`PartitionedCOO`; if ``mesh`` is given, the leaves are placed
    with a ``(axis_name, None)`` sharding so shard i lives on device i.
    """
    from ..core.coo import COO

    if not isinstance(coo, COO):
        coo = coo.asformat("coo")
    if coo.ndim != 2:
        raise ValueError("partition_coo_rows requires a 2-D array")
    M, K = coo.shape
    rows = np.asarray(coo.coords[0]).astype(np.int64)
    cols = np.asarray(coo.coords[1]).astype(np.int64)
    data = np.asarray(coo.data)

    if balance == "nnz" and rows.size:
        # boundaries at equal-nnz quantiles of the (sorted) row stream,
        # snapped to row edges
        targets = (np.arange(1, n_shards) * rows.size) // n_shards
        boundary_rows = np.minimum(rows[targets] + 1, M)
        row_starts = np.concatenate([[0], np.sort(boundary_rows)]).astype(np.int64)
        shard_of = np.searchsorted(row_starts, rows, side="right") - 1
        extents = np.diff(np.concatenate([row_starts, [M]]))
        block_rows = max(int(extents.max()), 1)
        counts = np.bincount(shard_of, minlength=n_shards)
        cap = max(int(counts.max()), 1)
        out_rows = np.zeros((n_shards, cap), dtype=np.int32)
        out_cols = np.zeros((n_shards, cap), dtype=np.int32)
        out_data = np.zeros((n_shards, cap), dtype=data.dtype)
        for s in range(n_shards):
            sel = shard_of == s
            k = int(counts[s])
            out_rows[s, :k] = (rows[sel] - row_starts[s]).astype(np.int32)
            out_cols[s, :k] = cols[sel].astype(np.int32)
            out_data[s, :k] = data[sel]
        pcoo = PartitionedCOO(out_rows, out_cols, out_data, (M, K), block_rows)
        pcoo.row_starts = row_starts
        if mesh is not None:
            sh = NamedSharding(mesh, P(axis_name, None))
            pcoo = PartitionedCOO(
                jax.device_put(jnp.asarray(out_rows), sh),
                jax.device_put(jnp.asarray(out_cols), sh),
                jax.device_put(jnp.asarray(out_data), sh),
                (M, K),
                block_rows,
            )
            pcoo.row_starts = row_starts
        return pcoo

    block_rows = -(-M // n_shards)
    shard_of = rows // block_rows
    counts = np.bincount(shard_of, minlength=n_shards)
    cap = max(int(counts.max()), 1)

    out_rows = np.zeros((n_shards, cap), dtype=np.int32)
    out_cols = np.zeros((n_shards, cap), dtype=np.int32)
    out_data = np.zeros((n_shards, cap), dtype=data.dtype)
    for s in range(n_shards):
        sel = shard_of == s
        k = int(counts[s])
        out_rows[s, :k] = (rows[sel] - s * block_rows).astype(np.int32)
        out_cols[s, :k] = cols[sel].astype(np.int32)
        out_data[s, :k] = data[sel]

    pcoo = PartitionedCOO(out_rows, out_cols, out_data, (M, K), block_rows)
    if mesh is not None:
        sh = NamedSharding(mesh, P(axis_name, None))
        pcoo = PartitionedCOO(
            jax.device_put(jnp.asarray(out_rows), sh),
            jax.device_put(jnp.asarray(out_cols), sh),
            jax.device_put(jnp.asarray(out_data), sh),
            (M, K),
            block_rows,
        )
    return pcoo


def random_partitioned(
    shape,
    density=None,
    *,
    nnz=None,
    n_shards,
    mesh=None,
    axis_name="x",
    random_state=None,
    data_rvs=None,
    dtype=np.float64,
):
    """Generate a random row-block-partitioned 2-D COO **shard-directly** —
    the global (rows, cols, data) triplet is never materialized, so the
    array can exceed single-host memory (the constructor a pod-scale run
    needs; ``partition_coo_rows`` by contrast starts from a host COO).

    Distribution matches ``sparse_tpu.random``: exactly
    ``nnz = round(density * M * K)`` cells drawn uniformly without
    replacement, split across row blocks by a multivariate hypergeometric
    (the exact law of a uniform global sample restricted to blocks), then
    sampled independently inside each block.
    """
    from .._utils import _sample_without_replacement

    M, K = shape
    elements = M * K
    if density is not None and nnz is not None:
        raise ValueError("'density' and 'nnz' are mutually exclusive")
    if density is None and nnz is None:
        density = 0.01
    if nnz is None:
        nnz = int(round(elements * density))
    if not (0 <= nnz <= elements):
        raise ValueError(f"cannot generate {nnz} samples from {elements} elements")
    rng = random_state if isinstance(random_state, np.random.Generator) else np.random.default_rng(random_state)

    block_rows = -(-M // n_shards)
    extents = np.minimum(block_rows, M - block_rows * np.arange(n_shards)).clip(min=0)
    cells = (extents * K).astype(np.int64)
    if nnz:
        counts = rng.multivariate_hypergeometric(cells, nnz)
    else:
        counts = np.zeros(n_shards, dtype=np.int64)
    cap = max(int(counts.max()), 1)

    out_rows = np.zeros((n_shards, cap), dtype=np.int32)
    out_cols = np.zeros((n_shards, cap), dtype=np.int32)
    out_data = np.zeros((n_shards, cap), dtype=dtype)
    for s in range(n_shards):
        k = int(counts[s])
        if not k:
            continue
        lin = _sample_without_replacement(rng, int(cells[s]), k)
        out_rows[s, :k] = (lin // K).astype(np.int32)
        out_cols[s, :k] = (lin % K).astype(np.int32)
        out_data[s, :k] = (data_rvs(k) if data_rvs is not None else rng.random(k)).astype(dtype, copy=False)

    pcoo = PartitionedCOO(out_rows, out_cols, out_data, (M, K), block_rows)
    if mesh is not None:
        sh = NamedSharding(mesh, P(axis_name, None))
        pcoo = PartitionedCOO(
            jax.device_put(jnp.asarray(out_rows), sh),
            jax.device_put(jnp.asarray(out_cols), sh),
            jax.device_put(jnp.asarray(out_data), sh),
            (M, K),
            block_rows,
        )
    return pcoo


@functools.cache
def _spmm_replicated_fn(mesh, axis_name, block_rows):
    def local(rows, cols, data, b):
        # rows/cols/data: (k, cap) — k shards resident on this device
        # (k > 1 when there are more shards than devices); vmap keeps each
        # shard's row block separate
        def one(r, c, d_):
            prod = d_[:, None] * jnp.take(b, c, axis=0)
            return jax.ops.segment_sum(prod, r, num_segments=block_rows)

        return jax.vmap(one, in_axes=(0, 0, 0))(rows, cols, data)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None), P()),
            out_specs=P(axis_name, None, None),
        )
    )


def spmm_replicated(pcoo, dense, mesh, axis_name="x"):
    """Sharded SpMM with the dense operand replicated on every device.

    out rows are sharded over the mesh; no communication beyond the input
    broadcast. Best when ``dense`` is small (tall-skinny N). The jitted
    shard_map is cached per (mesh, axis, block_rows); repeated calls with
    the same shapes reuse the compiled executable."""
    f = _spmm_replicated_fn(mesh, axis_name, pcoo.block_rows)
    out = f(pcoo.rows, pcoo.cols, pcoo.data, dense)
    n_shards = pcoo.n_shards
    row_starts = getattr(pcoo, "row_starts", None)
    if row_starts is not None:
        # nnz-balanced shards cover ragged row ranges; stitch the valid
        # prefix of each shard's padded output block
        extents = np.diff(np.concatenate([row_starts, [pcoo.shape[0]]]))
        return jnp.concatenate([out[s, : int(e)] for s, e in enumerate(extents)], axis=0)
    return out.reshape(n_shards * pcoo.block_rows, dense.shape[1])[: pcoo.shape[0]]


def bucket_columns(pcoo, n_buckets):
    """Re-bucket a PartitionedCOO's entries by column block, padding each
    (shard, bucket) to a common static capacity — the layout the ring
    schedule consumes. Host-side preprocessing (one-time per matrix)."""
    n_shards, cap = pcoo.rows.shape
    M, K = pcoo.shape
    block_cols = -(-K // n_buckets)
    rows = np.asarray(pcoo.rows)
    cols = np.asarray(pcoo.cols)
    data = np.asarray(pcoo.data)

    bucket_of = cols // block_cols
    caps = np.zeros((n_shards, n_buckets), dtype=np.int64)
    for s in range(n_shards):
        caps[s] = np.bincount(bucket_of[s][data[s] != 0], minlength=n_buckets)
    bcap = max(int(caps.max()), 1)

    out_rows = np.zeros((n_shards, n_buckets, bcap), dtype=np.int32)
    out_cols = np.zeros((n_shards, n_buckets, bcap), dtype=np.int32)
    out_data = np.zeros((n_shards, n_buckets, bcap), dtype=data.dtype)
    for s in range(n_shards):
        for b in range(n_buckets):
            sel = (bucket_of[s] == b) & (data[s] != 0)
            k = int(sel.sum())
            out_rows[s, b, :k] = rows[s][sel]
            out_cols[s, b, :k] = cols[s][sel] - b * block_cols  # local col ids
            out_data[s, b, :k] = data[s][sel]
    return out_rows, out_cols, out_data, block_cols


@functools.cache
def _spmm_ring_fn(mesh, axis_name, block_rows):
    def local(rows, cols, data, b_block):
        # rows/cols/data: (1, n_buckets, bcap); b_block: (block_cols_pad, N) local K block
        rows = rows[0]
        cols = cols[0]
        data = data[0]
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.axis_size(axis_name)

        def step(i, carry):
            acc, blk = carry
            # bucket currently resident on this device after i rotations
            bucket = (idx + i) % n_dev
            r = jnp.take(rows, bucket, axis=0)
            c = jnp.take(cols, bucket, axis=0)
            d = jnp.take(data, bucket, axis=0)
            prod = d[:, None] * jnp.take(blk, c, axis=0)
            acc = acc + jax.ops.segment_sum(prod, r, num_segments=block_rows)
            blk = jax.lax.ppermute(blk, axis_name, [(j, (j - 1) % n_dev) for j in range(n_dev)])
            return acc, blk

        n_loc = b_block.shape[-1]
        acc = jnp.zeros((block_rows, n_loc), dtype=jnp.promote_types(data.dtype, b_block.dtype))
        # mark the accumulator as device-varying so the carry types match
        # after the ppermute makes the rotating block varying over the mesh
        acc = jax.lax.pcast(acc, (axis_name,), to="varying")
        acc, _ = jax.lax.fori_loop(0, n_dev, step, (acc, b_block))
        return acc[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis_name, None, None),
                P(axis_name, None, None),
                P(axis_name, None, None),
                P(axis_name, None),
            ),
            out_specs=P(axis_name, None, None),
        )
    )


def spmm_ring(bucketed, pcoo_shape, block_rows, dense_sharded, mesh, axis_name="x"):
    """Ring SpMM: dense operand K-sharded; each step contracts the local
    column bucket matching the resident dense block, then rotates the block
    to the next device with ``ppermute`` (overlapped by XLA with the next
    step's compute). Jitted shard_map cached per (mesh, axis, block_rows)."""
    out_rows, out_cols, out_data, block_cols = bucketed
    n_shards = out_rows.shape[0]
    M, K = pcoo_shape
    N = dense_sharded.shape[-1]
    f = _spmm_ring_fn(mesh, axis_name, block_rows)
    out = f(jnp.asarray(out_rows), jnp.asarray(out_cols), jnp.asarray(out_data), dense_sharded)
    return out.reshape(n_shards * block_rows, N)[:M]


def bucket_columns_ell(coo, n_shards, n_buckets=None, block_rows_ell=128):
    """Host-side partitioner for :func:`spmm_ring_ell`: row-partition a 2-D
    COO matrix into shards, then bucket each shard's entries by column
    block, laying every (shard, bucket) out in block-ELL form over the
    shard's local 128-row blocks (common capacity).  Returns
    ``(e_rows, e_cols, e_data, block_rows, block_cols)`` with the arrays
    shaped ``(n_shards, n_buckets, n_blocks, cap)``; ``e_cols`` are LOCAL
    within the bucket."""
    from ..kernels.ell import build_block_ell

    if n_buckets is None:
        n_buckets = n_shards
    coords = np.asarray(coo.coords)
    data = np.asarray(coo.data)
    n_rows, n_cols = coo.shape
    block_rows = -(-n_rows // n_shards)
    block_rows = -(-block_rows // block_rows_ell) * block_rows_ell
    block_cols = -(-n_cols // n_buckets)
    shard_of = np.minimum(coords[0] // block_rows, n_shards - 1)
    bucket_of = np.minimum(coords[1] // block_cols, n_buckets - 1)
    parts = {}
    cap = 1
    nb = block_rows // block_rows_ell
    for s in range(n_shards):
        for b in range(n_buckets):
            sel = (shard_of == s) & (bucket_of == b)
            p = build_block_ell(
                coords[0][sel] - s * block_rows,
                coords[1][sel] - b * block_cols,
                data[sel],
                block_rows,
                block_cols,
                block_rows=block_rows_ell,
            )
            parts[s, b] = p
            cap = max(cap, int(p.e_cols.shape[1]))
    e_rows = np.zeros((n_shards, n_buckets, nb, cap), dtype=np.int32)
    e_cols = np.zeros((n_shards, n_buckets, nb, cap), dtype=np.int32)
    e_data = np.zeros((n_shards, n_buckets, nb, cap), dtype=data.dtype)
    for (s, b), p in parts.items():
        w = p.e_cols.shape[1]
        e_rows[s, b, :, :w] = np.asarray(p.e_rows)
        e_cols[s, b, :, :w] = np.asarray(p.e_cols)
        e_data[s, b, :, :w] = np.asarray(p.e_data)
    return e_rows, e_cols, e_data, block_rows, block_cols


@functools.cache
def _spmm_ring_ell_fn(mesh, axis_name, block_rows, block_rows_ell):
    from ..kernels.ell import ell_spmm

    def local(er, ec, ed, b_block):
        # er/ec/ed: (1, n_buckets, nb, cap); b_block: (block_cols_pad, N)
        er = er[0]
        ec = ec[0]
        ed = ed[0]
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.axis_size(axis_name)

        def step(i, carry):
            acc, blk = carry
            bucket = (idx + i) % n_dev
            r = jnp.take(er, bucket, axis=0)
            c = jnp.take(ec, bucket, axis=0)
            d = jnp.take(ed, bucket, axis=0)
            # one-hot MXU block scatter — no segment_sum (XLA scatter
            # serializes on TPU hardware: 18.9 vs 3.9 ms at a 1M-nnz
            # shard, docs/scaling.md)
            acc = acc + ell_spmm(r, c, d, blk, n_rows=block_rows, block_rows=block_rows_ell)
            blk = jax.lax.ppermute(blk, axis_name, [(j, (j - 1) % n_dev) for j in range(n_dev)])
            return acc, blk

        n_loc = b_block.shape[-1]
        acc = jnp.zeros((block_rows, n_loc), dtype=jnp.promote_types(ed.dtype, b_block.dtype))
        acc = jax.lax.pcast(acc, (axis_name,), to="varying")
        acc, _ = jax.lax.fori_loop(0, n_dev, step, (acc, b_block))
        return acc[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis_name, None, None, None),
                P(axis_name, None, None, None),
                P(axis_name, None, None, None),
                P(axis_name, None),
            ),
            out_specs=P(axis_name, None, None),
        )
    )


def spmm_ring_ell(bucketed, n_rows, dense_sharded, mesh, axis_name="x"):
    """Ring SpMM with the one-hot MXU block kernel per rotation — the
    scatter-free TPU-production form of :func:`spmm_ring`.  ``bucketed``
    from :func:`bucket_columns_ell`; ``dense_sharded`` K-sharded over the
    mesh, padded to ``n_shards * block_cols`` rows."""
    e_rows, e_cols, e_data, block_rows, block_cols = bucketed
    n_shards = e_rows.shape[0]
    n_buckets = e_rows.shape[1]
    axis_size = mesh.shape[axis_name]
    # The rotation indexes buckets with (device_idx + step) % axis_size: a
    # bucket count that differs from the ring size would silently read the
    # wrong (jnp.take-clamped) bucket, not error.
    if not (n_buckets == n_shards == axis_size):
        raise ValueError(
            f"spmm_ring_ell needs n_buckets == n_shards == mesh axis size; "
            f"got n_buckets={n_buckets}, n_shards={n_shards}, |{axis_name}|={axis_size}"
        )
    N = dense_sharded.shape[-1]
    f = _spmm_ring_ell_fn(mesh, axis_name, block_rows, 128)
    out = f(jnp.asarray(e_rows), jnp.asarray(e_cols), jnp.asarray(e_data), dense_sharded)
    return out.reshape(n_shards * block_rows, N)[:n_rows]


@functools.cache
def _spmm_2d_fn(mesh, row_axis, col_axis, block_rows):
    def local(rows, cols, data, b):
        # rows/cols/data: (k, cap) row shards here (replicated over
        # col_axis); b: (K, N/ny) feature shard (replicated over row_axis)
        def one(r, c, d_):
            prod = d_[:, None] * jnp.take(b, c, axis=0)
            return jax.ops.segment_sum(prod, r, num_segments=block_rows)

        return jax.vmap(one)(rows, cols, data)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(row_axis, None),
                P(row_axis, None),
                P(row_axis, None),
                P(None, col_axis),
            ),
            out_specs=P(row_axis, None, col_axis),
        )
    )


def spmm_2d(pcoo, dense, mesh, row_axis="x", col_axis="y"):
    """SpMM over a 2-D mesh: sparse rows sharded on ``row_axis`` (data
    parallel) and the dense operand's feature columns sharded on
    ``col_axis`` (tensor parallel). Each (i, j) device contracts its row
    block against its feature slice — no collectives in steady state; the
    output comes out sharded over both axes.

    The secondary-axis design called out in SURVEY §2.4 ("TP-like
    partitioning of the dense operand's feature dim")."""
    f = _spmm_2d_fn(mesh, row_axis, col_axis, pcoo.block_rows)
    out = f(pcoo.rows, pcoo.cols, pcoo.data, dense)
    n_shards = pcoo.n_shards
    return out.reshape(n_shards * pcoo.block_rows, dense.shape[1])[: pcoo.shape[0]]


@functools.cache
def _spmm_2d_ell_fn(mesh, row_axis, col_axis, block_rows_ell):
    from ..kernels.ell import ell_spmm

    def local(er, ec, ed, b):
        # er/ec/ed: (k, nb, cap) row shards (replicated over col_axis);
        # b: (K, N/ny) feature shard.  One-hot MXU block scatter — no
        # segment_sum (XLA scatter serializes on TPU hardware).
        def one(r_, c_, v_):
            return ell_spmm(r_, c_, v_, b, n_rows=r_.shape[0] * block_rows_ell)

        return jax.vmap(one)(er, ec, ed)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(row_axis, None, None),
                P(row_axis, None, None),
                P(row_axis, None, None),
                P(None, col_axis),
            ),
            out_specs=P(row_axis, None, col_axis),
        )
    )


def spmm_2d_ell(e_rows, e_cols, e_data, n_rows, dense, mesh, row_axis="x", col_axis="y"):
    """2-D-mesh SpMM (dp rows x tp feature columns) with the one-hot MXU
    block kernel per shard — the scatter-free TPU-production form of
    :func:`spmm_2d`.  Inputs from :func:`partition_spmm_ell` (placed with
    a ``(row_axis, None, None)`` sharding); ``dense`` feature-sharded."""
    f = _spmm_2d_ell_fn(mesh, row_axis, col_axis, 128)
    out = f(jnp.asarray(e_rows), jnp.asarray(e_cols), jnp.asarray(e_data), jnp.asarray(dense))
    return out.reshape(-1, dense.shape[1])[:n_rows]


@functools.cache
def _sddmm_fn(mesh, axis_name, block_rows):
    def local(rows, cols, data, lhs_block, rhs):
        # rows/cols/data: (k, cap) row shards of the sample matrix; the lhs
        # rows matching this shard's row block travel with it; rhs replicated
        def one(r, c, d_, lhs_):
            lg = jnp.take(lhs_, r, axis=0)
            rg = jnp.take(rhs.T, c, axis=0)
            return d_ * jnp.sum(lg * rg, axis=-1)

        return jax.vmap(one)(rows, cols, data, lhs_block)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None, None),
                P(),
            ),
            out_specs=P(axis_name, None),
        )
    )


def sddmm_sharded(pcoo_s, lhs, rhs, mesh, axis_name="x"):
    """Distributed SDDMM: the sample matrix is row-sharded
    (PartitionedCOO); lhs rows are sharded to match (each shard carries its
    own ``block_rows`` slice of lhs), rhs replicated. Returns per-shard
    padded value arrays aligned with ``pcoo_s.data`` (padding entries carry
    data 0, hence value 0)."""
    n_shards = pcoo_s.n_shards
    m = pcoo_s.shape[0]
    block_rows = pcoo_s.block_rows
    lhs = np.asarray(lhs)
    lhs_pad = np.zeros((n_shards * block_rows, lhs.shape[1]), dtype=lhs.dtype)
    lhs_pad[:m] = lhs
    lhs_blocks = jnp.asarray(lhs_pad.reshape(n_shards, block_rows, lhs.shape[1]))
    f = _sddmm_fn(mesh, axis_name, block_rows)
    return f(pcoo_s.rows, pcoo_s.cols, pcoo_s.data, lhs_blocks, jnp.asarray(np.asarray(rhs)))


@functools.cache
def _spgemm_sharded_fn(mesh, axis_name, k, n, product_capacity, out_capacity):
    from ..kernels.spgemm import esc_spgemm

    def local(ra, ca, da, rb, cb, db):
        # A row shards resident here (k, cap); B replicated
        def one(r_, c_, d_):
            return esc_spgemm(
                r_, c_, d_, rb, cb, db, k=k, n=n,
                product_capacity=product_capacity, out_capacity=out_capacity,
            )

        rows_o, cols_o, data_o, nnz_o = jax.vmap(one)(ra, ca, da)
        return rows_o, cols_o, data_o, nnz_o

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) * 3 + (P(), P(), P()),
            out_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None), P(axis_name)),
        )
    )


def spgemm_sharded(pcoo_a, b_coo, mesh, axis_name="x", product_capacity=None, out_capacity=None):
    """Distributed SpGEMM: A row-sharded (PartitionedCOO, zero-padded), B's
    canonical COO triplets replicated; each shard runs the traceable ESC
    SpGEMM on its row block. Returns per-shard padded triplets with LOCAL
    row ids plus per-shard true counts — assemble into a global COO with
    :func:`assemble_spgemm_result`."""
    import numpy as np_

    from ..core.coo import COO
    from ..kernels.spgemm import product_count

    if not isinstance(b_coo, COO):
        b_coo = b_coo.asformat("coo")
    K, N = b_coo.shape
    rb = jnp.asarray(np_.asarray(b_coo.coords[0]).astype(np_.int32))
    cb = jnp.asarray(np_.asarray(b_coo.coords[1]).astype(np_.int32))
    db = jnp.asarray(np_.asarray(b_coo.data))

    if product_capacity is None:
        # per-shard worst case (padding entries hit column 0 of B, so count them)
        caps = [
            product_count(np_.asarray(pcoo_a.cols)[s], np_.asarray(b_coo.coords[0]), K)
            for s in range(pcoo_a.n_shards)
        ]
        product_capacity = max(max(caps), 1)
    if out_capacity is None:
        out_capacity = product_capacity

    f = _spgemm_sharded_fn(mesh, axis_name, K, N, int(product_capacity), int(out_capacity))
    return f(pcoo_a.rows, pcoo_a.cols, pcoo_a.data.astype(db.dtype), rb, cb, db)


def assemble_spgemm_result(shard_out, pcoo_a, n_cols):
    """Host-side: stitch per-shard padded SpGEMM outputs into a global COO."""
    from ..core.coo import COO

    rows_o, cols_o, data_o, nnz_o = (np.asarray(x) for x in shard_out)
    parts_r, parts_c, parts_d = [], [], []
    for s in range(rows_o.shape[0]):
        n = int(nnz_o[s])
        parts_r.append(rows_o[s, :n].astype(np.int64) + s * pcoo_a.block_rows)
        parts_c.append(cols_o[s, :n].astype(np.int64))
        parts_d.append(data_o[s, :n])
    rows = np.concatenate(parts_r) if parts_r else np.empty(0, np.int64)
    cols = np.concatenate(parts_c) if parts_c else np.empty(0, np.int64)
    data = np.concatenate(parts_d) if parts_d else np.empty(0)
    return COO(
        np.stack([rows, cols]),
        data,
        shape=(pcoo_a.shape[0], n_cols),
        has_duplicates=False,
        sorted=True,
        prune=True,
    )


@functools.cache
def _mttkrp_fn(mesh, axis_name, block_rows):
    def local(ci, cj, ck, v, c_, d_):
        def one(i_, j_, k_, v_):
            prod = v_[:, None] * jnp.take(c_, j_, axis=0) * jnp.take(d_, k_, axis=0)
            return jax.ops.segment_sum(prod, i_, num_segments=block_rows)

        return jax.vmap(one)(ci, cj, ck, v)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) * 4 + (P(), P()),
            out_specs=P(axis_name, None, None),
        )
    )


def mttkrp_sharded(coords_i, coords_j, coords_k, data, c, d, n_rows, mesh, axis_name="x"):
    """Distributed MTTKRP: the 3-D sparse tensor is i-partitioned (leading
    output axis); factor matrices are replicated (they are small). Inputs
    must already be bucketed per shard with a leading shard dim."""
    block_rows = -(-n_rows // coords_i.shape[0])
    f = _mttkrp_fn(mesh, axis_name, block_rows)
    out = f(coords_i, coords_j, coords_k, data, c, d)
    return out.reshape(-1, c.shape[1])[:n_rows]


# ---------------------------------------------------------------------------
# Distributed elemwise + reductions over identically-partitioned operands
# ---------------------------------------------------------------------------


@functools.cache
def _elemwise_fn(mesh, axis_name, func, k_cols, block_rows):
    from ..kernels.elemwise import coo_elemwise_union

    size = block_rows * k_cols

    def local(ra, ca, da, rb, cb, db):
        def one(ra_, ca_, da_, rb_, cb_, db_):
            # padding entries carry local coordinate 0 with data 0; they
            # merge into one union slot that contributes func(0, 0) == 0
            lin_a = ra_.astype(jnp.int64) * k_cols + ca_
            lin_b = rb_.astype(jnp.int64) * k_cols + cb_
            lin, vals, _, nnz = coo_elemwise_union(
                lin_a, da_, jnp.zeros((), da_.dtype), lin_b, db_, jnp.zeros((), db_.dtype), func=func, size=size
            )
            lin = jnp.where(lin >= size, 0, lin)
            r = (lin // k_cols).astype(jnp.int32)
            c = (lin % k_cols).astype(jnp.int32)
            return r, c, vals, nnz

        return jax.vmap(one)(ra, ca, da, rb, cb, db)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) * 6,
            out_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None), P(axis_name)),
        )
    )


def elemwise_partitioned(func, pa: PartitionedCOO, pb: PartitionedCOO, mesh, axis_name="x"):
    """Shard-local elementwise ``func`` over two identically-partitioned
    zero-fill operands (no communication: the row partition aligns).

    ``func`` must map (0, 0) -> 0 (e.g. add/subtract/multiply/minimum/
    maximum of zero-fill operands), because padding survives as zeros.
    Returns ``(out, nnz_per_shard)``: a PartitionedCOO of capacity
    ``cap_a + cap_b`` (entries past each shard's count are zero padding) and
    the per-shard union counts.
    """
    if pa.shape != pb.shape or pa.block_rows != pb.block_rows or pa.n_shards != pb.n_shards:
        raise ValueError("operands must share shape and partitioning")
    sa = getattr(pa, "row_starts", None)
    sb = getattr(pb, "row_starts", None)
    if (sa is None) != (sb is None) or (sa is not None and not np.array_equal(sa, sb)):
        raise ValueError("operands must share row_starts (nnz-balanced partitions)")
    probe = func(np.zeros(1, np.asarray(pa.data).dtype), np.zeros(1, np.asarray(pb.data).dtype))
    if probe[0] != 0:
        raise ValueError(f"elemwise_partitioned requires func(0, 0) == 0, got {probe[0]!r}")
    f = _elemwise_fn(mesh, axis_name, func, pa.shape[1], pa.block_rows)
    r, c, v, nnz = f(pa.rows, pa.cols, pa.data, pb.rows, pb.cols, pb.data)
    out = PartitionedCOO(r, c, v, pa.shape, pa.block_rows)
    if sa is not None:
        out.row_starts = sa
    return out, nnz


@functools.cache
def _sum_fn(mesh, axis_name, axis, k_cols, block_rows):
    def local(rows, cols, data):
        if axis == 1:
            def one(r, c, d_):
                return jax.ops.segment_sum(d_, r, num_segments=block_rows)

            return jax.vmap(one)(rows, cols, data)
        if axis == 0:
            def one(r, c, d_):
                return jax.ops.segment_sum(d_, c, num_segments=k_cols)

            part = jax.vmap(one)(rows, cols, data).sum(axis=0)
            return jax.lax.psum(part, axis_name)[None]
        total = data.sum()
        return jax.lax.psum(total, axis_name)[None]

    out_specs = P(axis_name, None) if axis == 1 else P(axis_name, None) if axis == 0 else P(axis_name)
    # axis=0 / None results are replicated: emit one copy per device and
    # read the first
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) * 3,
            out_specs=out_specs,
        )
    )


def sum_partitioned(pcoo: PartitionedCOO, mesh, axis=None, axis_name="x"):
    """Distributed ``sum`` of a zero-fill PartitionedCOO → dense.

    ``axis=1`` reduces within rows (no communication; returns ``(M,)``),
    ``axis=0`` reduces across the row partition with a ``psum`` (returns
    ``(K,)``), ``axis=None`` returns the scalar total (psum epilogue).
    """
    M, K = pcoo.shape
    f = _sum_fn(mesh, axis_name, axis, K, pcoo.block_rows)
    out = f(pcoo.rows, pcoo.cols, pcoo.data)
    if axis == 1:
        starts = getattr(pcoo, "row_starts", None)
        if starts is not None:
            res = np.zeros(M, dtype=np.asarray(out).dtype)
            arr = np.asarray(out)
            bounds = np.concatenate([starts, [M]])
            for s in range(pcoo.n_shards):
                n = int(bounds[s + 1] - bounds[s])
                res[bounds[s] : bounds[s + 1]] = arr[s, :n]
            return res
        return np.asarray(out).reshape(-1)[:M]
    if axis == 0:
        return np.asarray(out)[0]
    return np.asarray(out)[0]


def partition_spmm_ell(coo, n_shards, block_rows_ell=128):
    """Host-side partitioner for :func:`spmm_sharded_ell`: row-partition a
    2-D COO matrix into shards, each laid out in block-ELL form (local
    128-row blocks, common per-shard capacity).  Returns
    ``(e_rows, e_cols, e_data, block_rows)``, the first three shaped
    ``(n_shards, n_blocks, cap)``.

    This is the TPU-production sharded-SpMM layout: the per-shard kernel
    is the one-hot MXU block scatter (``ell_spmm``), with NO
    ``segment_sum`` — XLA scatter serializes on real TPU hardware (the
    flat-triplet paths are fine on the CPU test mesh but would crawl on a
    pod)."""
    from ..kernels.ell import build_block_ell

    coords = np.asarray(coo.coords)
    data = np.asarray(coo.data)
    n_rows, n_cols = coo.shape
    block_rows = -(-n_rows // n_shards)
    block_rows = -(-block_rows // block_rows_ell) * block_rows_ell
    shard_of = np.minimum(coords[0] // block_rows, n_shards - 1)
    parts = []
    for s in range(n_shards):
        sel = shard_of == s
        parts.append(
            build_block_ell(
                coords[0][sel] - s * block_rows,
                coords[1][sel],
                data[sel],
                block_rows,
                n_cols,
                block_rows=block_rows_ell,
            )
        )
    cap = max(max(int(p.e_cols.shape[1]) for p in parts), 1)
    nb = parts[0].e_cols.shape[0]

    def pad(get, dtype):
        out = np.zeros((n_shards, nb, cap), dtype=dtype)
        for s, p in enumerate(parts):
            a = np.asarray(get(p))
            out[s, :, : a.shape[1]] = a
        return out

    e_rows = pad(lambda p: p.e_rows, np.int32)
    e_cols = pad(lambda p: p.e_cols, np.int32)
    e_data = pad(lambda p: p.e_data, data.dtype)
    return e_rows, e_cols, e_data, block_rows


@functools.cache
def _spmm_ell_fn(mesh, axis_name, block_rows_ell):
    from ..kernels.ell import ell_spmm

    def local(er, ec, ed, b):
        def one(r_, c_, v_):
            return ell_spmm(r_, c_, v_, b, n_rows=r_.shape[0] * block_rows_ell)

        return jax.vmap(one)(er, ec, ed)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None, None),) * 3 + (P(),),
            out_specs=P(axis_name, None, None),
        )
    )


def spmm_sharded_ell(e_rows, e_cols, e_data, dense, n_rows, mesh, axis_name="x"):
    """Distributed SpMM with the one-hot MXU block kernel per shard
    (scatter-free — the TPU-production form of :func:`spmm_replicated`).
    Inputs from :func:`partition_spmm_ell`; ``dense`` replicated."""
    f = _spmm_ell_fn(mesh, axis_name, 128)
    out = f(jnp.asarray(e_rows), jnp.asarray(e_cols), jnp.asarray(e_data), jnp.asarray(dense))
    return out.reshape(-1, dense.shape[1])[:n_rows]


def partition_mttkrp_ell(coords, data, n_rows, n_shards, block_rows_ell=128):
    """Host-side partitioner for :func:`mttkrp_sharded_ell`: i-partition a
    3-D COO tensor into row-block shards, each laid out in block-ELL form
    (local 128-row blocks, common per-shard capacity). Returns
    ``(e_rows, e_j, e_k, e_data)``, each ``(n_shards, n_blocks, cap)``."""
    from ..kernels.ell import build_block_ell_3d

    coords = np.asarray(coords)
    data = np.asarray(data)
    block_rows = -(-n_rows // n_shards)
    # pad the shard extent to a block_rows_ell multiple for uniform layouts
    block_rows = -(-block_rows // block_rows_ell) * block_rows_ell
    shard_of = np.minimum(coords[0] // block_rows, n_shards - 1)
    parts = []
    for s in range(n_shards):
        sel = shard_of == s
        parts.append(
            build_block_ell_3d(
                coords[0][sel] - s * block_rows,
                coords[1][sel],
                coords[2][sel],
                data[sel],
                block_rows,
                block_rows=block_rows_ell,
            )
        )
    cap = max(int(p[1].shape[1]) for p in parts)
    nb = parts[0][0].shape[0]

    def pad(arrs, idx, dtype):
        out = np.zeros((n_shards, nb, cap), dtype=dtype)
        for s, p in enumerate(arrs):
            a = np.asarray(p[idx])
            out[s, :, : a.shape[1]] = a
        return out

    e_rows = pad(parts, 0, np.int32)
    e_j = pad(parts, 1, np.int32)
    e_k = pad(parts, 2, np.int32)
    e_data = pad(parts, 3, data.dtype)
    return e_rows, e_j, e_k, e_data, block_rows


@functools.cache
def _mttkrp_ell_fn(mesh, axis_name, block_rows_ell, strategy):
    from ..kernels.ell import ell_mttkrp

    def local(er, ej, ek, ed, c_, d_):
        def one(r_, j_, k_, v_):
            return ell_mttkrp(
                r_, j_, k_, v_, c_, d_, n_rows=r_.shape[0] * block_rows_ell, strategy=strategy
            )

        return jax.vmap(one)(er, ej, ek, ed)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None, None),) * 4 + (P(), P()),
            out_specs=P(axis_name, None, None),
        )
    )


def mttkrp_sharded_ell(e_rows, e_j, e_k, e_data, c, d, n_rows, block_rows, mesh, axis_name="x", strategy="exact"):
    """Distributed MTTKRP with the one-hot MXU kernel per shard (2× over
    the segment form at 10M nnz). Inputs from
    :func:`partition_mttkrp_ell`; factors replicated.  ``strategy`` passes
    through to :func:`ell_mttkrp` ("exact" / "bf16" / "hilo" — the r4
    hi|lo fast mode is 1.51x at relerr 1.7e-6)."""
    f = _mttkrp_ell_fn(mesh, axis_name, 128, strategy)
    out = f(jnp.asarray(e_rows), jnp.asarray(e_j), jnp.asarray(e_k), jnp.asarray(e_data), jnp.asarray(c), jnp.asarray(d))
    return out.reshape(-1, c.shape[1])[:n_rows]
