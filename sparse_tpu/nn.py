"""Neural-network building blocks over sparse weights/operands.

The reference is a numpy library; this module is the TPU-native payoff:
sparse structures that drop into jitted training/serving stacks.

- :class:`BlockSparseLinear` — a linear layer whose weight matrix is
  block-sparse (BSR, 128×128 blocks) and contracts on the MXU through the
  Pallas kernel. The natural fit for block-pruned MLPs / MoE-style experts.
- :func:`graph_conv` — symmetric-normalized sparse propagation (the GCN
  primitive), differentiable through ``jax.grad``.
- :func:`sparse_attention` — attention restricted to a stored edge pattern
  (sliding window + global tokens via :func:`local_attention_pattern`):
  SDDMM scores → segment softmax → SpMM, O(nnz·d), never materializing L².
  :func:`sparse_attention_sharded` runs it sequence-parallel over a mesh
  (query rows partitioned, shard-local compute).
- Regular-pattern fast forms: :func:`sparse_attention_ell` (row-ELL, no
  segment ops), :func:`block_sparse_attention` (arbitrary per-block key
  lists — the BigBird window+random+global family, via
  :func:`bigbird_block_pattern`), :func:`longformer_attention`, and
  :func:`banded_attention` (dense block×stripe MXU tiles —
  0.14 ms at L=8192/W=256 on v5e vs 54 ms dense attention; 1.74 ms at
  L=65536 where dense scores would need 17 GB).

These are framework-agnostic pure functions + parameter pytrees (usable
from flax/haiku by calling them inside a module's ``__call__``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .kernels.bsr import bsr_spmm, build_bsr
from .kernels.dot import coo_spmm, sddmm


import dataclasses


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockSparseLinearParams:
    """Parameter pytree of a block-sparse linear layer (y = x @ Wᵀ + b).

    The feature sizes are static aux data (not leaves) so the layer keeps
    concrete shapes under ``jit``."""

    blocks: jax.Array  # (n_blocks, bm, bn)
    block_rows: jax.Array
    block_cols: jax.Array
    bias: jax.Array | None
    out_features: int
    in_features: int
    # transposed layout (dgrad path); None on layouts built before training
    t_block_rows: jax.Array | None = None
    t_block_cols: jax.Array | None = None
    t_perm: jax.Array | None = None

    def tree_flatten(self):
        children = (self.blocks, self.block_rows, self.block_cols, self.bias,
                    self.t_block_rows, self.t_block_cols, self.t_perm)
        return children, (self.out_features, self.in_features)

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocks, block_rows, block_cols, bias, t_rows, t_cols, t_perm = children
        return cls(blocks, block_rows, block_cols, bias, *aux, t_rows, t_cols, t_perm)

    def _replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


def init_block_sparse_linear(key, in_features, out_features, block_density=0.25, block_shape=(128, 128), dtype=jnp.float32, bias=True):
    """Initialize a block-sparse linear layer with a random block mask.

    The weight is W (out_features, in_features) stored as BSR; forward
    computes ``x @ Wᵀ`` via the transposed contraction (one SpMM per batch
    of inputs)."""
    bm, bn = block_shape
    n_br = -(-out_features // bm)
    n_bc = -(-in_features // bn)
    k_mask, k_w = jax.random.split(key)
    mask = np.asarray(jax.random.uniform(k_mask, (n_br * n_bc,))) < block_density
    bi = (np.arange(n_br * n_bc) // n_bc)[mask].astype(np.int64) * bm
    bj = (np.arange(n_br * n_bc) % n_bc)[mask].astype(np.int64) * bn
    layout = build_bsr(bi, bj, np.ones(bi.size, dtype=np.float32), (out_features, in_features), block_shape, pad_run_multiple=2)
    n_blocks = layout.blocks.shape[0]
    scale = jnp.asarray(1.0 / np.sqrt(max(in_features * block_density, 1.0)), dtype)
    blocks = jax.random.normal(k_w, (n_blocks, bm, bn), dtype) * scale
    # zero the pad blocks so they stay inert
    nonpad = jnp.asarray(np.asarray(layout.blocks).reshape(n_blocks, -1).sum(axis=1) > 0)
    blocks = blocks * nonpad[:, None, None].astype(dtype)
    b = jnp.zeros((out_features,), dtype) if bias else None
    from .kernels.bsr import transpose_bsr_layout

    t_rows, t_cols, t_perm = transpose_bsr_layout(layout.block_rows, layout.block_cols, -(-in_features // bn))
    return BlockSparseLinearParams(
        blocks, layout.block_rows, layout.block_cols, b, out_features, in_features,
        jnp.asarray(t_rows), jnp.asarray(t_cols), jnp.asarray(t_perm),
    )


def block_sparse_linear(params: BlockSparseLinearParams, x, *, use_pallas=None):
    """Apply the layer: ``y = x @ Wᵀ (+ bias)`` with W block-sparse.

    ``x``: (batch, in_features) → (batch, out_features). Contraction is
    expressed as ``W @ xᵀ`` so the BSR SpMM kernel applies directly."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if params.t_block_rows is not None:
        # fully kernelized VJP: Pallas forward, Pallas dgrad (transposed
        # layout) + Pallas wgrad (block SDDMM)
        from .kernels.bsr import bsr_spmm_trainable

        out_t = bsr_spmm_trainable(
            params.block_rows, params.block_cols, params.t_block_rows, params.t_block_cols,
            params.t_perm, params.blocks, x.T, params.out_features, params.in_features, use_pallas,
        )
    else:
        # Pallas forward, XLA-derived VJP (pallas_call has no autodiff rule)
        out_t = bsr_spmm(params.block_rows, params.block_cols, params.blocks, x.T, params.out_features, use_pallas)
    y = out_t.T
    if params.bias is not None:
        y = y + params.bias[None, :]
    return y


def graph_conv(rows, cols, vals, x, w, *, n_nodes):
    """GCN propagation: ``Â (x @ w)`` with Â a normalized sparse adjacency
    given as canonical COO triplets. Fully differentiable and jittable."""
    return coo_spmm(rows, cols, vals, x @ w, n_rows=n_nodes)


def _seg_scan_sorted(x, rows, op, init):
    """Segmented inclusive scan over SORTED segment ids (Hillis-Steele:
    log2(n) shift-op passes, combines stay within segments)."""
    n = x.shape[0]
    d = 1
    while d < n:
        same = rows[d:] == rows[:-d]
        sh = jnp.concatenate([jnp.full(d, init, x.dtype), jnp.where(same, x[:-d], init)])
        x = op(x, sh)
        d *= 2
    return x


def _seg_scan_sorted_rev(x, rows, op, init):
    """Backward (suffix) segmented inclusive scan — used to PROPAGATE a
    per-segment total (sitting at each segment's last slot after a forward
    scan) back to every slot positionally.  A small-table ``value[rows]``
    broadcast gather would serialize: per-entry scalar gathers issue at
    ~140 M/s on TPU (≈14 ms per 2M-entry gather), where these log-passes
    are bandwidth-bound elementwise ops."""
    n = x.shape[0]
    d = 1
    while d < n:
        same = rows[d:] == rows[:-d]
        sh = jnp.concatenate([jnp.where(same, x[d:], init), jnp.full(d, init, x.dtype)])
        x = op(x, sh)
        d *= 2
    return x


def segment_softmax(scores, rows, *, n_rows, mask=None):
    """Numerically-stable softmax over row segments of a sorted COO pattern.

    ``scores``: (nnz,) logits at the stored coordinates; rows sorted
    (canonical). ``mask``: optional (nnz,) bool, False entries get weight 0
    (padding slots of capacity-bounded patterns). Traceable/differentiable.

    On TPU the reduction is a segmented scan + per-segment-tail gathers —
    ``segment_max``/``segment_sum`` are XLA scatters, which serialize on
    hardware (measured 2.2x at 2M entries, r4); CPU keeps the segment
    ops (scatters are fine there, the log-passes are not)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    if mask is not None:
        scores = jnp.where(mask, scores, neg_inf)
    if jax.default_backend() not in ("cpu",) and scores.shape[0] >= 4096:
        # all-positional formulation (r5): forward scan computes prefix
        # stats, a backward max-scan propagates each segment's total to
        # every slot.  NO per-entry ``[rows]`` gathers and no row-tail
        # searchsorted — the r4 form spent ~28 of its 30.3 ms in exactly
        # those two broadcast gathers (2×2M scalar gathers at the 140 M/s
        # issue bound), not in the scan passes.
        m = _seg_scan_sorted(scores, rows, jnp.maximum, neg_inf)
        row_max = _seg_scan_sorted_rev(m, rows, jnp.maximum, neg_inf)
        shifted = scores - jnp.where(jnp.isfinite(row_max), row_max, 0)
        expd = jnp.exp(shifted)
        if mask is not None:
            expd = jnp.where(mask, expd, 0)
        s = _seg_scan_sorted(expd, rows, jnp.add, jnp.asarray(0, expd.dtype))
        # prefix sums of the non-negative expd are non-decreasing within a
        # segment, so a backward MAX scan propagates the segment total
        denom = _seg_scan_sorted_rev(s, rows, jnp.maximum, jnp.asarray(0, s.dtype))
        return expd / jnp.where(denom == 0, 1, denom)
    row_max = jax.ops.segment_max(scores, rows, num_segments=n_rows, indices_are_sorted=True)
    shifted = scores - jnp.where(jnp.isfinite(row_max), row_max, 0)[rows]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(mask, expd, 0)
    denom = jax.ops.segment_sum(expd, rows, num_segments=n_rows, indices_are_sorted=True)
    return expd / jnp.where(denom == 0, 1, denom)[rows]


_ATTENTION_ELL_MEMO = {}


def sparse_attention(q, k, v, rows, cols, *, scale=None, mask=None, max_ell_blowup=4.0):
    """Attention restricted to a sparse (query, key) pattern.

    ``rows``/``cols``: canonical COO pattern (rows sorted) of allowed
    attention edges — e.g. sliding-window + global tokens. Computes, purely
    with the library's kernels and only at the stored edges:

        scores = (q @ kᵀ) / sqrt(d)   (SDDMM — never materializes L×L)
        attn   = softmax_row(scores)   (segment softmax)
        out    = attn @ v              (SpMM)

    q: (Lq, d), k: (Lk, d), v: (Lk, dv) → (Lq, dv). Differentiable and
    jittable; O(nnz·d) compute and memory. ``mask`` marks valid entries of a
    capacity-padded pattern.

    When the pattern is HOST-known (numpy ``rows``/``cols``) and its max
    row degree pads to at most ``max_ell_blowup``× the edge count, the
    whole pipeline runs in a padded row-ELL layout instead
    (:func:`sparse_attention_ell`): ONE packed [k|v] row gather + VPU
    products + a dense masked softmax, with NO per-edge segment
    machinery (r5 numbers in docs/spmm_roofline.md).  The layout build
    is memoized on the pattern arrays' identity, so repeated calls
    (training steps) pay it once."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    if mask is None and type(rows) is np.ndarray and type(cols) is np.ndarray and rows.size:
        L = q.shape[0]
        key = (id(rows), id(cols), L)
        hit = _ATTENTION_ELL_MEMO.get(key)
        if hit is not None and hit[0] is rows and hit[1] is cols:
            e_cols, valid = hit[2], hit[3]
        else:
            cap = int(np.bincount(rows, minlength=L).max())
            e_cols = valid = None
            # blowup guard + absolute cap (the padded layout rides along
            # as a jit constant; keep it well under compile-request limits)
            if L * cap <= max_ell_blowup * rows.size and L * cap <= (1 << 26):
                e_cols, valid = build_attention_ell(rows, cols, L)
                e_cols, valid = jnp.asarray(e_cols), jnp.asarray(valid)
            _ATTENTION_ELL_MEMO[key] = (rows, cols, e_cols, valid)
            if len(_ATTENTION_ELL_MEMO) > 32:
                _ATTENTION_ELL_MEMO.pop(next(iter(_ATTENTION_ELL_MEMO)))
        if e_cols is not None:
            return sparse_attention_ell(q, k, v, e_cols, valid, scale=scale)
    scores = sddmm(rows, cols, jnp.ones((rows.shape[0],), q.dtype), q, k.T) * jnp.asarray(scale, q.dtype)
    attn = segment_softmax(scores, rows, n_rows=q.shape[0], mask=mask)
    return coo_spmm(rows, cols, attn, v, n_rows=q.shape[0])


def build_attention_ell(rows, cols, length):
    """Row-ELL layout of an attention pattern: pad every query row to the
    max degree. Host-side. Returns ``(e_cols (L, cap) int32, valid (L, cap)
    bool)`` for :func:`sparse_attention_ell`. Rows must be canonical
    (sorted). Patterns with near-uniform degree (sliding windows) waste no
    padding; a few dense rows (global tokens) blow cap up — compute those
    rows densely instead."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    counts = np.bincount(rows, minlength=length)
    cap = max(int(counts.max()), 1)
    e_cols = np.zeros((length, cap), dtype=np.int32)
    valid = np.zeros((length, cap), dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(rows.size) - starts[rows]
    e_cols[rows, within] = cols
    valid[rows, within] = True
    return e_cols, valid


def sparse_attention_ell(q, k, v, e_cols, valid, *, scale=None):
    """Sparse attention over a row-ELL pattern — no segment ops: one packed
    gather + VPU products + a dense masked softmax over the padded
    neighbor axis.

    q (L, d), k (Lk, d), v (Lk, dv), e_cols/valid (L, cap) → (L, dv).

    r5 formulation (experiments/attention_ell_forms_r5.py): ``k`` and
    ``v`` are packed into ONE (Lk, d+dv) table so a single row gather
    serves both the score and output contractions — separate (·, 64)
    gathers lane-pad 64→128 and ran 9× under the row-gather rate
    (27.5 ms EACH at 2.85M slots; packed total ~7 ms).  ``q`` is
    zero-padded over the v lanes, so the score reduce over the full
    packed row adds exactly 0 for them; the output reduce keeps the
    packed row and slices the v half at the end.  Products/reduces are
    VPU elementwise (exact f32 — the einsum form's DEFAULT precision
    truncated operands to bf16 on TPU: maxerr 7.7e-3)."""
    d = q.shape[-1]
    dv = v.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    dt = jnp.result_type(q.dtype, k.dtype, v.dtype)
    kv = jnp.concatenate([k.astype(dt), v.astype(dt)], axis=1)  # (Lk, d+dv)
    g = jnp.take(kv, e_cols, axis=0)  # (L, cap, d+dv) — one gather
    qs = q.astype(dt) * jnp.asarray(scale, dt)
    qp = jnp.concatenate([qs, jnp.zeros((q.shape[0], dv), dt)], axis=1)
    scores = (qp[:, None, :] * g).sum(axis=-1)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(valid, scores, neg_inf)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
    e = jnp.where(valid, e, 0)
    denom = e.sum(axis=1, keepdims=True)
    attn = e / jnp.where(denom == 0, 1, denom)
    return (attn[:, :, None] * g).sum(axis=1)[:, d:]


def banded_attention(q, k, v, *, window, scale=None, block=128, causal=False, precision=None):
    """Sliding-window attention as dense block compute — the TPU-idiomatic
    form: queries in blocks of ``block`` share one contiguous key stripe of
    ``block + 2·window`` positions, so the score and value contractions are
    full MXU tiles instead of per-edge gathers. O(L·(2W+block)·d).
    Measured 0.14 ms at L=8192, W=256, d=64 f32 on one v5e core (dense
    attention: 54 ms) and 1.74 ms at L=65536.

    ``causal=True`` additionally masks future positions (each query attends
    keys in ``[i-window, i]``). Equivalent to :func:`sparse_attention` on
    ``local_attention_pattern(L, window)`` for the non-causal case.
    q (L, d), k (L, d), v (L, dv) → (L, dv); bf16 inputs accumulate in f32."""
    L, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    acc_dtype = jnp.float32 if q.dtype == jnp.bfloat16 else q.dtype
    nb = -(-L // block)
    Lp = nb * block
    S = block + 2 * window
    qp = jnp.pad(q, ((0, Lp - L), (0, 0)))
    qb = qp.reshape(nb, block, d)

    # key stripe per block: positions [b*block - window, b*block + block + window)
    starts = jnp.arange(nb) * block - window
    stripe_pos = starts[:, None] + jnp.arange(S)[None, :]  # (nb, S), may be out of range
    stripe_idx = jnp.clip(stripe_pos, 0, k.shape[0] - 1)
    ks = jnp.take(k, stripe_idx.reshape(-1), axis=0).reshape(nb, S, d)
    vs = jnp.take(v, stripe_idx.reshape(-1), axis=0).reshape(nb, S, v.shape[1])

    scores = jnp.einsum("bqd,bsd->bqs", qb, ks, preferred_element_type=acc_dtype, precision=precision) * jnp.asarray(scale, acc_dtype)
    qpos = (jnp.arange(nb) * block)[:, None, None] + jnp.arange(block)[None, :, None]  # (nb, block, 1)
    kpos = stripe_pos[:, None, :]  # (nb, 1, S)
    in_band = (jnp.abs(qpos - kpos) <= window) & (kpos >= 0) & (kpos < k.shape[0])
    if causal:
        in_band &= kpos <= qpos
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(in_band, scores, neg_inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
    e = jnp.where(in_band, e, 0)
    denom = e.sum(axis=-1, keepdims=True)
    attn = (e / jnp.where(denom == 0, 1, denom)).astype(acc_dtype)
    out = jnp.einsum("bqs,bsd->bqd", attn, vs, preferred_element_type=acc_dtype, precision=precision)
    return out.reshape(Lp, v.shape[1])[:L].astype(q.dtype)


def block_sparse_attention(q, k, v, block_ids, block_valid, *, scale=None, block=128, causal=False, precision=None):
    """Attention over a block-granular sparsity pattern: query block ``b``
    attends exactly the key blocks listed in ``block_ids[b]`` — the unified
    form of window / random / global block patterns (BigBird-style), all
    dense MXU tiles.

    ``block_ids``: (n_blocks, nsel) int32 key-block indices per query block
    (padded; ``block_valid`` flags real entries). q (L, d), k/v (Lk, ·) with
    ``L`` and ``Lk`` multiples of ``block`` → (L, dv). ``causal`` masks
    future positions inside selected blocks. See
    :func:`bigbird_block_pattern` for a pattern builder."""
    L, d = q.shape
    Lk = k.shape[0]
    if L % block or Lk % block:
        raise ValueError(f"sequence lengths ({L}, {Lk}) must be multiples of block={block}")
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    acc_dtype = jnp.float32 if q.dtype == jnp.bfloat16 else q.dtype
    nb, nsel = block_ids.shape
    if nb != L // block:
        raise ValueError(f"block_ids rows {nb} != L/block {L // block}")
    qb = q.reshape(nb, block, d)

    # gather the selected key/value blocks: (nb, nsel*block, ·)
    flat = (block_ids[:, :, None] * block + jnp.arange(block)[None, None, :]).reshape(nb, nsel * block)
    flat = jnp.clip(flat, 0, Lk - 1)
    ks = jnp.take(k, flat.reshape(-1), axis=0).reshape(nb, nsel * block, d)
    vs = jnp.take(v, flat.reshape(-1), axis=0).reshape(nb, nsel * block, v.shape[1])

    scores = jnp.einsum("bqd,bsd->bqs", qb, ks, preferred_element_type=acc_dtype, precision=precision) * jnp.asarray(scale, acc_dtype)
    allowed = jnp.repeat(block_valid, block, axis=1)[:, None, :]  # (nb, 1, nsel*block)
    if causal:
        qpos = (jnp.arange(nb) * block)[:, None, None] + jnp.arange(block)[None, :, None]
        kpos = flat[:, None, :]
        allowed = allowed & (kpos <= qpos)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(allowed, scores, neg_inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
    e = jnp.where(allowed, e, 0)
    denom = e.sum(axis=-1, keepdims=True)
    attn = (e / jnp.where(denom == 0, 1, denom)).astype(acc_dtype)
    out = jnp.einsum("bqs,bsd->bqd", attn, vs, preferred_element_type=acc_dtype, precision=precision)
    return out.reshape(L, v.shape[1]).astype(q.dtype)


def bigbird_block_pattern(length, *, block=128, n_window=1, n_random=2, n_global=1, seed=0):
    """Block pattern for :func:`block_sparse_attention` in the BigBird
    style: each query block attends its ``n_window`` neighbor blocks each
    side (plus itself), ``n_random`` random blocks, and the first
    ``n_global`` blocks. Host-side; deduplicated per row. Returns
    ``(block_ids, block_valid)``."""
    nb = -(-length // block)
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(nb):
        sel = set(range(n_global))
        sel.update(range(max(b - n_window, 0), min(b + n_window + 1, nb)))
        pool = [x for x in range(nb) if x not in sel]
        if pool and n_random:
            sel.update(rng.choice(pool, size=min(n_random, len(pool)), replace=False).tolist())
        rows.append(sorted(sel))
    nsel = max(len(r) for r in rows)
    ids = np.zeros((nb, nsel), dtype=np.int32)
    valid = np.zeros((nb, nsel), dtype=bool)
    for b, r in enumerate(rows):
        ids[b, : len(r)] = r
        valid[b, : len(r)] = True
    return ids, valid


def longformer_attention(q, k, v, *, window, n_global=0, scale=None, block=128, precision=None):
    """Sliding-window + global-token attention (the Longformer pattern),
    MXU-tiled throughout — the fast composite of :func:`banded_attention`:

    - every query attends its ``window`` band **and** the first ``n_global``
      keys (global columns appended to each block's key stripe);
    - the first ``n_global`` queries attend **all** keys (computed as a
      dense (n_global × L) strip and overwriting those rows).

    Matches :func:`sparse_attention` on
    ``local_attention_pattern(L, window, n_global)``. q (L, d) → (L, dv)."""
    L, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    acc_dtype = jnp.float32 if q.dtype == jnp.bfloat16 else q.dtype
    nb = -(-L // block)
    Lp = nb * block
    S = block + 2 * window
    G = n_global
    qb = jnp.pad(q, ((0, Lp - L), (0, 0))).reshape(nb, block, d)

    starts = jnp.arange(nb) * block - window
    stripe_pos = starts[:, None] + jnp.arange(S)[None, :]
    if G:
        stripe_pos = jnp.concatenate(
            [stripe_pos, jnp.broadcast_to(jnp.arange(G)[None, :], (nb, G))], axis=1
        )
    stripe_idx = jnp.clip(stripe_pos, 0, k.shape[0] - 1)
    ks = jnp.take(k, stripe_idx.reshape(-1), axis=0).reshape(nb, S + G, d)
    vs = jnp.take(v, stripe_idx.reshape(-1), axis=0).reshape(nb, S + G, v.shape[1])

    scores = jnp.einsum("bqd,bsd->bqs", qb, ks, preferred_element_type=acc_dtype, precision=precision) * jnp.asarray(scale, acc_dtype)
    qpos = (jnp.arange(nb) * block)[:, None, None] + jnp.arange(block)[None, :, None]
    kpos = stripe_pos[:, None, :]
    in_band = (jnp.abs(qpos - kpos) <= window) & (kpos >= 0) & (kpos < k.shape[0])
    if G:
        is_global_col = jnp.concatenate(
            [jnp.zeros((nb, 1, S), bool), jnp.ones((nb, 1, G), bool)], axis=2
        )
        # global columns allowed everywhere, but a band stripe may ALSO
        # cover a global position — keep exactly one copy (the band one)
        dup = (kpos < G) & is_global_col & (jnp.abs(qpos - kpos) <= window)
        allowed = (in_band | is_global_col) & ~dup
    else:
        allowed = in_band
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(allowed, scores, neg_inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
    e = jnp.where(allowed, e, 0)
    denom = e.sum(axis=-1, keepdims=True)
    attn = (e / jnp.where(denom == 0, 1, denom)).astype(acc_dtype)
    out = jnp.einsum("bqs,bsd->bqd", attn, vs, preferred_element_type=acc_dtype, precision=precision)
    out = out.reshape(Lp, v.shape[1])[:L].astype(q.dtype)

    if G:
        # global rows: dense attention over all keys
        gs = (q[:G].astype(acc_dtype) @ k.astype(acc_dtype).T) * jnp.asarray(scale, acc_dtype)
        ga = jax.nn.softmax(gs, axis=-1)
        out = out.at[:G].set((ga @ v.astype(acc_dtype)).astype(q.dtype))
    return out


@functools.cache
def _banded_sharded_fn(mesh, axis_name, window, block, causal, seg_len):
    from jax.sharding import PartitionSpec as P

    def local(qs, ks, vs):
        # qs/ks/vs: (seg_len, d) local sequence segment
        n_dev = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        fwd = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        bwd = [(j, (j - 1) % n_dev) for j in range(n_dev)]
        # halo exchange: last `window` rows go right, first `window` go left
        left_k = jax.lax.ppermute(ks[-window:], axis_name, fwd)
        left_v = jax.lax.ppermute(vs[-window:], axis_name, fwd)
        right_k = jax.lax.ppermute(ks[:window], axis_name, bwd)
        right_v = jax.lax.ppermute(vs[:window], axis_name, bwd)
        k_ext = jnp.concatenate([left_k, ks, right_k])
        v_ext = jnp.concatenate([left_v, vs, right_v])

        d = qs.shape[-1]
        scale = 1.0 / np.sqrt(d)
        acc_dtype = jnp.float32 if qs.dtype == jnp.bfloat16 else qs.dtype
        nb = seg_len // block
        qb = qs.reshape(nb, block, d)
        S = block + 2 * window
        # stripe s for query block b covers ext positions [b*block, b*block+S)
        stripe = jnp.arange(S)[None, :] + (jnp.arange(nb) * block)[:, None]
        ks_b = jnp.take(k_ext, stripe.reshape(-1), axis=0).reshape(nb, S, d)
        vs_b = jnp.take(v_ext, stripe.reshape(-1), axis=0).reshape(nb, S, v_ext.shape[-1])
        scores = jnp.einsum("bqd,bsd->bqs", qb, ks_b, preferred_element_type=acc_dtype) * jnp.asarray(
            scale, acc_dtype
        )
        offset = idx * seg_len
        qpos = offset + (jnp.arange(nb) * block)[:, None, None] + jnp.arange(block)[None, :, None]
        kpos = offset + stripe[:, None, :] - window
        total = n_dev * seg_len
        in_band = (jnp.abs(qpos - kpos) <= window) & (kpos >= 0) & (kpos < total)
        if causal:
            in_band &= kpos <= qpos
        neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
        scores = jnp.where(in_band, scores, neg_inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - jnp.where(jnp.isfinite(m), m, 0))
        e = jnp.where(in_band, e, 0)
        denom = e.sum(axis=-1, keepdims=True)
        attn = (e / jnp.where(denom == 0, 1, denom)).astype(acc_dtype)
        out = jnp.einsum("bqs,bsd->bqd", attn, vs_b, preferred_element_type=acc_dtype)
        return out.reshape(seg_len, -1).astype(qs.dtype)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None)),
            out_specs=P(axis_name, None),
        )
    )


def banded_attention_sharded(q, k, v, *, window, mesh, axis_name="x", block=128, causal=False):
    """Sequence-parallel :func:`banded_attention`: q/k/v sharded along the
    sequence over a 1-D mesh; each device exchanges only ``window``-sized
    k/v halos with its ring neighbors (``ppermute`` over ICI) — O(window·d)
    communication instead of replicating k/v. The sequence length must be
    divisible by ``n_devices`` and the per-device segment by ``block``, with
    ``window ≤`` the segment length."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    L = q.shape[0]
    if L % n_dev:
        raise ValueError(f"sequence length {L} must divide over {n_dev} devices")
    seg_len = L // n_dev
    if seg_len % block or window > seg_len:
        raise ValueError(f"segment {seg_len} must be a multiple of block={block} and >= window={window}")
    sh = NamedSharding(mesh, P(axis_name, None))
    f = _banded_sharded_fn(mesh, axis_name, window, block, causal, seg_len)
    return f(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))


def partition_attention_pattern(rows, cols, length, n_shards):
    """Partition an attention edge pattern by query-row blocks for
    :func:`sparse_attention_sharded`. Host-side. Returns
    ``(local_rows, cols, valid, block_rows)`` with leading shard dims and a
    common per-shard edge capacity (``valid`` flags real edges)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    block_rows = -(-length // n_shards)
    shard_of = rows // block_rows
    counts = np.bincount(shard_of, minlength=n_shards)
    cap = max(int(counts.max()), 1)
    lr = np.zeros((n_shards, cap), dtype=np.int32)
    lc = np.zeros((n_shards, cap), dtype=np.int32)
    valid = np.zeros((n_shards, cap), dtype=bool)
    for s in range(n_shards):
        sel = shard_of == s
        c = int(counts[s])
        lr[s, :c] = rows[sel] - s * block_rows
        lc[s, :c] = cols[sel]
        valid[s, :c] = True
    return lr, lc, valid, block_rows


def sparse_attention_sharded(q, k, v, local_rows, cols, valid, block_rows, mesh, axis_name="x"):
    """Sequence-sharded sparse attention over a 1-D mesh: query rows (and
    their pattern edges) are block-partitioned across devices, k/v are
    replicated, and every step is shard-local (no collectives — the row
    partition aligns queries with their edges). Inputs from
    :func:`partition_attention_pattern`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = local_rows.shape[0]
    L = q.shape[0]
    d_pad = n_shards * block_rows - L
    q_pad = jnp.pad(q, ((0, d_pad), (0, 0))) if d_pad else q
    q_blocks = q_pad.reshape(n_shards, block_rows, q.shape[1])

    f = _sharded_attention_fn(mesh, axis_name, block_rows)
    out = f(
        jax.device_put(q_blocks, NamedSharding(mesh, P(axis_name, None, None))),
        jnp.asarray(k),
        jnp.asarray(v),
        jax.device_put(jnp.asarray(local_rows), NamedSharding(mesh, P(axis_name, None))),
        jax.device_put(jnp.asarray(cols), NamedSharding(mesh, P(axis_name, None))),
        jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis_name, None))),
    )
    return out.reshape(n_shards * block_rows, -1)[:L]


@functools.cache
def _sharded_attention_fn(mesh, axis_name, block_rows):
    from jax.sharding import PartitionSpec as P

    def local(qb, k, v, lr, lc, valid):
        def one(q_, r_, c_, m_):
            scale = 1.0 / np.sqrt(q_.shape[-1])
            scores = sddmm(r_, c_, jnp.ones(r_.shape, q_.dtype), q_, k.T) * jnp.asarray(scale, q_.dtype)
            attn = segment_softmax(scores, r_, n_rows=block_rows, mask=m_)
            attn = jnp.where(m_, attn, 0)
            return coo_spmm(r_, c_, attn, v, n_rows=block_rows, rows_sorted=True)

        return jax.vmap(one)(qb, lr, lc, valid)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None, None), P(), P(), P(axis_name, None), P(axis_name, None), P(axis_name, None)),
            out_specs=P(axis_name, None, None),
        )
    )


def local_attention_pattern(length, window, n_global=0):
    """Canonical COO pattern for sliding-window attention with optional
    global tokens (the Longformer-style mask): each query attends to keys
    within ``window`` positions, plus the first ``n_global`` keys attend/are
    attended everywhere. Host-side, returns (rows, cols) int32."""
    i = np.arange(length)
    lo = np.maximum(i - window, 0)
    hi = np.minimum(i + window + 1, length)
    counts = hi - lo
    rows = np.repeat(i, counts)
    cols = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) if length else np.empty(0, np.int64)
    if n_global:
        gi = np.arange(n_global)
        extra_rows = np.concatenate([np.repeat(gi, length), np.tile(i, n_global)])
        extra_cols = np.concatenate([np.tile(i, n_global), np.repeat(gi, length)])
        rows = np.concatenate([rows, extra_rows])
        cols = np.concatenate([cols, extra_cols])
        lin = rows * length + cols
        lin = np.unique(lin)
        rows, cols = lin // length, lin % length
    return rows.astype(np.int32), cols.astype(np.int32)
