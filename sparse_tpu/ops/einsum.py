"""``einsum`` over sparse operands.

Strategy (same shape as reference ``_common.py:1400-1476``, parser written
from the numpy einsum spec): parse subscripts (string or interleaved
sublists, with ellipsis), resolve repeated in-operand labels via diagonals,
align every operand into a common label space with size-1 dims, multiply
through the sparse broadcasting elemwise engine, then sum the contracted
labels.
"""

from __future__ import annotations

import string
from collections.abc import Iterable

import numpy as np

from ..core.base import SparseArray
from .common import diagonal as _diagonal

_LETTERS = string.ascii_letters


def _sublist_to_subscript(sublist):
    out = []
    for item in sublist:
        if item is Ellipsis:
            out.append("...")
        else:
            out.append(_LETTERS[int(item)])
    return "".join(out)


def _parse_operands(operands):
    """Normalize to (input_subscripts: list[str], output: str|None, arrays)."""
    if isinstance(operands[0], str):
        subscripts = operands[0].replace(" ", "")
        arrays = list(operands[1:])
        if "->" in subscripts:
            in_sub, out_sub = subscripts.split("->")
        else:
            in_sub, out_sub = subscripts, None
        inputs = in_sub.split(",")
        return inputs, out_sub, arrays
    # interleaved form: op0, sub0, op1, sub1, ..., [output_sublist]
    def _check_sublist(s):
        if (
            isinstance(s, (str, SparseArray, np.ndarray))
            or not isinstance(s, Iterable)
            or not all(item is Ellipsis or isinstance(item, int) for item in s)
        ):
            raise TypeError(
                "einsum subscripts must be a string or interleaved operand/sublist pairs "
                "where each sublist contains ints or Ellipsis"
            )

    arrays = list(operands[::2])
    sublists = list(operands[1::2])
    out_sub = None
    if len(sublists) == len(arrays) + 1 or (len(operands) % 2 == 1):
        arrays = list(operands[:-1:2])
        sublists = list(operands[1:-1:2])
        for s in [*sublists, operands[-1]]:
            _check_sublist(s)
        out_sub = _sublist_to_subscript(operands[-1])
    else:
        for s in sublists:
            _check_sublist(s)
    inputs = [_sublist_to_subscript(s) for s in sublists]
    return inputs, out_sub, arrays


def _expand_ellipsis(inputs, out_sub, arrays):
    used = set("".join(inputs) + (out_sub or "")) - {"."}
    free = [c for c in _LETTERS if c not in used]
    max_ell = 0
    for sub, arr in zip(inputs, arrays):
        if "..." in sub:
            n_named = len(sub.replace("...", ""))
            max_ell = max(max_ell, np.ndim(arr) - n_named)
    ell_labels = "".join(free[:max_ell])
    new_inputs = []
    for k, (sub, arr) in enumerate(zip(inputs, arrays)):
        if "..." in sub:
            n_named = len(sub.replace("...", ""))
            n_ell = np.ndim(arr) - n_named
            if n_ell < 0:
                raise ValueError("operand has fewer dimensions than subscripts given")
            sub = sub.replace("...", ell_labels[max_ell - n_ell :])
        if len(sub) != np.ndim(arr):
            # lenient trailing-size-1 squeeze (the reference's align step
            # broadcasts these; numpy itself would demand an ellipsis)
            shape = np.shape(arr)
            if len(sub) < np.ndim(arr) and all(d == 1 for d in shape[len(sub) :]):
                arrays[k] = arr.reshape(shape[: len(sub)])
            else:
                raise ValueError(
                    f"operand has {np.ndim(arr)} dimensions but {len(sub)} subscripts given"
                )
        new_inputs.append(sub)
    if out_sub is not None and "..." in out_sub:
        out_sub = out_sub.replace("...", ell_labels)
    return new_inputs, out_sub, ell_labels


def einsum(*operands, **kwargs):
    """Evaluate the Einstein summation convention on sparse/dense operands."""
    dtype = kwargs.pop("dtype", None)
    if kwargs:
        raise TypeError(f"einsum() got unexpected keyword arguments {list(kwargs)}")
    if not operands:
        raise ValueError("must specify the einstein sum subscripts string and at least one operand")

    inputs, out_sub, arrays = _parse_operands(operands)

    # output format rule (same as the elemwise engine / reference
    # ``_umath.py:416-427``): all-DOK sparse operands -> DOK, all-GCXS ->
    # GCXS, otherwise COO
    from ..core.dok import DOK
    from ..core.gcxs import GCXS

    sparse_ops = [a for a in arrays if isinstance(a, SparseArray)]
    out_format = "coo"
    if sparse_ops and all(isinstance(a, DOK) for a in sparse_ops):
        out_format = "dok"
    elif sparse_ops and all(isinstance(a, GCXS) for a in sparse_ops):
        out_format = "gcxs"
    if out_format != "coo":
        result = _einsum_coo(inputs, out_sub, [a.to_coo() if isinstance(a, DOK) else a for a in arrays], dtype)
        if isinstance(result, SparseArray):
            result = result.asformat(out_format)
        return result
    return _einsum_coo(inputs, out_sub, arrays, dtype)


def _einsum_coo(inputs, out_sub, arrays, dtype):
    if len(inputs) != len(arrays):
        raise ValueError("number of einsum subscripts must be equal to the number of operands")

    inputs, out_sub, ell_labels = _expand_ellipsis(inputs, out_sub, arrays)

    # implicit output: labels occurring exactly once, sorted, ellipsis first
    all_labels = "".join(inputs)
    if out_sub is None:
        counts = {c: all_labels.count(c) for c in set(all_labels)}
        out_sub = ell_labels + "".join(sorted(c for c in counts if counts[c] == 1 and c not in ell_labels))
    else:
        for c in out_sub:
            if c not in all_labels:
                raise ValueError(f"output subscript {c} does not appear in any input")
        if len(set(out_sub)) != len(out_sub):
            raise ValueError("output subscript includes a repeated label")

    # fast path: a 2-operand pure contraction (every shared label contracted,
    # no repeats, all unshared labels kept) routes through tensordot — the
    # align-multiply-reduce general path would cartesian-expand the operands
    # over each other's free dimensions
    if len(arrays) == 2 and dtype is None:
        s0, s1 = inputs
        if len(set(s0)) == len(s0) and len(set(s1)) == len(s1):
            shared = [c for c in s0 if c in s1]
            free0 = [c for c in s0 if c not in s1]
            free1 = [c for c in s1 if c not in s0]
            if (
                shared
                and all(c not in out_sub for c in shared)
                and set(out_sub) == set(free0 + free1)
            ):
                from .dot import tensordot as _tensordot

                axes0 = [s0.index(c) for c in shared]
                axes1 = [s1.index(c) for c in shared]
                res = _tensordot(arrays[0], arrays[1], axes=(axes0, axes1))
                natural = free0 + free1
                if natural != list(out_sub):
                    perm = tuple(natural.index(c) for c in out_sub)
                    res = res.transpose(perm) if not isinstance(res, np.ndarray) else np.transpose(res, perm)
                return res

    # 3+ operands: contract pairwise in a cheap greedy order, re-entering
    # einsum for each pair (which hits the tensordot fast path when the pair
    # is a pure contraction) — avoids materializing the full union of all
    # operands at once
    if len(arrays) > 2 and dtype is None and all(len(set(s)) == len(s) for s in inputs):
        remaining = list(zip(inputs, arrays))
        while len(remaining) > 2:
            # pick the pair with the most shared labels (greedy)
            best = None
            for i in range(len(remaining)):
                for j in range(i + 1, len(remaining)):
                    shared = len(set(remaining[i][0]) & set(remaining[j][0]))
                    if best is None or shared > best[0]:
                        best = (shared, i, j)
            _, i, j = best
            si, ai = remaining[i]
            sj, aj = remaining[j]
            others = [s for k, (s, _) in enumerate(remaining) if k not in (i, j)]
            keep = set(out_sub) | set("".join(others))
            pair_out = "".join(
                c for c in si + sj if (c in keep or (si + sj).count(c) == 1) and (si + sj).index(c) == (si + sj).find(c)
            )
            # dedup while preserving order
            seen = set()
            pair_out = "".join(c for c in pair_out if not (c in seen or seen.add(c)))
            res = einsum(f"{si},{sj}->{pair_out}", ai, aj)
            remaining = [r for k, r in enumerate(remaining) if k not in (i, j)] + [(pair_out, res)]
        (s0, a0), (s1, a1) = remaining
        return einsum(f"{s0},{s1}->{out_sub}", a0, a1)

    # resolve repeated labels within each operand via diagonals
    proc_arrays = []
    proc_inputs = []
    for sub, arr in zip(inputs, arrays):
        while len(set(sub)) != len(sub):
            for c in sub:
                if sub.count(c) > 1:
                    ax1 = sub.index(c)
                    ax2 = sub.index(c, ax1 + 1)
                    if isinstance(arr, SparseArray):
                        arr = _diagonal(arr, axis1=ax1, axis2=ax2)
                    else:
                        arr = np.diagonal(arr, axis1=ax1, axis2=ax2)
                    # diagonal moves the pair to the last axis
                    sub = "".join(ch for i, ch in enumerate(sub) if i not in (ax1, ax2)) + c
                    break
        proc_arrays.append(arr)
        proc_inputs.append(sub)

    # shape consistency + label extents
    extents = {}
    for sub, arr in zip(proc_inputs, proc_arrays):
        for c, d in zip(sub, np.shape(arr)):
            if c in extents and extents[c] != d and 1 not in (extents[c], d):
                raise ValueError(f"inconsistent extent for label {c}")
            extents[c] = max(extents.get(c, 1), d)

    contracted = [c for c in sorted(set(all_labels)) if c not in out_sub]
    full_order = out_sub + "".join(contracted)

    # align each operand into the full label space
    aligned = []
    for sub, arr in zip(proc_inputs, proc_arrays):
        perm = sorted(range(len(sub)), key=lambda i: full_order.index(sub[i]))
        if isinstance(arr, SparseArray):
            arr = arr.transpose(tuple(perm)) if len(perm) > 1 else arr
        else:
            arr = np.transpose(np.asarray(arr), perm) if len(perm) > 1 else np.asarray(arr)
        sub_sorted = "".join(sub[i] for i in perm)
        new_shape = tuple(np.shape(arr)[sub_sorted.index(c)] if c in sub_sorted else 1 for c in full_order)
        arr = arr.reshape(new_shape) if isinstance(arr, SparseArray) else np.asarray(arr).reshape(new_shape)
        aligned.append(arr)

    # multiply through the sparse elemwise engine
    if len(aligned) == 1:
        result = aligned[0]
    else:
        from .elemwise import elemwise

        result = aligned[0]
        for nxt in aligned[1:]:
            if isinstance(result, SparseArray) or isinstance(nxt, SparseArray):
                result = elemwise(np.multiply, result, nxt)
            else:
                result = np.multiply(result, nxt)

    # sum out contracted labels
    if contracted:
        axes = tuple(full_order.index(c) for c in contracted)
        result = result.sum(axis=axes) if isinstance(result, SparseArray) else np.sum(result, axis=axes)
    else:
        # ensure no leftover dims
        pass

    if dtype is not None:
        result = result.astype(dtype)
    if isinstance(result, SparseArray) and result.ndim == 0:
        return result
    return result
