"""Inspect compiled HLO of row-ELL variants: where are the fusion
boundaries and copies?  (compile-only, no run)"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rowell_exp import M, K, N, build_problem, build_row_ell_tiers

rows, cols, data, dense = build_problem()
dense_j = jnp.asarray(dense)

perm_inv, tiers, total_slots, nz_rows = build_row_ell_tiers(rows, cols, data, M, min_pad=8)
tier_args = [(jnp.asarray(c2), jnp.asarray(d2)) for (_, _, _, c2, d2) in tiers]
perm_inv_j = jnp.asarray(perm_inv, dtype=jnp.int32)
cols_flat = jnp.concatenate([c2.reshape(-1) for c2, _ in tier_args])
data_flat = jnp.concatenate([d2.reshape(-1) for _, d2 in tier_args])
offs = np.cumsum([0] + [int(c2.size) for c2, _ in tier_args])
shapes = [(int(c2.shape[0]), int(c2.shape[1])) for c2, _ in tier_args]


def finish(outs):
    out_sorted = jnp.concatenate(outs + [jnp.zeros((M - nz_rows, N), dtype=jnp.float32)], axis=0)
    return jnp.take(out_sorted, perm_inv_j, axis=0)


def spmm_A(cols_flat, data_flat, dense):
    g = jnp.take(dense, cols_flat, axis=0)
    outs = []
    for (r, w), o0, o1 in zip(shapes, offs[:-1], offs[1:]):
        gw = g[o0:o1].reshape(r, w, N)
        dw = data_flat[o0:o1].reshape(r, w)
        outs.append((dw[:, :, None] * gw).sum(axis=1))
    return finish(outs)


def spmm_D(tier_cd, dense):
    outs = []
    for c2, d2 in tier_cd:
        r, w = c2.shape
        g = jnp.take(dense, c2.reshape(-1), axis=0).reshape(r, w, N)
        outs.append((d2[:, :, None] * g).sum(axis=1))
    return finish(outs)


def summarize(name, txt):
    import re

    lines = txt.splitlines()
    fusions = [l for l in lines if re.search(r"= fusion\(|fusion\.", l) and "calls=" in l]
    copies = [l for l in lines if re.search(r"= copy\(|copy-start|copy\.", l)]
    gathers = [l.strip()[:160] for l in lines if " gather(" in l]
    print(f"==== {name}: {len(lines)} HLO lines, {len(fusions)} fusions, {len(copies)} copies, {len(gathers)} gathers")
    # entry computation ops in order
    in_entry = False
    for l in lines:
        if l.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if l.startswith("}"):
                break
            s = l.strip()
            if "= " in s and not s.startswith("ROOT"):
                op = s.split("= ", 1)[1]
                kind = op.split("(")[0].split(" ")[-1] if " " in op.split("(")[0] else op.split("(")[0]
                shp = op.split(" ")[0]
                print("   ", kind[:28], shp[:46])
            elif s.startswith("ROOT"):
                print("   ROOT", s[:110])


print("compiling A...")
lowered = jax.jit(spmm_A).lower(cols_flat, data_flat, dense_j)
txt = lowered.compile().as_text()
summarize("A flat", txt)

print("compiling D...")
txt = jax.jit(spmm_D).lower(tier_args, dense_j).compile().as_text()
summarize("D per-tier", txt)
