"""Stencil / PDE workload on the DIA banded kernel stack.

2-D heat diffusion ``u' = -L u`` on a square grid: the 5-point Laplacian is
a 5-banded matrix, so the matvec is the gather-free ``dia_spmv`` (static
shifts + fma). Demonstrates, each validated against a dense numpy oracle:

- implicit Euler steps ``(I + dt L) u_{k+1} = u_k`` solved by
  :func:`sparse_tpu.linalg.cg` (auto-upgrades to the DIA matvec; the whole
  solve is one memoized device program, so the time loop pays compile once)
- the exact solution ``u(t) = exp(-t L) u0`` via Krylov
  :func:`sparse_tpu.linalg.expm_multiply`
- the mesh-sharded matvec :func:`sparse_tpu.kernels.dia_spmv_sharded`
  (ppermute halo exchange) matching the single-device kernel
"""

import numpy as np

import time

from utils import CI_MODE, use_cpu_if_requested

use_cpu_if_requested()

import jax.numpy as jnp

import sparse_tpu as sparse
from sparse_tpu import linalg
from sparse_tpu.kernels import dia_spmv, dia_spmv_sharded

SIDE = 16 if CI_MODE else 128
STEPS = 3 if CI_MODE else 10
DT = 0.1


def laplacian_2d(side):
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows, cols, vals = [np.arange(n)], [np.arange(n)], [np.full(n, 4.0)]
    for di, dj in ((0, 1), (1, 0)):
        a = idx[: side - di, : side - dj].ravel()
        b = idx[di:, dj:].ravel()
        rows += [a, b]
        cols += [b, a]
        vals += [np.full(a.size, -1.0), np.full(a.size, -1.0)]
    return sparse.COO(
        np.stack([np.concatenate(rows), np.concatenate(cols)]),
        np.concatenate(vals),
        shape=(n, n),
    )


def main():
    rng = np.random.default_rng(0)
    n = SIDE * SIDE
    L = laplacian_2d(SIDE)
    A = sparse.COO.from_numpy(np.eye(n)) + DT * L  # I + dt L (stays 5-banded)
    dia = A.to_dia()
    assert dia is not None and len(dia.offsets) == 5, dia and dia.offsets

    u0 = rng.random(n)
    Ld = L.todense()
    Ad = np.eye(n) + DT * Ld

    # gather-free banded matvec
    np.testing.assert_allclose(np.asarray(dia_spmv(dia.offsets, dia.bands, u0)), Ad @ u0, rtol=1e-10)

    # implicit Euler: repeated CG solves reuse one memoized device program
    u = jnp.asarray(u0)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        u, info = linalg.cg(A, u, tol=1e-10)
        assert int(info) == 0
    if not CI_MODE:
        print(f"implicit Euler x{STEPS} (CG on DIA, n={n}): {(time.perf_counter() - t0) * 1e3:.1f} ms")
    u_ref = u0.copy()
    for _ in range(STEPS):
        u_ref = np.linalg.solve(Ad, u_ref)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-6, atol=1e-9)

    # exact propagator via Krylov expm: u(t) = exp(-t L) u0
    t = DT * STEPS
    u_exp = linalg.expm_multiply(-t * L, u0, m=40)
    from scipy.linalg import expm as dense_expm

    np.testing.assert_allclose(np.asarray(u_exp), dense_expm(-t * Ld) @ u0, rtol=1e-6, atol=1e-8)

    # mesh-sharded halo-exchange matvec (8 virtual devices on CPU, or
    # however many the platform exposes)
    from sparse_tpu.parallel import make_mesh

    mesh = make_mesh(None)
    n_dev = mesh.devices.size
    if n % n_dev == 0 and SIDE >= n_dev:
        y = dia_spmv_sharded(dia.offsets, dia.bands, u0, mesh)
        np.testing.assert_allclose(np.asarray(y), Ad @ u0, rtol=1e-8)
        sharded = f", sharded matvec over {n_dev} devices OK"
    else:
        sharded = ""

    print(f"stencil oracles OK (n={n}: DIA matvec, CG time-stepping, expm{sharded})")


if __name__ == "__main__":
    main()
