"""TPU-native iterative solvers over sparse pytrees.

The reference exposes no solvers of its own — its arrays duck-type into
``scipy.sparse.linalg`` (host, per-iteration dispatch; see
``sparse/tests/test_backends.py:77-209``). Here the solvers themselves are
JAX programs: the matrix is a COO/GCXS pytree, the whole iteration runs
inside one ``lax.while_loop`` under ``jit`` (no host round-trips), and
everything is differentiable and shardable like any other jitops pipeline.

All solvers assume zero fill. Matrices may be ``COO`` or 2-D CSR/CSC
``GCXS`` (anything :func:`sparse_tpu.jitops.spmv` accepts), or any callable
``x -> A @ x`` for matrix-free operators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import jitops

__all__ = [
    "LinearOperator",
    "aslinearoperator",
    "bicg",
    "bicgstab",
    "cg",
    "cgs",
    "eigs",
    "eigsh",
    "expm",
    "expm_multiply",
    "factorized",
    "gcrotmk",
    "gmres",
    "inv",
    "lgmres",
    "lobpcg",
    "lsmr",
    "lsqr",
    "matrix_power",
    "minres",
    "norm",
    "onenormest",
    "partitioned_matvec",
    "power_iteration",
    "qmr",
    "spilu",
    "splu",
    "spsolve",
    "spsolve_triangular",
    "svds",
    "tfqmr",
]


def _vdot(x, y):
    """Conjugating inner product as an elementwise multiply + reduce — never
    lowered through the MXU, so f32 operands are not truncated to bf16 on
    TPU (the failure mode CLAUDE.md's precision rule guards against)."""
    return jnp.sum(jnp.conj(x) * y)


def partitioned_matvec(pcoo, mesh, axis_name="x"):
    """``v -> A @ v`` for a mesh-sharded :class:`~sparse_tpu.parallel.PartitionedCOO`.

    Each device contracts its row block against the replicated vector
    (``spmm_replicated``); the result is the full product, so the returned
    callable drops straight into :func:`cg`/:func:`bicgstab`/
    :func:`power_iteration` — the solver iteration itself stays a single
    device program while the matrix lives sharded across the mesh."""
    from .parallel import spmm_replicated

    def mv(v):
        return spmm_replicated(pcoo, v[:, None], mesh, axis_name=axis_name)[:, 0]

    mv.shape = pcoo.shape
    return mv


def _under_trace():
    """True when called inside a jit/scan trace — staging host-side layout
    builds there would cache tracers on the array (leak) and bloat the
    traced graph."""
    try:
        from jax._src.core import trace_state_clean

        return not trace_state_clean()
    except ImportError:
        return isinstance(jnp.zeros(()) + 0, jax.core.Tracer)


class LinearOperator:
    """Matrix-free operator: ``shape`` + ``matvec`` (+ optional ``rmatvec``)
    — the scipy.sparse.linalg.LinearOperator shape of the idea. Every
    solver here accepts one; :func:`lsqr`/:func:`lsmr`/:func:`onenormest`
    use ``rmatvec`` when the operand is not a sparse array."""

    def __init__(self, shape, matvec, rmatvec=None, dtype=None):
        self.shape = tuple(shape)
        if len(self.shape) != 2:
            raise ValueError(f"LinearOperator shape must be 2-D, got {self.shape}")
        self._matvec = matvec
        self._rmatvec = rmatvec
        self.dtype = dtype

    def matvec(self, x):
        return self._matvec(x)

    def rmatvec(self, x):
        if self._rmatvec is None:
            raise NotImplementedError("this LinearOperator has no rmatvec")
        return self._rmatvec(x)

    def __call__(self, x):
        return self._matvec(x)

    def __matmul__(self, x):
        return self._matvec(x)

    @property
    def T(self):
        """Transpose operator (swaps matvec and rmatvec)."""
        return LinearOperator(
            (self.shape[1], self.shape[0]), self.rmatvec, self._matvec, dtype=self.dtype
        )

    H = T

    def __repr__(self):
        return f"<{self.shape[0]}x{self.shape[1]} LinearOperator>"


def aslinearoperator(A):
    """Wrap a sparse array, dense matrix, or ``(shape, matvec)``-style
    object as a :class:`LinearOperator` with both ``matvec`` and
    ``rmatvec``."""
    import numpy as np

    from .core.base import SparseArray

    if isinstance(A, LinearOperator):
        return A
    if isinstance(A, SparseArray):
        if A.ndim != 2:
            raise ValueError("aslinearoperator requires a 2-D array")
        mv = _as_matvec(A)
        rmv = _as_matvec(A.transpose())
        return LinearOperator(A.shape, mv, rmv, dtype=np.asarray(A.data).dtype)
    a = jnp.asarray(A)
    if a.ndim != 2:
        raise ValueError("aslinearoperator requires a 2-D array")
    return LinearOperator(
        a.shape,
        lambda x: jnp.dot(a, x, precision=_HI),
        lambda x: jnp.dot(jnp.conj(a).T, x, precision=_HI),
        dtype=a.dtype,
    )


def _as_matvec_pair(A):
    """``(matvec, rmatvec, shape)`` for solvers that need Aᵀ (lsqr/lsmr/
    onenormest): sparse arrays transpose for free; LinearOperators must
    carry an rmatvec."""
    from .core.base import SparseArray

    if isinstance(A, SparseArray):
        if A.ndim != 2:
            raise ValueError("expected a 2-D operator")
        return _as_matvec(A), _as_matvec(A.transpose()), A.shape
    if isinstance(A, LinearOperator):
        return A.matvec, A.rmatvec, A.shape
    raise TypeError("expected a sparse array or a LinearOperator (needs Aᵀ)")


def _as_matvec(A):
    import numpy as np

    from .core.base import SparseArray
    from .core.coo import COO

    if isinstance(A, LinearOperator):
        return A.matvec
    if isinstance(A, SparseArray):
        # a concrete 2-D zero-fill COO upgrades to the DIA shift kernel
        # (banded) or the block-ELL one-hot-MXU SpMV. The guard is on the
        # BUFFERS being concrete numpy (not tracers): layouts built from
        # concrete arrays are constants even under an outer jit/scan trace
        # (solvers inside jit still get the fast matvec); tracer pytrees
        # keep the general kernel
        if (
            isinstance(A, COO)
            and A.ndim == 2
            and isinstance(A.data, np.ndarray)
            and isinstance(A.coords, np.ndarray)
            and isinstance(np.asarray(A.fill_value)[()], (int, float, np.floating, np.integer))
            and np.asarray(A.fill_value)[()] == 0
        ):
            # banded matrices (grid Laplacians, stencils) upgrade further to
            # the DIA shift kernel: no gathers at all, ~40x over block-ELL
            # per iteration on a 5-pt 256^2 Laplacian. build_dia is pure
            # host numpy, so building/caching it is safe under a trace.
            if A.shape[0] == A.shape[1]:
                try:
                    dia = A.to_dia()
                except Exception:
                    dia = None
                if dia is not None:
                    from .kernels import dia_spmv

                    return lambda v: dia_spmv(dia.offsets, dia.bands, v)
            # row-ELL construction stages jnp ops — building it under an
            # outer trace would cache tracers; reuse only a PRE-BUILT layout
            # there, else keep the general kernel. (Degree-sorted row-ELL
            # replaced block-ELL as the unstructured matvec: 5.8 vs 9.5 ms
            # at the bench shape — docs/spmm_roofline.md.)
            if _under_trace():
                from .kernels.row_ell import ROW_ELL_DEFAULT_KEY

                rell = _peek_cached(A, "row_ell", ROW_ELL_DEFAULT_KEY)
                if rell is None:
                    return functools.partial(jitops.spmv, A)
            else:
                try:
                    rell = A.to_row_ell()
                except Exception:
                    return functools.partial(jitops.spmv, A)
            from .kernels import row_ell_spmv

            return lambda v: row_ell_spmv(rell, v)
        # GCXS operands: banded square matrices get the DIA upgrade too
        # (host-pure conversion, memoized on the GCXS instance)
        from .core.gcxs import GCXS

        if (
            isinstance(A, GCXS)
            and A.ndim == 2
            and A.shape[0] == A.shape[1]
            and isinstance(A.data, np.ndarray)
            and isinstance(np.asarray(A.fill_value)[()], (int, float, np.floating, np.integer))
            and np.asarray(A.fill_value)[()] == 0
        ):
            try:
                if getattr(A, "_cache", None) is None:
                    A.enable_caching()
                dia = A._cached("dia", (64, 8.0), lambda: A.tocoo().to_dia())
            except Exception:
                dia = None
            if dia is not None:
                from .kernels import dia_spmv

                return lambda v: dia_spmv(dia.offsets, dia.bands, v)
        return functools.partial(jitops.spmv, A)
    if callable(A):
        return A
    raise TypeError(f"expected a sparse array or a matvec callable, got {type(A)}")


def _peek_cached(A, op, key):
    """Read an existing layout memo without computing (trace-safe) —
    delegates to ``COO.peek_layout``, which owns the entry format."""
    peek = getattr(A, "peek_layout", None)
    return peek(op, key) if peek is not None else None


def _solver_program(A, key, build):
    """Memoize a jitted whole-solve program on the operand array.

    Defining cond/body closures fresh per call makes ``lax.while_loop``
    re-trace and re-compile the loop EVERY solve (~1.3 s over the TPU
    tunnel — 30x the actual 40 ms solve for a 256² Laplacian CG).
    Caching the compiled program on the COO/GCXS instance (same memo the
    DIA/ELL layouts live in) makes repeated solves reuse it; non-cacheable
    operands (callables, LinearOperators) just rebuild.
    """
    cached = getattr(A, "_cached", None)
    if cached is None or _under_trace():
        return build()
    if getattr(A, "_cache", None) is None:
        A.enable_caching()
    # guard against stale programs when the operand's BUFFERS are replaced
    # (A.data = new_array): the entry records buffer identities and rebuilds
    # on mismatch. (In-place mutation of the buffer contents is outside the
    # contract, same as the reference's enable_caching.)
    bufs = tuple(getattr(A, name, None) for name in ("data", "coords", "indices", "indptr"))
    entry = cached("solver", key, lambda: [bufs, build()])
    if any(a is not b for a, b in zip(entry[0], bufs)):
        entry[0] = bufs
        entry[1] = build()
    return entry[1]


def cg(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None, M=None, return_iters=False):
    """Conjugate gradient for symmetric positive-definite ``A``.

    Returns ``(x, info)`` with scipy's convention: ``info == 0`` on
    convergence (``||r|| <= max(tol * ||b||, atol)``), else the iteration
    count. ``M`` is an optional preconditioner: a callable ``r -> M @ r``
    or a diagonal vector (Jacobi). With ``return_iters`` the result is
    ``(x, info, iterations)``.

    The whole solve (prologue + while_loop + epilogue) is one jitted device
    program, memoized on ``A`` — repeated solves with the same operator skip
    tracing/compilation and run at device speed.
    """
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]
    m_diag = None if (M is None or callable(M)) else jnp.asarray(M)

    def build():
        mv = _as_matvec(A)
        if M is None:
            psolve = lambda r, md: r
        elif callable(M):
            psolve = lambda r, md: M(r)
        else:
            psolve = lambda r, md: r / md

        @jax.jit
        def run(b, x, md, tol, atol, maxiter):
            r = b - mv(x)
            z = psolve(r, md)
            p = z
            rz = _vdot(r, z)
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            # the residual norm rides in the carry: the cond is a scalar
            # compare, not an extra full-vector reduction per iteration
            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, p, rz, _, it = state
                ap = mv(p)
                alpha = rz / _vdot(p, ap)
                x = x + alpha * p
                r = r - alpha * ap
                z = psolve(r, md)
                rz_new = _vdot(r, z)
                p = z + (rz_new / rz) * p
                return x, r, p, rz_new, jnp.linalg.norm(r), it + 1

            x_out, r, _, _, rnorm, it = lax.while_loop(cond, body, (x, r, p, rz, jnp.linalg.norm(r), 0))
            info = jnp.where(rnorm <= target, 0, it)
            return x_out, info, it

        return run

    # callable preconditioners can't be part of a hashable cache key
    key = ("cg", b.shape, b.dtype.name, M is None)
    run = build() if callable(M) else _solver_program(A, key, build)

    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    md = m_diag if m_diag is not None else jnp.ones((1,), b.dtype)
    x, info, it = run(b, x, md, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)
    if return_iters:
        return x, info, it
    return x, info


def bicgstab(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """BiCGSTAB for general (nonsymmetric) ``A``; scipy-style ``(x, info)``.

    One jitted device program, memoized on ``A`` (see ``_solver_program``)."""
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]

    def build():
        mv = _as_matvec(A)

        @jax.jit
        def run(b, x, tol, atol, maxiter):
            r = b - mv(x)
            r_hat = r
            rho = alpha = omega = jnp.ones((), b.dtype)
            v = p = jnp.zeros_like(b)
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, p, v, rho, alpha, omega, _, it = state
                rho_new = _vdot(r_hat, r)
                beta = (rho_new / rho) * (alpha / omega)
                p = r + beta * (p - omega * v)
                v = mv(p)
                alpha = rho_new / _vdot(r_hat, v)
                s = r - alpha * v
                t = mv(s)
                omega = _vdot(t, s) / _vdot(t, t)
                x = x + alpha * p + omega * s
                r = s - omega * t
                return x, r, p, v, rho_new, alpha, omega, jnp.linalg.norm(r), it + 1

            x_out, r, *_, rnorm, it = lax.while_loop(
                cond, body, (x, r, p, v, rho, alpha, omega, jnp.linalg.norm(r), 0)
            )
            return x_out, jnp.where(rnorm <= target, 0, it)

        return run

    run = _solver_program(A, ("bicgstab", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def gmres(A, b, x0=None, *, tol=1e-8, atol=0.0, restart=20, maxiter=None, M=None):
    """Restarted GMRES(m) for general ``A``; scipy-style ``(x, info)``.

    Each restart cycle runs ``restart`` Arnoldi steps (modified
    Gram-Schmidt) and solves the small least-squares problem on the
    Hessenberg matrix; the outer restart loop is a ``lax.while_loop``, so
    the whole solve is one device program. ``maxiter`` counts restart
    cycles (scipy's outer-iteration convention); ``M`` is a right
    preconditioner: a callable ``v -> M @ v`` or a diagonal vector.
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    m = min(restart, n)
    if maxiter is None:
        maxiter = max(10 * n // m, 10)
    m_diag = None if (M is None or callable(M)) else jnp.asarray(M)

    def build():
        mv = _as_matvec(A)
        if M is None:
            psolve = lambda v, md: v
        elif callable(M):
            psolve = lambda v, md: M(v)
        else:
            psolve = lambda v, md: v / md

        @jax.jit
        def run(b, x, md, tol, atol, maxiter):
            return _gmres_program(mv, psolve, m, b, x, md, tol, atol, maxiter)

        return run

    key = ("gmres", b.shape, b.dtype.name, m, M is None)
    run = build() if callable(M) else _solver_program(A, key, build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    md = m_diag if m_diag is not None else jnp.ones((1,), b.dtype)
    return run(b, x, md, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def _gmres_program(mv, psolve_md, m, b, x, md, tol, atol, maxiter):
    n = b.shape[0]
    psolve = lambda v: psolve_md(v, md)
    target = jnp.maximum(tol * jnp.linalg.norm(b), atol)
    eps = jnp.finfo(b.dtype).eps

    def arnoldi_cycle(x, r, beta):
        # guard the normalization: a converged residual produces a zero
        # basis vector, and the cycle becomes a no-op update
        v0 = r / jnp.where(beta > 0, beta, 1.0)
        V0 = jnp.zeros((m + 1, n), b.dtype).at[0].set(v0)
        H0 = jnp.zeros((m + 1, m), b.dtype)

        def step(j, state):
            V, H = state
            w = mv(psolve(V[j]))
            # CGS2: classical Gram-Schmidt with one correction pass — a
            # single pass loses orthogonality by O(kappa) per step and the
            # basis degenerates well before m ~ 50; rows > j are zero so
            # the masked dot products contribute nothing. HIGHEST matmul
            # precision: the default TPU matmul truncates f32 to bf16,
            # exactly the orthogonality these GEMVs exist to preserve.
            mask = (jnp.arange(m + 1) <= j).astype(b.dtype)
            h = jnp.dot(V, w, precision=_HI) * mask
            w = w - jnp.dot(h, V, precision=_HI)
            h2 = jnp.dot(V, w, precision=_HI) * mask
            w = w - jnp.dot(h2, V, precision=_HI)
            h = h + h2
            hnext = jnp.linalg.norm(w)
            w = w / jnp.where(hnext > eps, hnext, 1.0)
            V = V.at[j + 1].set(jnp.where(hnext > eps, w, jnp.zeros_like(w)))
            H = H.at[:, j].set(h).at[j + 1, j].set(hnext)
            return V, H

        V, H = lax.fori_loop(0, m, step, (V0, H0))
        rhs = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
        # least squares via reduced QR + triangular solve, not lstsq: the
        # SVD custom call inside a while_loop crashes libtpu's
        # TransposeFolding pass (null-buffer check), and QR also hands us
        # the residual norm for free: ||rhs||^2 - ||Q^T rhs||^2
        Q, R = jnp.linalg.qr(H)
        qtr = jnp.dot(Q.T, rhs, precision=_HI)
        rdiag = jnp.abs(jnp.diagonal(R))
        # happy breakdown leaves trailing zero columns; a tiny ridge on the
        # dead diagonal entries keeps the solve finite (qtr is ~0 there)
        ridge = jnp.where(rdiag > eps * jnp.maximum(jnp.max(rdiag), 1.0), 0.0, 1.0)
        y = jax.scipy.linalg.solve_triangular(R + jnp.diag(ridge), qtr, lower=False)
        return x + psolve(jnp.dot(y, V[:m], precision=_HI))

    def cond(state):
        *_, beta, it = state
        return (beta > target) & (it < maxiter)

    def body(state):
        x, r, beta, it = state
        x = arnoldi_cycle(x, r, beta)
        # the TRUE residual, one extra matvec per cycle: the GMRES-identity
        # estimate ||rhs - H y|| undershoots by the basis's orthonormality
        # loss (~7x observed at restart≈10), terminating a cycle early; the
        # cond itself stays a scalar compare (a matvec inside the while
        # cond crashes libtpu's TransposeFolding pass)
        r = b - mv(x)
        return x, r, jnp.linalg.norm(r), it + 1

    r0 = b - mv(x)
    x, _, rnorm, it = lax.while_loop(cond, body, (x, r0, jnp.linalg.norm(r0), 0))
    info = jnp.where(rnorm <= target, 0, it)
    return x, info


_HI = jax.lax.Precision.HIGHEST  # noqa: E305


def _lanczos(mv, v0, m, defl=None):
    """``m``-step Lanczos with full reorthogonalization.

    Returns the basis ``V (m, n)`` and tridiagonal coefficients
    ``(alpha (m,), beta (m-1,))``. Full reorthogonalization (two extra
    matvec-free GEMVs per step against the static basis) keeps Ritz pairs
    clean without the bookkeeping of selective schemes — on TPU the extra
    GEMVs are MXU work, the right trade. ``defl`` (d, n) is an optional
    orthonormal deflation basis: every Lanczos vector is also
    orthogonalized against it, confining the recurrence to its orthogonal
    complement (used by the eigsh restarts). All GEMVs run at
    ``precision=HIGHEST`` — the default TPU matmul truncates f32 operands
    to bf16, which is exactly the orthogonality these passes exist to
    preserve."""
    n = v0.shape[0]
    dt = v0.dtype
    eps = jnp.finfo(dt).eps

    def orth_defl(w):
        if defl is None:
            return w
        return w - jnp.dot(jnp.dot(defl, w, precision=_HI), defl, precision=_HI)

    v = orth_defl(v0)
    v = v / jnp.maximum(jnp.linalg.norm(v), eps)
    V0 = jnp.zeros((m, n), dt).at[0].set(v)

    def step(j, state):
        V, alpha, beta = state
        w = mv(V[j])
        a = jnp.dot(V[j], w, precision=_HI)
        w = w - a * V[j]
        # full reorthogonalization against rows 0..j (rows > j are zero)
        mask = (jnp.arange(m) <= j).astype(dt)
        w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
        w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
        w = orth_defl(w)
        b = jnp.linalg.norm(w)
        v_next = w / jnp.where(b > eps, b, 1.0)
        V = lax.cond(
            j + 1 < m,
            lambda V: V.at[j + 1].set(jnp.where(b > eps, v_next, jnp.zeros_like(v_next))),
            lambda V: V,
            V,
        )
        alpha = alpha.at[j].set(a)
        # beta has length m: beta[m-1] is the edge coupling out of the
        # Krylov block — the Lanczos residual estimate needs it
        beta = beta.at[j].set(b)
        return V, alpha, beta

    V, alpha, beta = lax.fori_loop(0, m, step, (V0, jnp.zeros(m, dt), jnp.zeros(m, dt)))
    return V, alpha, beta


def _make_cached_lanczos(A, mv, n, dtype, d_cap, tag="eigsh"):
    """Lanczos dispatcher with a fixed-capacity deflation pad: the variable
    defl row-count otherwise gives every restart a fresh shape (and fresh
    closures give every CALL a fresh trace), re-compiling the fori_loop
    program each time. One trace per (m, d_cap) serves all restarts and all
    eigsh/svds/norm calls on the same operand."""

    def lanczos(v0, m, defl):
        d = 0 if defl is None else defl.shape[0]
        if d > d_cap:  # pragma: no cover - capacity overflow, rare
            return _lanczos(mv, v0, m, defl)
        defl_p = jnp.zeros((d_cap, n), dtype)
        if d:
            defl_p = defl_p.at[:d].set(defl)

        def build():
            return jax.jit(lambda v0, dp: _lanczos(mv, v0, m, dp))

        run = _solver_program(A, ("lanczos", tag, n, m, d_cap, str(dtype)), build)
        return run(v0, defl_p)

    return lanczos


def _eigsh_mv(mv, n, k, *, which="LM", m, key, dtype, v0=None, tol=None, lanczos=None):
    """Restarted-deflated Lanczos core shared by :func:`eigsh`,
    :func:`svds`, and the spectral :func:`norm`.

    Each restart runs a fixed-budget Lanczos confined to the orthogonal
    complement of the converged Ritz vectors, so eigenvalue multiplicities,
    happy breakdowns, AND clustered spectra all resolve: only pairs whose
    Lanczos residual estimate ``|beta_edge * S[last, j]|`` meets ``tol``
    are accepted and deflated; unconverged cluster siblings are re-found by
    later (deflated) restarts instead of being returned at 1% error. Ritz
    pairs supported only by dead (zero-padded) rows are filtered by their
    mass on live rows.
    """
    import numpy as np
    import warnings

    if tol is None:
        tol = 1e-8 if jnp.finfo(dtype).bits >= 64 else 1e-4
    # budget-doubling ceiling: enough headroom to resolve clusters without
    # escalating to an (n, n) dense basis (OOM) on huge operators
    m_cap = min(n, max(32 * k, 4 * m, 320))
    found_vals: list = []
    found_vecs: list = []
    spare_vals: list = []
    spare_vecs: list = []
    spare_res: list = []

    def metric(vals_arr):
        # larger metric == more wanted by `which`
        if which == "LM":
            return np.abs(vals_arr)
        if which == "LA":
            return np.asarray(vals_arr)
        return -np.asarray(vals_arr)

    for restart in range(2 * k + 8):
        if v0 is None or restart > 0:
            key, sub = jax.random.split(key)
            v0 = jax.random.normal(sub, (n,), dtype=dtype)
        defl = jnp.asarray(np.stack(found_vecs)) if found_vecs else None
        if lanczos is not None:
            V, alpha, beta = lanczos(jnp.asarray(v0), m, defl)
        else:
            V, alpha, beta = _lanczos(mv, jnp.asarray(v0), m, defl=defl)
        T = jnp.diag(alpha) + jnp.diag(beta[:-1], 1) + jnp.diag(beta[:-1], -1)
        theta, S = jnp.linalg.eigh(T)
        live_mask = np.asarray(jnp.linalg.norm(V, axis=1) > 0.5)
        live = jnp.asarray(live_mask.astype(np.float64), dtype=S.dtype)
        support = np.asarray(jnp.sum(S * S * live[:, None], axis=0))
        vecs = np.asarray(jnp.dot(S.T, V, precision=_HI))  # rows = Ritz vectors
        theta = np.asarray(theta)
        Snp = np.asarray(S)
        beta_np = np.asarray(beta)
        lr = int(np.flatnonzero(live_mask).max()) if live_mask.any() else 0
        res = np.abs(beta_np[lr] * Snp[lr, :])
        valid = support > 0.5
        if not valid.any():
            break
        # relative acceptance threshold: no 1.0 floor, or matrices with
        # spectral norm << 1 would accept restart-0 Ritz garbage
        scale = max(np.abs(theta[valid]).max(), np.finfo(np.float64).tiny)
        made_progress = False
        round_unconverged = []
        for j in np.flatnonzero(valid):
            vrow = vecs[j]
            nrm = np.linalg.norm(vrow)
            if nrm == 0:
                continue
            if res[j] <= tol * scale:
                found_vals.append(theta[j])
                found_vecs.append(vrow / nrm)
                made_progress = True
            else:
                round_unconverged.append(theta[j])
                spare_vals.append(theta[j])
                spare_vecs.append(vrow / nrm)
                spare_res.append(res[j])
        if len(found_vals) >= k:
            if m >= n:
                break
            # done only when no unconverged Ritz candidate from this round
            # beats the k-th selected value in the `which` direction —
            # Lanczos also converges isolated interior/opposite-end pairs,
            # which must not displace a not-yet-converged wanted extreme
            thr = np.sort(metric(np.asarray(found_vals)))[-k]
            comp = metric(np.asarray(round_unconverged)).max() if round_unconverged else -np.inf
            if comp <= thr + tol * scale:
                break
        if not made_progress:
            if m >= m_cap:
                # budget ceiling and still nothing converged: give up and
                # keep the best unconverged pairs (with a warning below)
                break
            # the budget can't converge anything in this subspace (clustered
            # spectrum) — double the Krylov budget and retry, the restarted
            # form of scipy's "raise ncv"
            m = min(2 * m, m_cap)
        v0 = None
    if len(found_vals) < k:
        missing = k - len(found_vals)
        if spare_vals:
            # best-residual spares first, but skip any spare whose vector
            # overlaps an already-kept pair — stale near-converged copies of
            # an eigenpair found in a LATER restart would otherwise
            # duplicate it and silently drop the true k-th value
            for j in np.argsort(spare_res):
                if len(found_vals) >= k:
                    break
                cand = spare_vecs[j]
                if found_vecs and np.max(np.abs(np.stack(found_vecs) @ cand)) > 0.9:
                    continue
                found_vals.append(spare_vals[j])
                found_vecs.append(cand)
        if len(found_vals) < k:
            raise RuntimeError(
                f"Lanczos found only {len(found_vals)} eigenpairs after restarts; raise ncv"
            )
        warnings.warn(
            f"eigsh: {missing} of {k} Ritz pairs did not reach tol={tol:g}; "
            "raise ncv for clustered spectra",
            RuntimeWarning,
            stacklevel=3,
        )
    vals = np.asarray(found_vals)
    vecs = np.stack(found_vecs)
    if which == "LM":
        order = np.argsort(np.abs(vals))[-k:]
        idx = order[np.argsort(vals[order])]
    elif which == "LA":
        idx = np.argsort(vals)[-k:]
    elif which == "SA":
        idx = np.argsort(vals)[:k]
    else:
        raise ValueError(f"which must be 'LM', 'LA', or 'SA'; got {which!r}")
    return jnp.asarray(vals[idx]), jnp.asarray(vecs[idx].T)


def _shift_invert_solve(A, sigma):
    """Host ``v -> (A - sigma I)^{-1} v`` (one SuperLU factorization, f64).

    Shift-invert Krylov runs entirely on the host: every matvec IS a host
    LU solve, so a device-resident loop would only add transfers — and the
    axon TPU tunnel rejects ``pure_callback`` outright."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("sigma (shift-invert) requires a sparse array operand")
    sp = A.to_scipy_sparse().tocsc().astype("float64")
    lu = spla.splu((sp - sigma * sps.eye(sp.shape[0], format="csc")).tocsc())
    return lu.solve


def _arnoldi_np(mv, v0, m):
    """Host ``m``-step Arnoldi (CGS2), numpy f64. Returns ``(V, H, j)``
    with ``j <= m`` the steps completed before a happy breakdown."""
    import numpy as np

    n = v0.size
    V = np.zeros((m + 1, n))
    H = np.zeros((m + 1, m))
    V[0] = v0 / np.linalg.norm(v0)
    for j in range(m):
        w = mv(V[j]).astype(np.float64)
        h = V[: j + 1] @ w
        w = w - h @ V[: j + 1]
        h2 = V[: j + 1] @ w
        w = w - h2 @ V[: j + 1]
        h = h + h2
        hn = np.linalg.norm(w)
        H[: j + 1, j] = h
        H[j + 1, j] = hn
        if hn <= 1e-14 * max(1.0, np.abs(H).max()):
            return V, H, j + 1
        V[j + 1] = w / hn
    return V, H, m


def _host_si_eigs(solve, n, k, *, m, sym, tol, v0, key, maxiter=10):
    """Restarted host Arnoldi on the shift-inverted operator: returns the
    ``k`` largest-|nu| Ritz pairs of OP = (A - sigma I)^{-1}."""
    import numpy as np

    if v0 is not None:
        seed = np.asarray(v0, dtype=np.float64)
    else:
        seed = np.asarray(jax.random.normal(key, (n,), dtype=jnp.float32), dtype=np.float64)
    nu_s = Y_s = None
    V = j = None
    for _ in range(maxiter):
        V, H, j = _arnoldi_np(solve, seed, m)
        Hm = H[:j, :j]
        if sym:
            nu, Y = np.linalg.eigh((Hm + Hm.T) / 2)
        else:
            nu, Y = np.linalg.eig(Hm)
        if j < k:
            # invariant subspace smaller than k: re-seed randomly
            key, sub = jax.random.split(key)
            seed = np.asarray(jax.random.normal(sub, (n,), dtype=jnp.float32), dtype=np.float64)
            continue
        idx = np.argsort(-np.abs(nu))[:k]
        nu_s, Y_s = nu[idx], Y[:, idx]
        # breakdown at j < m means the Krylov space is invariant: exact
        resid = np.abs(H[j, j - 1] * Y_s[-1, :]) if j == m else np.zeros(k)
        if np.all(resid <= tol * np.maximum(np.abs(nu_s), 1e-30)):
            break
        restart = (V[:j].T @ Y_s.sum(axis=1)).real
        nrm = np.linalg.norm(restart)
        if not np.isfinite(nrm) or nrm < 1e-12:
            key, sub = jax.random.split(key)
            restart = np.asarray(jax.random.normal(sub, (n,), dtype=jnp.float32), dtype=np.float64)
            nrm = np.linalg.norm(restart)
        seed = restart / nrm
    X = V[:j].T @ Y_s
    X = X / np.linalg.norm(X, axis=0, keepdims=True)
    return nu_s, X


def eigsh(A, k=6, *, which="LM", v0=None, ncv=None, key=None, tol=None, sigma=None):
    """Top-``k`` eigenpairs of a symmetric sparse matrix via Lanczos.

    The Krylov builds run on device (:func:`_lanczos`: fori-loop steps,
    full reorthogonalization at HIGHEST matmul precision); the small
    tridiagonal problem is one ``jnp.linalg.eigh``. Degenerate spectra
    (eigenvalue multiplicity, early breakdown) are handled by deflated
    restarts. ``which``: 'LM' (largest magnitude), 'LA' (largest
    algebraic), 'SA' (smallest algebraic). Returns
    ``(eigenvalues, eigenvectors)`` in scipy's ascending order. Fixed
    Krylov budget ``ncv`` (default ``min(n, max(4k, 40))``) per restart —
    raise ``ncv`` for clustered spectra.

    With ``sigma`` the problem runs in shift-invert mode (scipy parity):
    a host Krylov loop over ``(A - sigma I)^{-1}`` (every matvec IS a host
    LU solve, so the loop lives there too — :func:`_host_si_eigs`) and the
    ``k`` eigenvalues *closest to sigma* come back as ``sigma + 1/nu``.
    """
    import numpy as np

    n = A.shape[0]
    if not 0 < k < n:
        raise ValueError(f"k must be in (0, n); got k={k}, n={n}")
    if which not in ("LM", "LA", "SA"):
        raise ValueError(f"which must be 'LM', 'LA', or 'SA'; got {which!r}")
    m = min(n, max(4 * k, 40)) if ncv is None else min(max(ncv, k + 1), n)
    dt = jnp.asarray(A.data).dtype if hasattr(A, "data") else jnp.float64
    if key is None:
        key = jax.random.PRNGKey(0)
    if sigma is not None:
        if which != "LM":
            raise ValueError("shift-invert mode supports which='LM' (closest to sigma)")
        solve = _shift_invert_solve(A, sigma)
        nu, vecs = _host_si_eigs(
            solve, n, k, m=m, sym=True, tol=tol if tol is not None else 1e-10, v0=v0, key=key
        )
        w = sigma + 1.0 / np.asarray(nu)
        order = np.argsort(w)
        return jnp.asarray(w[order], dtype=dt), jnp.asarray(vecs[:, order], dtype=dt)
    mv = _as_matvec(A)
    lanczos = None if _under_trace() else _make_cached_lanczos(A, mv, n, dt, k + 8)
    return _eigsh_mv(mv, n, k, which=which, m=m, key=key, dtype=dt, v0=v0, tol=tol, lanczos=lanczos)


def svds(A, k=6, *, ncv=None, key=None, tol=None):
    """Top-``k`` singular triplets of a sparse matrix, scipy-ordered
    ``(U, s, Vh)`` with ``s`` ascending.

    Runs the deflated-restart Lanczos on the Gram operator
    ``v -> Aᵀ(A v)`` (the two SpMVs stay on device per step) and recovers
    the left vectors as ``A V / s``. The squared conditioning is fine for
    well-separated leading singular values; raise ``ncv`` otherwise.
    """
    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("svds requires a sparse array (needs Aᵀ for the Gram operator)")
    n_min = min(A.shape)
    if not 0 < k < n_min:
        raise ValueError(f"k must be in (0, min(A.shape)); got k={k}, shape={A.shape}")
    mv = _as_matvec(A)
    mvt = _as_matvec(A.transpose())
    n_cols = A.shape[1]
    dt = jnp.asarray(A.data).dtype
    m = min(n_cols, max(4 * k, 40)) if ncv is None else min(max(ncv, k + 1), n_cols)
    gram = lambda v: mvt(mv(v))
    lanczos = None if _under_trace() else _make_cached_lanczos(A, gram, n_cols, dt, k + 8, tag="svds-gram")
    vals, V = _eigsh_mv(
        gram, n_cols, k, which="LA", m=m, key=jax.random.PRNGKey(0), dtype=dt, tol=tol, lanczos=lanczos
    )
    s = jnp.sqrt(jnp.clip(vals, 0))
    AV = jnp.stack([mv(V[:, i]) for i in range(k)], axis=1)
    U = AV / jnp.where(s > 0, s, 1.0)[None, :]
    return U, s, V.T


def lobpcg(A, k=4, *, X=None, maxiter=100, tol=None, key=None, n=None):
    """Top-``k`` (largest) eigenpairs via block LOBPCG.

    Wraps ``jax.experimental.sparse.linalg.lobpcg_standard`` with a block
    matvec over the sparse pytree (one SpMM per iteration — MXU-friendly,
    unlike the vector-at-a-time Lanczos in :func:`eigsh`). Returns
    ``(eigenvalues, eigenvectors, iterations)`` with eigenvalues ascending.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    from .core.base import SparseArray

    if isinstance(A, SparseArray):
        n = A.shape[0]
        op = functools.partial(jitops.spmm, A)
        dt = jnp.asarray(A.data).dtype
    elif callable(A):
        if n is None and X is None:
            raise ValueError("lobpcg with a matvec callable needs `n` or an explicit `X`")
        n = X.shape[0] if n is None else n
        op = lambda V: jax.vmap(A, in_axes=1, out_axes=1)(V)
        dt = jnp.float64
    else:
        raise TypeError(f"expected a sparse array or matvec callable, got {type(A)}")
    if not 0 < k < n // 2:
        raise ValueError(f"lobpcg requires 0 < k < n/2; got k={k}, n={n}")
    if X is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        X = jax.random.normal(key, (n, k), dtype=dt)
    theta, U, iters = lobpcg_standard(op, jnp.asarray(X), m=maxiter, tol=tol)
    order = jnp.argsort(theta)
    return theta[order], U[:, order], iters


def minres(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """MINRES for symmetric (possibly indefinite) ``A``; scipy-style
    ``(x, info)``.

    Paige-Saunders three-term Lanczos with Givens rotations, whole-loop
    jitted; the rotated residual norm ``|eta|`` rides in the carry so the
    cond is a scalar compare. Use :func:`cg` when ``A`` is definite.
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n

    def build():
        mv = _as_matvec(A)
        return jax.jit(lambda b, x, tol, atol, maxiter: _minres_program(mv, b, x, tol, atol, maxiter))

    run = _solver_program(A, ("minres", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def _minres_program(mv, b, x, tol, atol, maxiter):
    r = b - mv(x)
    beta1 = jnp.linalg.norm(r)
    target = jnp.maximum(tol * jnp.linalg.norm(b), atol)
    safe_beta1 = jnp.where(beta1 > 0, beta1, 1.0)
    v = r / safe_beta1
    v_prev = jnp.zeros_like(b)
    w = jnp.zeros_like(b)
    w_prev = jnp.zeros_like(b)
    one = jnp.ones((), b.dtype)
    zero = jnp.zeros((), b.dtype)

    def cond(state):
        *_, eta_abs, it = state
        return (eta_abs > target) & (it < maxiter)

    def body(state):
        x, v, v_prev, w, w_prev, beta, gamma0, gamma1, sigma0, sigma1, eta, _, it = state
        av = mv(v)
        alpha = _vdot(v, av)
        v_next = av - alpha * v - beta * v_prev
        beta_next = jnp.linalg.norm(v_next)
        v_next = v_next / jnp.where(beta_next > 0, beta_next, 1.0)
        # apply the two previous Givens rotations to the new tridiag column
        delta = gamma1 * alpha - gamma0 * sigma1 * beta
        rho2 = sigma1 * alpha + gamma0 * gamma1 * beta
        rho3 = sigma0 * beta
        rho1 = jnp.sqrt(delta * delta + beta_next * beta_next)
        rho1s = jnp.where(rho1 > 0, rho1, 1.0)
        gamma_new = delta / rho1s
        sigma_new = beta_next / rho1s
        w_next = (v - rho3 * w_prev - rho2 * w) / rho1s
        x = x + gamma_new * eta * w_next
        eta_new = -sigma_new * eta
        return (
            x, v_next, v, w_next, w, beta_next,
            gamma1, gamma_new, sigma1, sigma_new, eta_new,
            jnp.abs(eta_new), it + 1,
        )

    init = (x, v, v_prev, w, w_prev, zero, one, one, zero, zero, beta1, beta1, 0)
    x, *_, it = lax.while_loop(cond, body, init)
    rnorm = jnp.linalg.norm(b - mv(x))
    info = jnp.where(rnorm <= jnp.maximum(target, 10 * jnp.finfo(b.dtype).eps * beta1), 0, it)
    return x, info


def lsqr(A, b, *, tol=1e-8, atol=0.0, maxiter=None):
    """Least-squares ``min ||A x - b||_2`` for (rectangular) sparse ``A``
    via CGLS — the conjugate-gradient form of LSQR (same Krylov space),
    whole-loop jitted like the other solvers.

    Returns ``(x, info)``: ``info == 0`` when the normal-equation residual
    satisfies ``||Aᵀ(b - A x)|| <= max(tol * ||Aᵀ b||, atol)``, else the
    iteration count. Consistent square systems converge to the solution;
    inconsistent overdetermined systems to the least-squares minimizer.
    """
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * max(A.shape)

    def build():
        mv, mvt, shape = _as_matvec_pair(A)
        n_cols = shape[1]

        @jax.jit
        def run(b, tol, atol, maxiter):
            x = jnp.zeros(n_cols, b.dtype)
            r = b
            s = mvt(r)
            p = s
            gamma = _vdot(s, s)
            target = jnp.maximum(tol * jnp.sqrt(gamma), atol)

            def cond(state):
                *_, gnorm, it = state
                return (gnorm > target) & (it < maxiter)

            def body(state):
                x, r, p, gamma, _, it = state
                q = mv(p)
                alpha = gamma / _vdot(q, q)
                x = x + alpha * p
                r = r - alpha * q
                s = mvt(r)
                gamma_new = _vdot(s, s)
                p = s + (gamma_new / gamma) * p
                return x, r, p, gamma_new, jnp.sqrt(gamma_new), it + 1

            x, *_, gnorm, it = lax.while_loop(cond, body, (x, r, p, gamma, jnp.sqrt(gamma), 0))
            return x, jnp.where(gnorm <= target, 0, it)

        return run

    run = _solver_program(A, ("lsqr", b.shape, b.dtype.name), build)
    return run(b, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def expm_multiply(A, b, *, t=1.0, m=30):
    """``exp(t A) @ b`` without forming the (dense) matrix exponential.

    Krylov approximation: build an ``m``-step Arnoldi basis of ``A`` at
    ``b`` (device fori-loop, modified Gram-Schmidt) and lift the small
    Hessenberg exponential back: ``||b|| · V exp(t H) e1`` — the standard
    polynomial-Krylov scheme. Exact when ``m >= n``; raise ``m`` for large
    ``|t| * ||A||``. Works for general (nonsymmetric) ``A``; the matrix
    may be a sparse pytree or a matvec callable (pass ``n`` implicitly via
    ``b``).
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    m = min(m, n)

    def build():
        mv = _as_matvec(A)

        @jax.jit
        def run(b, t):
            beta = jnp.linalg.norm(b)
            eps = jnp.finfo(b.dtype).eps
            v0 = b / jnp.where(beta > 0, beta, 1.0)
            V0 = jnp.zeros((m + 1, n), b.dtype).at[0].set(v0)
            H0 = jnp.zeros((m + 1, m), b.dtype)

            def step(j, state):
                V, H = state
                w = mv(V[j])
                # CGS2 at HIGHEST precision (see gmres): keeps the basis orthonormal
                mask = (jnp.arange(m + 1) <= j).astype(b.dtype)
                h = jnp.dot(V, w, precision=_HI) * mask
                w = w - jnp.dot(h, V, precision=_HI)
                h2 = jnp.dot(V, w, precision=_HI) * mask
                w = w - jnp.dot(h2, V, precision=_HI)
                h = h + h2
                hnext = jnp.linalg.norm(w)
                w = w / jnp.where(hnext > eps, hnext, 1.0)
                V = V.at[j + 1].set(jnp.where(hnext > eps, w, jnp.zeros_like(w)))
                H = H.at[:, j].set(h).at[j + 1, j].set(hnext)
                return V, H

            V, H = lax.fori_loop(0, m, step, (V0, H0))
            # small dense exponential (Pade + scaling-squaring on device)
            eHt = jax.scipy.linalg.expm(t * H[:m, :m])
            return beta * jnp.dot(eHt[:, 0], V[:m], precision=_HI)

        return run

    run = _solver_program(A, ("expm_multiply", b.shape, b.dtype.name, m), build)
    return run(b, jnp.asarray(t, b.dtype))


def norm(A, ord="fro", axis=None):
    """Matrix/vector norm of a sparse array (scipy.sparse.linalg.norm parity).

    ``ord``: 'fro' (default), 1, inf, or 0-like variants over an ``axis``.
    Requires zero fill (norms of a nonzero-fill array densify).
    """
    import numpy as np

    from .core.base import SparseArray
    from .ops.common import asCOO

    if not isinstance(A, SparseArray):
        raise TypeError("norm expects a sparse array")
    if not np.asarray(A.fill_value)[()] == 0:
        raise ValueError("norm requires a zero fill value")
    coo = asCOO(A)
    data = np.asarray(coo.data)
    if axis is None:
        if coo.ndim == 1:
            if ord in (None, 2, "fro", "f"):
                return float(np.sqrt((np.abs(data) ** 2).sum()))
            if ord == 1:
                return float(np.abs(data).sum())
            if ord == np.inf:
                return float(np.abs(data).max(initial=0.0))
            raise ValueError(f"invalid norm order {ord!r} for vectors")
        if coo.ndim != 2:
            raise ValueError("matrix norms require a 2-D array")
        if ord in ("fro", "f", None):
            return float(np.sqrt((np.abs(data) ** 2).sum()))
        if ord == 2:
            # spectral norm (scipy parity): largest singular value
            if min(coo.shape) <= 2 or coo.nnz == 0:
                return float(np.linalg.norm(coo.todense(), 2))
            _, s, _ = svds(coo, k=1)
            return float(s[0])
        if ord == 1:  # max column sum
            return float(abs(coo).sum(axis=0).todense().max(initial=0.0))
        if ord == np.inf:  # max row sum
            return float(abs(coo).sum(axis=1).todense().max(initial=0.0))
        raise ValueError(f"invalid norm order {ord!r}")
    # axis-wise reductions return dense vectors like scipy
    if ord in (None, 2, "fro", "f"):
        return np.sqrt((abs(coo) ** 2).sum(axis=axis).todense())
    if ord == 1:
        return abs(coo).sum(axis=axis).todense()
    if ord == np.inf:
        return abs(coo).max(axis=axis).todense()
    raise ValueError(f"invalid norm order {ord!r}")


def spsolve(A, b):
    """Direct solve ``A x = b`` via the host sparse LU (SuperLU through
    scipy) — the eager-path bridge for small/medium systems.

    The reference reaches ``spsolve`` only by duck-typing into scipy
    (``sparse/tests/test_backends.py:88-95``); this wrapper makes the same
    workflow first-class. For large systems prefer the device-native
    iterative solvers (:func:`cg`, :func:`gmres`, :func:`bicgstab`).
    """
    import numpy as np
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("spsolve expects a sparse array")
    return spla.spsolve(A.to_scipy_sparse().tocsr(), np.asarray(b))


def power_iteration(A, *, key=None, v0=None, tol=1e-9, maxiter=1000):
    """Dominant eigenpair of ``A`` by normalized power iteration.

    Returns ``(eigenvalue, eigenvector, iterations)``; the whole loop is
    one device program (the on-device form of the reference's HITS
    example workload, ``examples/hits_example.py``).
    """
    if v0 is None:
        n = A.shape[0]
        dt = jnp.asarray(A.data).dtype if hasattr(A, "data") else jnp.float64
        if key is None:
            key = jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, (n,), dtype=dt)
    v0 = jnp.asarray(v0)

    def build():
        mv = _as_matvec(A)

        @jax.jit
        def run(v0, tol, maxiter):
            v = v0 / jnp.linalg.norm(v0)

            def cond(state):
                v, v_prev, it = state
                return (jnp.linalg.norm(v - v_prev) > tol) & (it < maxiter)

            def body(state):
                v, _, it = state
                w = mv(v)
                w = w / jnp.linalg.norm(w)
                # fix the sign so the convergence test is orientation-free
                w = w * jnp.sign(_vdot(w, v))
                return w, v, it + 1

            v, _, it = lax.while_loop(cond, body, (v, jnp.full_like(v, jnp.inf), 0))
            return _vdot(v, mv(v)), v, it

        return run

    run = _solver_program(A, ("power", v0.shape, v0.dtype.name), build)
    return run(v0, jnp.asarray(tol, jnp.real(v0).dtype), maxiter)


def cgs(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """Conjugate Gradient Squared for general ``A`` (transpose-free);
    scipy-style ``(x, info)``, whole-loop jitted like :func:`bicgstab`."""
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]

    def build():
        mv = _as_matvec(A)

        @jax.jit
        def run(b, x, tol, atol, maxiter):
            r = b - mv(x)
            r_hat = r
            u = r
            p = r
            rho = _vdot(r_hat, r)
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, u, p, rho, _, it = state
                v = mv(p)
                sigma = _vdot(r_hat, v)
                alpha = rho / jnp.where(sigma != 0, sigma, 1.0)
                q = u - alpha * v
                x = x + alpha * (u + q)
                r = r - alpha * mv(u + q)
                rho_new = _vdot(r_hat, r)
                beta = rho_new / jnp.where(rho != 0, rho, 1.0)
                u = r + beta * q
                p = u + beta * (q + beta * p)
                return x, r, u, p, rho_new, jnp.linalg.norm(r), it + 1

            x, *_, rnorm, it = lax.while_loop(cond, body, (x, r, u, p, rho, jnp.linalg.norm(r), 0))
            return x, jnp.where(rnorm <= target, 0, it)

        return run

    run = _solver_program(A, ("cgs", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def tfqmr(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """Transpose-Free QMR (Freund '93) for general ``A``; scipy-style
    ``(x, info)``. Two matvecs per iteration, smoother convergence than
    :func:`cgs` on the same Krylov space; the quasi-residual bound
    ``tau * sqrt(2(it+1))`` rides in the carry so the loop cond stays a
    scalar compare, and ``info`` uses the true final residual."""
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]

    def build():
        mv = _as_matvec(A)
        return jax.jit(lambda b, x, tol, atol, maxiter: _tfqmr_program(mv, b, x, tol, atol, maxiter))

    run = _solver_program(A, ("tfqmr", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def _tfqmr_program(mv, b, x, tol, atol, maxiter):
    r0 = b - mv(x)
    r_star = r0
    u = r0
    w = r0
    au = mv(u)  # A u, carried separately: v is the search direction, not A u
    v = au
    d = jnp.zeros_like(b)
    tau = jnp.linalg.norm(r0)
    theta = jnp.zeros((), b.dtype)
    eta = jnp.zeros((), b.dtype)
    rho = _vdot(r_star, r0)
    target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

    def half_step(x, w, d, u_j, au_j, alpha, tau, theta, eta):
        w = w - alpha * au_j
        safe_a = jnp.where(alpha != 0, alpha, 1.0)
        d = u_j + (theta * theta * eta / safe_a) * d
        theta = jnp.linalg.norm(w) / jnp.where(tau > 0, tau, 1.0)
        c = 1.0 / jnp.sqrt(1.0 + theta * theta)
        tau = tau * theta * c
        eta = c * c * alpha
        x = x + eta * d
        return x, w, d, tau, theta, eta

    def cond(state):
        *_, bound, it = state
        return (bound > target) & (it < maxiter)

    def body(state):
        x, w, d, u, au, v, rho, tau, theta, eta, _, it = state
        sigma = _vdot(r_star, v)
        alpha = rho / jnp.where(sigma != 0, sigma, 1.0)
        u2 = u - alpha * v
        # even half-step consumes A u; the odd one A u2 (fresh matvec)
        x, w, d, tau, theta, eta = half_step(x, w, d, u, au, alpha, tau, theta, eta)
        au2 = mv(u2)
        x, w, d, tau, theta, eta = half_step(x, w, d, u2, au2, alpha, tau, theta, eta)
        rho_new = _vdot(r_star, w)
        beta = rho_new / jnp.where(rho != 0, rho, 1.0)
        u = w + beta * u2
        au = mv(u)
        v = au + beta * (au2 + beta * v)
        bound = tau * jnp.sqrt(2.0 * (it + 1.0))
        return x, w, d, u, au, v, rho_new, tau, theta, eta, bound, it + 1

    init = (x, w, d, u, au, v, rho, tau, theta, eta, tau, 0)
    x, *_, it = lax.while_loop(cond, body, init)
    rnorm = jnp.linalg.norm(b - mv(x))
    info = jnp.where(rnorm <= jnp.maximum(target, jnp.asarray(10.0, b.dtype) * jnp.finfo(b.dtype).eps * tau), 0, it)
    return x, info


def lsmr(A, b, *, tol=1e-8, atol=0.0, maxiter=None):
    """Least squares via LSMR (Fong & Saunders 2011): MINRES on the normal
    equations through Golub-Kahan bidiagonalization — the normal-equation
    residual ``||Aᵀr||`` decreases monotonically, unlike :func:`lsqr`'s.

    Accepts a sparse array or a :class:`LinearOperator` with ``rmatvec``.
    Returns ``(x, info)`` with the same convention as :func:`lsqr`:
    ``info == 0`` when ``||Aᵀ(b - A x)|| <= max(tol * ||Aᵀ b||, atol)``.
    """
    b = jnp.asarray(b)

    def build():
        mv, rmv, shape = _as_matvec_pair(A)
        return jax.jit(
            lambda b, tol, atol, maxiter: _lsmr_program(mv, rmv, shape, b, tol, atol, maxiter)
        )

    shape = A.shape
    if maxiter is None:
        maxiter = 10 * max(shape)
    run = _solver_program(A, ("lsmr", b.shape, b.dtype.name), build)
    return run(b, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def _lsmr_program(mv, rmv, shape, b, tol, atol, maxiter):
    beta0 = jnp.linalg.norm(b)
    u = b / jnp.where(beta0 > 0, beta0, 1.0)
    v_raw = rmv(u)
    alpha0 = jnp.linalg.norm(v_raw)
    v = v_raw / jnp.where(alpha0 > 0, alpha0, 1.0)
    x = jnp.zeros(shape[1], b.dtype)
    h = v
    hbar = jnp.zeros_like(v)
    one = jnp.ones((), b.dtype)
    zero = jnp.zeros((), b.dtype)
    zetabar0 = alpha0 * beta0  # == ||Aᵀ b||
    target = jnp.maximum(tol * zetabar0, atol)

    def cond(state):
        *_, normar, it = state
        return (normar > target) & (it < maxiter)

    def body(state):
        (x, u, v, h, hbar, alpha, alphabar, zetabar, rho_p, rhobar_p, cbar, sbar, _, it) = state
        u = mv(v) - alpha * u
        beta = jnp.linalg.norm(u)
        u = u / jnp.where(beta > 0, beta, 1.0)
        v_new = rmv(u) - beta * v
        alpha_new = jnp.linalg.norm(v_new)
        v_new = v_new / jnp.where(alpha_new > 0, alpha_new, 1.0)

        rho = jnp.sqrt(alphabar * alphabar + beta * beta)
        rho_s = jnp.where(rho > 0, rho, 1.0)
        c = alphabar / rho_s
        s = beta / rho_s
        theta_new = s * alpha_new
        alphabar_new = c * alpha_new

        thetabar = sbar * rho
        rhobar = jnp.sqrt((cbar * rho) ** 2 + theta_new * theta_new)
        rhobar_s = jnp.where(rhobar > 0, rhobar, 1.0)
        cbar_new = cbar * rho / rhobar_s
        sbar_new = theta_new / rhobar_s
        zeta = cbar_new * zetabar
        zetabar_new = -sbar_new * zetabar

        denom = jnp.where(rho_p * rhobar_p != 0, rho_p * rhobar_p, 1.0)
        hbar = h - (thetabar * rho / denom) * hbar
        x = x + (zeta / jnp.where(rho * rhobar != 0, rho * rhobar, 1.0)) * hbar
        h = v_new - (theta_new / rho_s) * h
        return (
            x, u, v_new, h, hbar, alpha_new, alphabar_new, zetabar_new,
            rho, rhobar, cbar_new, sbar_new, jnp.abs(zetabar_new), it + 1,
        )

    init = (x, u, v, h, hbar, alpha0, alpha0, zetabar0, one, one, one, zero, zetabar0, 0)
    x, *_, normar, it = lax.while_loop(cond, body, init)
    # scipy's istop convention: trust the recurrence's ||Aᵀr|| estimate
    # (|zetabar|) — recomputing the true normal residual flags f32 solves
    # whose truth stagnates a hair above target while x is already at the
    # rounding floor (observed on TPU: res 1e-5, info nonzero otherwise)
    info = jnp.where(normar <= target, 0, it)
    return x, info


def onenormest(A, t=2, itmax=5, compute_v=False, compute_w=False, key=None):
    """Estimate ``||A||_1`` by the Higham–Tisseur block power method
    (scipy.sparse.linalg.onenormest parity) — a lower bound that is almost
    always exact, using only ``matvec``/``rmatvec`` (t column probes per
    pass, at most ``itmax`` passes)."""
    import numpy as np

    mv, rmv, shape = _as_matvec_pair(A)
    n = shape[1]
    if shape[0] != n:
        raise ValueError("onenormest expects a square operator")
    t = min(t, n)
    if key is None:
        key = jax.random.PRNGKey(1)

    def mm(f, X):
        return np.stack([np.asarray(f(jnp.asarray(X[:, j]))) for j in range(X.shape[1])], axis=1)

    X = np.ones((n, t)) / n
    if t > 1:
        signs = np.asarray(jax.random.rademacher(key, (n, t - 1), dtype=jnp.int32))
        X[:, 1:] = signs / n
    est_old = 0.0
    ind_hist = np.zeros(n, dtype=bool)
    v_best = np.zeros(n)
    w_best = None
    for k in range(itmax):
        Y = mm(mv, X)
        norms = np.abs(Y).sum(axis=0)
        j_best = int(np.argmax(norms))
        est = float(norms[j_best])
        if est > est_old:
            v_best = X[:, j_best]
            w_best = Y[:, j_best]
        if k > 0 and est <= est_old:
            est = est_old
            break
        est_old = est
        S = np.where(Y >= 0, 1.0, -1.0)
        Z = mm(rmv, S)
        h = np.abs(Z).max(axis=1)
        if k > 0 and float(h.max()) <= float((Z[:, 0] * X[:, 0]).sum()):
            break
        order = np.argsort(-h)
        fresh = [i for i in order if not ind_hist[i]][:t]
        if not fresh:
            break
        X = np.zeros((n, t))
        for c, i in enumerate(fresh):
            X[i, c] = 1.0
            ind_hist[i] = True
    if w_best is None:
        w_best = mm(mv, v_best[:, None])[:, 0]
    if compute_v and compute_w:
        return est, v_best, w_best
    if compute_v:
        return est, v_best
    if compute_w:
        return est, w_best
    return est


def inv(A):
    """Sparse inverse via the host direct factorization (SuperLU through
    scipy) — the same eager bridge as :func:`spsolve`; returns COO.
    Prefer solving systems over forming inverses."""
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray
    from .core.coo import COO

    if not isinstance(A, SparseArray):
        raise TypeError("inv expects a sparse array")
    out = spla.inv(A.to_scipy_sparse().tocsc())
    return COO.from_scipy_sparse(out)


def expm(A):
    """Sparse matrix exponential (Padé + scaling-squaring on the host via
    scipy) — returns COO. For the action ``exp(tA) @ b`` without forming
    the exponential, use :func:`expm_multiply`."""
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray
    from .core.coo import COO

    if not isinstance(A, SparseArray):
        raise TypeError("expm expects a sparse array")
    out = spla.expm(A.to_scipy_sparse().tocsc())
    return COO.from_scipy_sparse(out)


def matrix_power(A, power):
    """``A ** power`` for square sparse ``A`` by binary exponentiation over
    the eager SpGEMM (scipy.sparse.linalg.matrix_power parity); ``power ==
    0`` returns the sparse identity."""
    import numpy as np

    from .core.base import SparseArray
    from .ops.creation import eye

    if not isinstance(A, SparseArray):
        raise TypeError("matrix_power expects a sparse array")
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise ValueError("matrix_power expects a square matrix")
    power = int(power)
    if power < 0:
        raise ValueError("negative powers are not supported (invert explicitly)")
    if power == 0:
        return eye(A.shape[0], dtype=np.asarray(A.data).dtype)
    result = None
    base = A
    while power:
        if power & 1:
            result = base if result is None else result @ base
        power >>= 1
        if power:
            base = base @ base
    return result


def spsolve_triangular(A, b, lower=True, unit_diagonal=False):
    """Triangular solve ``A x = b`` on the host (scipy bridge, like
    :func:`spsolve`): substitution is inherently sequential, so it stays
    an eager host path rather than a device loop."""
    import numpy as np
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("spsolve_triangular expects a sparse array")
    return spla.spsolve_triangular(
        A.to_scipy_sparse().tocsr(), np.asarray(b), lower=lower, unit_diagonal=unit_diagonal
    )


class _SuperLUFactor:
    """Thin wrapper over scipy's SuperLU object: ``solve(b)`` plus the
    permutation/L/U constituents re-exposed as sparse_tpu arrays."""

    def __init__(self, slu):
        self._slu = slu
        self.shape = slu.shape
        self.nnz = slu.nnz
        self.perm_r = slu.perm_r
        self.perm_c = slu.perm_c

    def solve(self, b, trans="N"):
        import numpy as np

        return self._slu.solve(np.asarray(b), trans=trans)

    @property
    def L(self):
        from .core.coo import COO

        return COO.from_scipy_sparse(self._slu.L.tocoo())

    @property
    def U(self):
        from .core.coo import COO

        return COO.from_scipy_sparse(self._slu.U.tocoo())


def splu(A, **kwargs):
    """LU-factorize ``A`` once (host SuperLU bridge) for repeated solves:
    returns an object with ``.solve(b)``, ``.L``/``.U`` as COO, and the
    row/column permutations."""
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("splu expects a sparse array")
    return _SuperLUFactor(spla.splu(A.to_scipy_sparse().tocsc(), **kwargs))


def spilu(A, **kwargs):
    """Incomplete LU (host SuperLU bridge) — the standard preconditioner
    factory: ``M = spilu(A); cg(A, b, M=M.solve)``."""
    import scipy.sparse.linalg as spla

    from .core.base import SparseArray

    if not isinstance(A, SparseArray):
        raise TypeError("spilu expects a sparse array")
    return _SuperLUFactor(spla.spilu(A.to_scipy_sparse().tocsc(), **kwargs))


def factorized(A):
    """``factorized(A)(b)`` solves ``A x = b`` reusing one LU factorization
    (scipy parity; host bridge)."""
    return splu(A).solve


def _arnoldi(mv, v0, m):
    """``m``-step Arnoldi with CGS2 reorthogonalization: returns
    ``V ((m+1, n))`` and the Hessenberg ``H ((m+1, m))``. Same GEMV
    discipline as :func:`_lanczos` (HIGHEST precision, masked classical
    Gram-Schmidt with one correction pass)."""
    n = v0.shape[0]
    dt = v0.dtype
    eps = jnp.finfo(dt).eps
    v = v0 / jnp.maximum(jnp.linalg.norm(v0), eps)
    V0 = jnp.zeros((m + 1, n), dt).at[0].set(v)
    H0 = jnp.zeros((m + 1, m), dt)

    def step(j, state):
        V, H = state
        w = mv(V[j])
        mask = (jnp.arange(m + 1) <= j).astype(dt)
        h = jnp.dot(V, w, precision=_HI) * mask
        w = w - jnp.dot(h, V, precision=_HI)
        h2 = jnp.dot(V, w, precision=_HI) * mask
        w = w - jnp.dot(h2, V, precision=_HI)
        h = h + h2
        hnext = jnp.linalg.norm(w)
        w = w / jnp.where(hnext > eps, hnext, 1.0)
        V = V.at[j + 1].set(jnp.where(hnext > eps, w, jnp.zeros_like(w)))
        H = H.at[:, j].set(h).at[j + 1, j].set(hnext)
        return V, H

    return lax.fori_loop(0, m, step, (V0, H0))


def _select_ritz(w, which, k):
    import numpy as np

    keys = {
        "LM": -np.abs(w),
        "SM": np.abs(w),
        "LR": -w.real,
        "SR": w.real,
        "LI": -w.imag,
        "SI": w.imag,
    }
    if which not in keys:
        raise ValueError(f"which must be one of {sorted(keys)}, got {which!r}")
    return np.argsort(keys[which], kind="stable")[:k]


def eigs(A, k=6, *, which="LM", ncv=None, maxiter=None, tol=None, v0=None, key=None, sigma=None):
    """``k`` eigenpairs of a general (nonsymmetric) ``A`` by restarted
    Arnoldi — the scipy.sparse.linalg.eigs surface.

    The ``ncv``-step Arnoldi factorization runs as one device program
    (:func:`_arnoldi`); only the small ``(ncv, ncv)`` Hessenberg eigenproblem
    is solved on the host (complex Schur work XLA:TPU doesn't expose).
    Restarts re-seed with the sum of the wanted Ritz vectors — explicit
    restarting, robust for well-separated ``which``-extremal spectra;
    raise ``ncv`` for clustered ones. Returns ``(w, X)`` complex, Ritz
    residuals ``||A x - w x|| <= tol * |w|``.

    With ``sigma``, a host Arnoldi runs on ``(A - sigma I)^{-1}``
    (:func:`_host_si_eigs`) and returns the ``k`` eigenvalues closest
    to ``sigma`` as ``sigma + 1/nu`` (``which`` must stay 'LM').
    """
    import numpy as np

    if sigma is not None:
        if which != "LM":
            raise ValueError("shift-invert mode supports which='LM' (closest to sigma)")
        n = A.shape[0]
        m_si = min(n, ncv if ncv is not None else max(2 * k + 1, 20))
        solve = _shift_invert_solve(A, sigma)
        nu, X = _host_si_eigs(
            solve, n, k, m=m_si, sym=False,
            tol=tol if tol is not None else 1e-10, v0=v0,
            key=key if key is not None else jax.random.PRNGKey(0),
        )
        return sigma + 1.0 / nu, X
    mv = _as_matvec(A)
    n = A.shape[0]
    if k >= n - 1:
        raise ValueError("k must be < n - 1 for Arnoldi; densify for full spectra")
    m = min(n, ncv if ncv is not None else max(2 * k + 1, 20))
    if maxiter is None:
        maxiter = 10
    if key is None:
        key = jax.random.PRNGKey(0)
    dt = jnp.asarray(A.data).dtype if hasattr(A, "data") else jnp.float64
    if v0 is None:
        v0 = jax.random.normal(key, (n,), dtype=dt)
    v0 = jnp.asarray(v0, dtype=dt)
    if tol is None:
        tol = 1e-6 if jnp.finfo(dt).bits >= 64 else 1e-4

    # memoized on A: a fresh jit closure would re-trace the Arnoldi
    # fori-program on every eigs() call (restarts within a call already
    # shared it)
    arnoldi = _solver_program(
        A, ("arnoldi", n, dt.name), lambda: jax.jit(functools.partial(_arnoldi, mv), static_argnums=1)
    )
    w_sel = X_small = None
    V_host = None
    for _ in range(maxiter):
        V, H = arnoldi(v0, m)
        Hm = np.asarray(H[:m, :m], dtype=np.float64)
        hlast = float(H[m, m - 1])
        w, Y = np.linalg.eig(Hm)
        idx = _select_ritz(w, which, k)
        w_sel, X_small = w[idx], Y[:, idx]
        # Arnoldi residual identity: ||A x - w x|| = |h_{m+1,m}| |e_m^T y|
        resid = np.abs(hlast * X_small[m - 1, :])
        V_host = np.asarray(V[:m], dtype=np.float64)
        if np.all(resid <= tol * np.maximum(np.abs(w_sel), 1e-30)):
            break
        # explicit restart: combined wanted Ritz directions (real field)
        seed = (V_host.T @ X_small.sum(axis=1)).real
        nrm = np.linalg.norm(seed)
        if not np.isfinite(nrm) or nrm < 1e-12:
            key, sub = jax.random.split(key)
            v0 = jax.random.normal(sub, (n,), dtype=dt)
        else:
            v0 = jnp.asarray(seed / nrm, dtype=dt)
    X = V_host.T @ X_small
    X = X / np.linalg.norm(X, axis=0, keepdims=True)
    return w_sel, X


def bicg(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """BiConjugate Gradient for general ``A``; scipy-style ``(x, info)``.

    The classic two-sided method: one ``A`` and one ``Aᵀ`` matvec per
    iteration, with the shadow residual driven by ``Aᵀ``. Prefer
    :func:`bicgstab` (smoother) or :func:`qmr` (quasi-minimized) unless
    matching scipy's ``bicg`` behavior matters. One jitted device program
    memoized on ``A``.
    """
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]

    def build():
        mv, rmv, _ = _as_matvec_pair(A)

        @jax.jit
        def run(b, x, tol, atol, maxiter):
            r = b - mv(x)
            rt = r
            p = r
            pt = rt
            rho = _vdot(rt, r)
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, rt, p, pt, rho, _, it = state
                q = mv(p)
                qt = rmv(pt)
                denom = _vdot(pt, q)
                alpha = rho / jnp.where(denom != 0, denom, 1.0)
                x = x + alpha * p
                r = r - alpha * q
                rt = rt - alpha * qt
                rho_new = _vdot(rt, r)
                beta = rho_new / jnp.where(rho != 0, rho, 1.0)
                p = r + beta * p
                pt = rt + beta * pt
                return x, r, rt, p, pt, rho_new, jnp.linalg.norm(r), it + 1

            x, r, *_, rnorm, it = lax.while_loop(
                cond, body, (x, r, rt, p, pt, rho, jnp.linalg.norm(r), 0)
            )
            return x, jnp.where(rnorm <= target, 0, it)

        return run

    run = _solver_program(A, ("bicg", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def lgmres(A, b, x0=None, *, tol=1e-8, atol=0.0, inner_m=30, outer_k=3, maxiter=1000, M=None):
    """LGMRES-family solver: restarted GMRES whose subspace is augmented
    with the last ``outer_k`` outer-iteration corrections (Baker, Jessup &
    Manteuffel '05 — the idea behind scipy's ``lgmres``), which breaks the
    restart-cycling that stalls plain GMRES(m).

    TPU-shaped formulation: each outer step materializes the direction
    block ``W = [Krylov_m(r) ; Z]`` (``Z`` = stored corrections,
    zero-padded to a static ``outer_k`` rows), applies ``A`` to all rows,
    and solves the (n × (m+k)) least-squares by QR — static shapes, one
    device program per operand, memoized. ``maxiter`` counts outer cycles.

    Returns scipy-style ``(x, info)``.
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    m = min(inner_m, n)
    k = min(outer_k, n)
    m_diag = None if (M is None or callable(M)) else jnp.asarray(M)

    def build():
        mv = _as_matvec(A)
        if M is None:
            psolve = lambda v, md: v
        elif callable(M):
            psolve = lambda v, md: M(v)
        else:
            psolve = lambda v, md: v / md

        @jax.jit
        def run(b, x, md, tol, atol, maxiter):
            dt = b.dtype
            eps = jnp.finfo(dt).eps
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            def cycle(x, r, Z):
                beta = jnp.linalg.norm(r)
                v0 = r / jnp.where(beta > 0, beta, 1.0)
                V0 = jnp.zeros((m, n), dt).at[0].set(v0)

                def arn(j, V):
                    w = mv(psolve(V[j], md))
                    mask = (jnp.arange(m) <= j).astype(dt)
                    w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
                    w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
                    nw = jnp.linalg.norm(w)
                    w = jnp.where(nw > eps, w / jnp.where(nw > 0, nw, 1.0), jnp.zeros_like(w))
                    return lax.cond(j + 1 < m, lambda V: V.at[j + 1].set(w), lambda V: V, V)

                V = lax.fori_loop(0, m - 1, arn, V0)
                W = jnp.concatenate([V, Z], axis=0)  # (m+k, n) directions
                C = lax.map(lambda w: mv(psolve(w, md)), W)  # A @ each direction
                # least squares min_y ||r - C^T y|| via QR (+ ridge on dead
                # columns: zero-padded Z rows and happy-breakdown vectors)
                Q, R = jnp.linalg.qr(C.T)
                rdiag = jnp.abs(jnp.diagonal(R))
                ridge = jnp.where(rdiag > eps * jnp.maximum(jnp.max(rdiag), 1.0), 0.0, 1.0)
                y = jax.scipy.linalg.solve_triangular(
                    R + jnp.diag(ridge), jnp.dot(Q.T, r, precision=_HI), lower=False
                )
                dx = psolve(jnp.dot(y, W, precision=_HI), md)
                ndx = jnp.linalg.norm(dx)
                z = dx / jnp.where(ndx > eps, ndx, 1.0)
                Z = jnp.roll(Z, shift=1, axis=0).at[0].set(jnp.where(ndx > eps, z, jnp.zeros_like(z)))
                return x + dx, Z

            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, Z, _, it = state
                x, Z = cycle(x, r, Z)
                r = b - mv(x)
                return x, r, Z, jnp.linalg.norm(r), it + 1

            r0 = b - mv(x)
            Z0 = jnp.zeros((k, n), dt)
            x, r, _, rnorm, it = lax.while_loop(cond, body, (x, r0, Z0, jnp.linalg.norm(r0), 0))
            return x, jnp.where(rnorm <= target, 0, it)

        return run

    key = ("lgmres", b.shape, b.dtype.name, m, k, M is None)
    run = build() if callable(M) else _solver_program(A, key, build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    md = m_diag if m_diag is not None else jnp.ones((1,), b.dtype)
    return run(b, x, md, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def gcrotmk(A, b, x0=None, *, tol=1e-8, atol=0.0, m=20, k=None, maxiter=1000, M=None):
    """GCROT(m,k) (Hicken & Zingg / de Sturler; scipy's ``gcrotmk``):
    restarted GMRES with an explicitly maintained recycled subspace
    ``(U, C)``, ``C = A U`` orthonormal, that persists across restarts.

    Each outer cycle first removes the recycled components from the
    residual (``x += U Cᵀ r; r -= C Cᵀ r``), runs an ``m``-step Arnoldi
    least-squares on what remains (orthogonal to ``C``), then inserts the
    new correction into the recycle buffer (oldest-out). Static shapes
    throughout: ``U``/``C`` are fixed ``(k, n)`` zero-padded buffers, so
    the whole solve is one memoized device program. ``maxiter`` counts
    outer cycles. Returns scipy-style ``(x, info)``.
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    m = min(m, n)
    if k is None:
        k = m
    k = min(k, n)
    m_diag = None if (M is None or callable(M)) else jnp.asarray(M)

    def build():
        mv = _as_matvec(A)
        if M is None:
            psolve = lambda v, md: v
        elif callable(M):
            psolve = lambda v, md: M(v)
        else:
            psolve = lambda v, md: v / md

        @jax.jit
        def run(b, x, md, tol, atol, maxiter):
            dt = b.dtype
            eps = jnp.finfo(dt).eps
            target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

            def cycle(x, r, U, C):
                # project the recycled subspace out of the residual
                cr = jnp.dot(C, r, precision=_HI)
                x = x + jnp.dot(cr, U, precision=_HI)
                r = r - jnp.dot(cr, C, precision=_HI)

                beta = jnp.linalg.norm(r)
                v0 = r / jnp.where(beta > 0, beta, 1.0)
                V0 = jnp.zeros((m, n), dt).at[0].set(v0)

                def arn(j, V):
                    w = mv(psolve(V[j], md))
                    # orthogonalize against C (recycle) and V (CGS2)
                    w = w - jnp.dot(jnp.dot(C, w, precision=_HI), C, precision=_HI)
                    mask = (jnp.arange(m) <= j).astype(dt)
                    w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
                    w = w - jnp.dot(jnp.dot(V, w, precision=_HI) * mask, V, precision=_HI)
                    nw = jnp.linalg.norm(w)
                    w = jnp.where(nw > eps, w / jnp.where(nw > 0, nw, 1.0), jnp.zeros_like(w))
                    return lax.cond(j + 1 < m, lambda V: V.at[j + 1].set(w), lambda V: V, V)

                V = lax.fori_loop(0, m - 1, arn, V0)
                AV = lax.map(lambda w: mv(psolve(w, md)), V)
                # AV's C-components were removed from the BASIS, not from
                # A's action: project them out of the target space too
                AVp = AV - jnp.dot(jnp.dot(AV, C.T, precision=_HI), C, precision=_HI)
                Q, R = jnp.linalg.qr(AVp.T)
                rdiag = jnp.abs(jnp.diagonal(R))
                ridge = jnp.where(rdiag > eps * jnp.maximum(jnp.max(rdiag), 1.0), 0.0, 1.0)
                y = jax.scipy.linalg.solve_triangular(
                    R + jnp.diag(ridge), jnp.dot(Q.T, r, precision=_HI), lower=False
                )
                du = psolve(jnp.dot(y, V, precision=_HI), md)
                # A du still has components along C (only the BASIS was
                # C-orthogonalized, not A's action); cancel them by moving
                # along U (A U == C), leaving A du_total C-free — which is
                # exactly the new recycle direction c_new
                adu = jnp.dot(y, AV, precision=_HI)
                cu = jnp.dot(C, adu, precision=_HI)
                du = du - jnp.dot(cu, U, precision=_HI)
                c_new = adu - jnp.dot(cu, C, precision=_HI)
                nc = jnp.linalg.norm(c_new)
                u_new = du / jnp.where(nc > eps, nc, 1.0)
                c_new = c_new / jnp.where(nc > eps, nc, 1.0)
                x = x + du
                # oldest-out insertion
                U = jnp.roll(U, 1, axis=0).at[0].set(jnp.where(nc > eps, u_new, jnp.zeros_like(u_new)))
                C = jnp.roll(C, 1, axis=0).at[0].set(jnp.where(nc > eps, c_new, jnp.zeros_like(c_new)))
                return x, U, C

            def cond(state):
                *_, rnorm, it = state
                return (rnorm > target) & (it < maxiter)

            def body(state):
                x, r, U, C, _, it = state
                x, U, C = cycle(x, r, U, C)
                r = b - mv(x)
                return x, r, U, C, jnp.linalg.norm(r), it + 1

            r0 = b - mv(x)
            U0 = jnp.zeros((k, n), dt)
            C0 = jnp.zeros((k, n), dt)
            x, r, _, _, rnorm, it = lax.while_loop(
                cond, body, (x, r0, U0, C0, jnp.linalg.norm(r0), 0)
            )
            return x, jnp.where(rnorm <= target, 0, it)

        return run

    key = ("gcrotmk", b.shape, b.dtype.name, m, k, M is None)
    run = build() if callable(M) else _solver_program(A, key, build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    md = m_diag if m_diag is not None else jnp.ones((1,), b.dtype)
    return run(b, x, md, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def qmr(A, b, x0=None, *, tol=1e-8, atol=0.0, maxiter=None):
    """Quasi-Minimal Residual (Freund & Nachtigal) for general ``A``;
    scipy-style ``(x, info)``.

    Two-sided (biorthogonal) Lanczos — one ``A`` and one ``Aᵀ`` matvec per
    iteration — with the QMR Givens smoothing of the BiCG recurrence, as a
    single ``lax.while_loop`` device program. Needs ``Aᵀ``: takes a sparse
    array or a :class:`LinearOperator` with ``rmatvec`` (use :func:`tfqmr`
    for a transpose-free variant). No lookahead: Lanczos breakdowns stop
    progress (guarded against division by zero; ``info`` then reports the
    iteration count).
    """
    b = jnp.asarray(b)
    if maxiter is None:
        maxiter = 10 * b.shape[0]

    def build():
        mv, rmv, _ = _as_matvec_pair(A)
        return jax.jit(lambda b, x, tol, atol, maxiter: _qmr_program(mv, rmv, b, x, tol, atol, maxiter))

    run = _solver_program(A, ("qmr", b.shape, b.dtype.name), build)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return run(b, x, jnp.asarray(tol, b.dtype), jnp.asarray(atol, b.dtype), maxiter)


def _qmr_program(mv, rmv, b, x, tol, atol, maxiter):
    eps = jnp.finfo(b.dtype).eps
    r = b - mv(x)
    target = jnp.maximum(tol * jnp.linalg.norm(b), atol)

    # coupled two-term variant (Freund/Nachtigal '91 as in templates):
    # v-tilde/w-tilde Lanczos pair, p/q search pair, Givens smoothing of
    # the quasi-residual
    v_t = r
    rho = jnp.linalg.norm(v_t)
    w_t = r
    xi = jnp.linalg.norm(w_t)
    gamma0 = jnp.ones((), b.dtype)
    eta0 = -jnp.ones((), b.dtype)
    tau0 = jnp.linalg.norm(r)

    zeros = jnp.zeros_like(b)

    def cond(state):
        *_, rnorm, it = state
        return (rnorm > target) & (it < maxiter)

    def body(state):
        (x, r, v_t, w_t, p, q, d, s, rho, xi, gamma, eta, theta, eps_k, tau, _, it) = state
        safe = lambda z: jnp.where(jnp.abs(z) > eps, z, jnp.where(z >= 0, eps, -eps))
        v = v_t / safe(rho)
        w = w_t / safe(xi)
        delta = _vdot(w, v)
        # p_k = v - (xi*delta/eps_{k-1}) p_{k-1}, q_k likewise (coupled)
        p = v - (xi * delta / safe(eps_k)) * p
        q = w - (rho * delta / safe(eps_k)) * q
        pt = mv(p)
        eps_new = _vdot(q, pt)
        beta = eps_new / safe(delta)
        v_t = pt - beta * v
        rho_new = jnp.linalg.norm(v_t)
        w_t = rmv(q) - beta * w
        xi_new = jnp.linalg.norm(w_t)
        # QMR smoothing
        theta_new = rho_new / safe(gamma * jnp.abs(beta))
        gamma_new = 1.0 / jnp.sqrt(1.0 + theta_new * theta_new)
        eta_new = -eta * rho * gamma_new * gamma_new / safe(beta * gamma * gamma)
        d = eta_new * p + (theta * gamma_new) ** 2 * d
        s = eta_new * pt + (theta * gamma_new) ** 2 * s
        x = x + d
        r = r - s
        tau_new = tau * theta_new * gamma_new
        return (
            x, r, v_t, w_t, p, q, d, s, rho_new, xi_new, gamma_new, eta_new,
            theta_new, eps_new, tau_new, jnp.linalg.norm(r), it + 1,
        )

    one = jnp.ones((), b.dtype)
    init = (
        x, r, v_t, w_t, zeros, zeros, zeros, zeros, rho, xi, gamma0, eta0,
        jnp.zeros((), b.dtype), one, tau0, jnp.linalg.norm(r), 0,
    )
    x, r, *_, rnorm, it = lax.while_loop(cond, body, init)
    info = jnp.where(rnorm <= target, 0, it)
    return x, info
