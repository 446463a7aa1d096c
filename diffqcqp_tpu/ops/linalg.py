"""Batched dense linear-algebra primitives for the ADMM solver.

Design note (TPU-first, deliberately NOT the reference's recipe): the
reference factors P + (rho+mu_prox)*I with a Cholesky decomposition and forms
an explicit inverse, re-factoring every time the adaptive-rho schedule fires
(Solver.cpp:75-77, :98-101). On TPU that design is hostile: triangular solves
and per-problem re-factorisation serialise badly. Instead we compute one
batched symmetric eigendecomposition P = V diag(lam) V^T up front, after which

    (P + c*I)^{-1} x  =  V ((V^T x) / (lam + c))

for ANY shift c - so every rho update is free scalar arithmetic and every
iteration is two batched matvecs (MXU work) plus element-wise ops. The
largest eigenvalue (the reference estimates it with a fixed-count power
iteration, Solver.cpp:46-59) falls out of the factorisation exactly.

A diagonal-P fast path (the representation qcqp_no_batch.py:44-47 supports)
skips the factorisation entirely: the shifted solve is element-wise.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array


class Factorization(NamedTuple):
    """Spectral handle on a batch of SPD matrices.

    Exactly one of (eigvals, eigvecs) / diag is populated:
      * dense path:  eigvals (B, N), eigvecs (B, N, N), diag None
      * diagonal path: diag (B, N), eigvals == diag, eigvecs None
    """

    eigvals: Array
    eigvecs: Optional[Array]
    diag: Optional[Array]

    @property
    def lmax(self) -> Array:
        """Exact largest eigenvalue per problem, shape (B,)."""
        return jnp.max(self.eigvals, axis=-1)


def factorize(P: Array) -> Factorization:
    """Factor a batch of SPD matrices for repeated shifted solves.

    P of shape (B, N, N) -> eigendecomposition; (B, N) -> diagonal path.
    """
    if P.ndim == 2:
        return Factorization(eigvals=P, eigvecs=None, diag=P)
    eigvals, eigvecs = jnp.linalg.eigh(P)
    return Factorization(eigvals=eigvals, eigvecs=eigvecs, diag=None)


def solve_shifted(fact: Factorization, rhs: Array, shift: Array) -> Array:
    """Solve (P + shift*I) x = rhs for a batch; shift (B,), rhs (B, N)."""
    denom = fact.eigvals + shift[:, None]
    if fact.diag is not None:
        return rhs / denom
    V = fact.eigvecs
    # V^T rhs: (B,N,N)^T @ (B,N)
    coeff = jnp.einsum("bji,bj->bi", V, rhs)
    return jnp.einsum("bij,bj->bi", V, coeff / denom)


def chol_inverse_shifted(P: Array, shift: Array) -> Array:
    """Explicit inverse of P + shift*I via batched Cholesky.

    P (B, N, N) SPD, shift (B,) -> (B, N, N). The large-N engine mode
    (SolverConfig.linsolve='chol'): one batched Cholesky + two batched
    triangular solves against I, after which every ADMM iteration is a
    single MXU matvec. Measured on a v5e at B=4096 N=24: cholesky 11.6 ms
    vs eigh 196 ms - at N=96 the eigh setup dominates entire solves
    (docs/DESIGN.md section 3), which is the cliff this removes. Rho
    changes require a refactor (the engine gates them to shared iterations
    via rho_sync, ~2-3 per solve), unlike the spectral handle where every
    shift is free.

    Forming the inverse explicitly mirrors the reference (Solver.cpp:76
    ``inv_P_dense`` does the same); accuracy is the usual cond * eps of an
    SPD inverse-apply, identical in practice to a triangular-solve pair.
    """
    n = P.shape[-1]
    eye = jnp.eye(n, dtype=P.dtype)
    L = jnp.linalg.cholesky(P + shift[:, None, None] * eye)
    # inv(M) = inv(L)^T inv(L);  inv(L) by one batched triangular solve
    inv_L = jax.lax.linalg.triangular_solve(
        L, jnp.broadcast_to(eye, P.shape), left_side=True, lower=True
    )
    return jnp.einsum("bki,bkj->bij", inv_L, inv_L)


def power_iteration(P: Array, iters: int) -> Array:
    """Fixed-count power iteration estimating lambda_max per problem.

    Replicates the reference exactly (Solver.cpp:46-59): start from the
    constant unit vector, run ``iters`` normalise-after-multiply steps, and
    return the Rayleigh quotient. The reference's epsilon argument is ignored
    there too (no convergence test) - see SURVEY.md section 7 bug list item 6.

    P: (B, N, N) dense or (B, N) diagonal. Returns (B,).
    """
    if P.ndim == 2:
        return jnp.max(P, axis=-1)
    n = P.shape[-1]
    v0 = jnp.full(P.shape[:-1], 1.0 / jnp.sqrt(n), dtype=P.dtype)

    def body(_, v):
        av = jnp.einsum("bij,bj->bi", P, v)
        norm = jnp.linalg.norm(av, axis=-1, keepdims=True)
        return av / jnp.maximum(norm, jnp.finfo(P.dtype).tiny)

    v = jax.lax.fori_loop(0, iters, body, v0)
    av = jnp.einsum("bij,bj->bi", P, v)
    return jnp.sum(v * av, axis=-1)


def linf_norm(x: Array) -> Array:
    """Per-problem infinity norm over the trailing axis."""
    return jnp.max(jnp.abs(x), axis=-1)


def refine_solve(A: Array, b: Array, mu_ir: float, iters: int) -> Array:
    """Solve A x = b for possibly singular A via regularised normal equations.

    This is the fixed-shape, batched analogue of the reference's
    ``iterative_refinement`` (Solver.cpp:15-44): form G = A^T A + mu_ir*I,
    factor once (batched Cholesky), then run the Richardson-style recurrence

        x <- mu_ir * G^{-1} x + G^{-1} A^T b

    whose fixed point is (A^T A)^{+'} A^T b. The reference stops on residual
    tests after at most 10 steps; we run a static ``iters`` count so the
    computation stays shape-stable under jit (the extra steps are cheap
    batched matvecs). Rows/columns of A that are identically zero (our masked
    encoding of inactive constraints) decouple and yield exact zeros.

    CAVEAT (learned the hard way): the Richardson contraction factor is
    mu_ir / (sigma_min(A)^2 + mu_ir), so normal equations square the
    conditioning and a fixed 10-iteration budget only converges when
    sigma_min(A)^2 >> mu_ir. This routine is therefore reserved for
    well-scaled systems (the +-1-entry dual-recovery selectors, whose normal
    matrix is near-diagonal); the KKT adjoint systems in diff/kkt.py use a
    direct LU on the UNSQUARED system instead.

    A: (B, M, K), b: (B, M) -> (B, K).
    """
    G = jnp.einsum("bki,bkj->bij", A, A)
    G = G + mu_ir * jnp.eye(A.shape[-1], dtype=A.dtype)
    chol = jnp.linalg.cholesky(G)
    Ab = jnp.einsum("bji,bj->bi", A, b)

    def chol_solve(y):
        z = jax.lax.linalg.triangular_solve(
            chol, y[..., None], left_side=True, lower=True
        )
        z = jax.lax.linalg.triangular_solve(
            chol, z, left_side=True, lower=True, transpose_a=True
        )
        return z[..., 0]

    base = chol_solve(Ab)

    def body(_, x):
        return mu_ir * chol_solve(x) + base

    return jax.lax.fori_loop(0, iters, body, base)
