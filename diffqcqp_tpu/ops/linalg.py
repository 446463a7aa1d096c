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

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# TPU f32 matmuls default to bfloat16 passes; every matmul on a SOLVE path
# must pin full f32 accumulation or inverses/solves silently carry ~1e-2
# relative error (found on hardware: the NS-inverse engine was bf16-exact
# and the N=96 solutions were 0.1 off).
_HI = jax.lax.Precision.HIGHEST


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
    coeff = jnp.einsum("bji,bj->bi", V, rhs, precision=_HI)
    return jnp.einsum("bij,bj->bi", V, coeff / denom, precision=_HI)


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
    return jnp.einsum("bki,bkj->bij", inv_L, inv_L, precision=_HI)


def spd_cholesky_solve(A: Array, rhs: Array) -> Array:
    """Batched SPD multi-RHS solve: A (B, m, m), rhs (B, m, k) -> (B, m, k).

    One batched Cholesky + two triangular sweeps over all k columns -
    factor ONCE for every right-hand side. The single definition shared by
    the f64 adjoint paths (diff/kkt.py _solve_direct and _qcqp_schur_vjp)
    and the full-Jacobian API (diff/jacobian.py _solve_multi), so a
    robustness fix cannot diverge between them. f32-on-TPU callers should
    prefer the Newton-Schulz inverse (XLA's batched Cholesky is
    column-serial on TPU - see newton_schulz_inverse).
    """
    L = jnp.linalg.cholesky(A)
    x = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(
        L, x, left_side=True, lower=True, transpose_a=True
    )


def newton_schulz_inverse(
    M: Array, iters: int = 14, x0: Optional[Array] = None
) -> Array:
    """Explicit inverse of a batch of SPD matrices by Newton-Schulz
    iteration: X <- X (2I - M X). Pure batched MATMULs - the MXU path.

    Why: XLA's batched Cholesky on TPU runs column-serial (measured
    22 ms for (2048, 96, 96) f32 - ~27 GFLOP/s), while the same chip
    does batched matmuls at TFLOP rates; 12-16 NS steps (24-32 matmuls,
    ~3.5 GFLOP each here) finish in ~1-2 ms. Convergence is quadratic
    with e_{k+1} = e_k^2 from e_0 = ||I - M X0||_2 < 1; the scaled-SPD
    init X0 = M / (||M||_1 ||M||_inf) guarantees e_0 < 1, and for the
    engine's shifted matrices (cond(P + (rho+mu)I) modest by
    construction) 12-14 steps reach f32 working accuracy. Passing the
    PREVIOUS inverse as ``x0`` (a rho refactor changes only the shift)
    cuts that to a few steps.

    The iteration is self-correcting (errors contract quadratically), so
    the final accuracy is ~eps * cond like a direct inverse. Use the
    Cholesky path for f64 / ill-conditioned setups.
    """
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    if x0 is None:
        norm1 = jnp.max(jnp.sum(jnp.abs(M), axis=-2), axis=-1)
        norminf = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
        x0 = M / jnp.maximum(norm1 * norminf, jnp.finfo(M.dtype).tiny)[
            :, None, None
        ]

    def body(_, X):
        MX = jnp.einsum("bij,bjk->bik", M, X, precision=_HI)
        return jnp.einsum("bij,bjk->bik", X, 2.0 * eye - MX, precision=_HI)

    return jax.lax.fori_loop(0, iters, body, x0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def newton_schulz_inverse_adaptive(
    M: Array, x0: Array, tol: float | None = None, max_iters: int = 30
) -> Array:
    """Newton-Schulz with a MEASURED stopping rule at zero extra matmuls.

    Each NS step already computes MX, so the actual residual R = I - M X
    is available per step for the cost of one elementwise pass (~0.1 ms at
    (2048, 96, 96) vs ~0.25 ms per HIGHEST-precision matmul). The loop
    stops once the rigorous spectral bound sqrt(||R||_1 ||R||_inf) (R is
    not symmetric, so neither norm alone bounds ||R||_2) falls below
    ``tol``. This strictly dominates any a-priori trip count - a
    bound-derived count must assume the worst case over the batch (the
    masked adjoint systems have NO computable tight bound:
    ||I - A/hi||_inf >= 1 there while the true spectral e0 was 0.98).
    ``max_iters`` breaks residual stalls (noise floor / cond beyond
    working-precision usefulness).

    The iteration is the CUBIC member of the Newton-Schulz family,
    X <- X (I + R + R^2): error contracts e -> e^3 for 3 matmuls/step vs
    the classic quadratic's e -> e^2 for 2 - about the same total matmul
    count, but ~2/3 the STEPS, and the per-step overhead (residual-norm
    reductions, elementwise combines, while_loop sync) is roughly half of
    each step's cost at the N=96 backward shape, so fewer steps win
    outright (measured: the quadratic loop at 9.3 ms was NOT
    matmul-precision-bound - DESIGN.md section 10). ``tol`` defaults to
    ~0.9 * eps_mach^(1/3) of M's dtype (4.4e-3 f32, 5.5e-6 f64): the
    update applied AT the exit residual lands the carried iterate at
    ~tol^3, the working-precision floor. The masked adjoint K (e0 ~ 0.98)
    stops at ~6-7 cubic steps where the quadratic rule paid 10-11.

    Sharding note: the max in the stopping rule is over whatever batch
    this function SEES. Under shard_map (parallel/sharding.py) that is
    the per-shard batch - each shard stops on its own worst problem, no
    collective. Under global jit auto-sharding the max would insert a
    per-step all-reduce; pass a fixed count upstream
    (ns_inverse_shifted(iters=...)) in that setting.

    Reverse-mode: the while_loop is not differentiable through, but the
    converged result IS the inverse, so the exact implicit derivative
    d(M^{-1}) = -M^{-1} dM M^{-1} is attached as a custom VJP (two
    matmuls - cheaper than unrolled-loop AD would ever be); x0 only
    affects the convergence path, its cotangent is zero.
    """
    return _ns_adaptive_impl(M, x0, tol, max_iters)


def _ns_adaptive_impl(M, x0, tol, max_iters):
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    if tol is None:
        tol = float(np.cbrt(np.finfo(np.dtype(M.dtype)).eps) * 0.9)

    def norms(R):
        r1 = jnp.max(jnp.sum(jnp.abs(R), axis=-2))
        rinf = jnp.max(jnp.sum(jnp.abs(R), axis=-1))
        return jnp.sqrt(r1 * rinf)

    def cond(s):
        k, _, resid = s
        return (k < max_iters) & (resid > tol)

    def body(s):
        k, X, _ = s
        MX = jnp.einsum("bij,bjk->bik", M, X, precision=_HI)
        R = eye - MX
        RR = jnp.einsum("bij,bjk->bik", R, R, precision=_HI)
        X = jnp.einsum("bij,bjk->bik", X, eye + R + RR, precision=_HI)
        return k + 1, X, norms(R)

    # the carried residual belongs to the iterate the JUST-APPLIED update
    # contracted FROM, so exiting at resid <= tol leaves the carried X at
    # ~resid^3 - already the working-precision floor, no polish needed.
    init = (jnp.int32(0), x0, jnp.asarray(jnp.inf, M.dtype))
    return jax.lax.while_loop(cond, body, init)[1]


def _ns_adaptive_fwd(M, x0, tol, max_iters):
    X = _ns_adaptive_impl(M, x0, tol, max_iters)
    return X, X


def _ns_adaptive_bwd(tol, max_iters, X, dX):
    # d(M^{-1}) = -M^{-1} dM M^{-1}  =>  M_bar = -X^T dX_bar X^T, written
    # with transposed einsum indices (no materialized (B,n,n) transpose -
    # 10-50x slower than letting the dot_general absorb it on TPU).
    t = jnp.einsum("bji,bjk->bik", X, dX, precision=_HI)
    m_bar = -jnp.einsum("bik,blk->bil", t, X, precision=_HI)
    return m_bar, jnp.zeros_like(X)


newton_schulz_inverse_adaptive.defvjp(_ns_adaptive_fwd, _ns_adaptive_bwd)


def ns_inverse_shifted(P: Array, shift: Array, iters: int | None = None) -> Array:
    """inv(P + shift*I) for SPD P via Newton-Schulz with the scalar init
    X0 = 2/(lmin_bound + lmax_bound) I and the measured stopping rule
    (newton_schulz_inverse_adaptive).

    For M = P + shift*I, lmin(M) >= shift (P is PSD) and lmax(M) <=
    ||M||_inf (max absolute row sum - RIGOROUS, unlike a power-iteration
    estimate: an underestimated lmax puts eigenvalues of M X0 above 2 and
    NS diverges to NaN, which is exactly what happened on problems whose
    adaptive rho had dropped, shrinking the safety margin to under 1%).
    e0 = ||I - M X0||_2 <= (hi - lo)/(hi + lo) < 1 always; the row-sum
    bound costs at most sqrt(n) slack.

    The adaptive trip count matters: the common case - the engine's rho0
    formula keeps cond(P + (rho+mu)I) ~ 7 - stops after a handful of
    cubic steps, while a rho driven 3 decades down self-selects ~2x
    more; a FIXED count must always pay the calibrated worst case (22
    quadratic steps - measured 17 ms of a 29 ms N=96 forward; adaptive
    setup 7.6 ms, +38% config-6 throughput). ``iters`` forces a static
    QUADRATIC count (newton_schulz_inverse).
    """
    M = P + shift[:, None, None] * jnp.eye(P.shape[-1], dtype=P.dtype)
    lo = shift
    hi = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    scale = 2.0 / (lo + hi)
    x0 = scale[:, None, None] * jnp.eye(P.shape[-1], dtype=P.dtype)[None]
    if iters is not None:
        return newton_schulz_inverse(M, iters=iters, x0=x0)
    return newton_schulz_inverse_adaptive(M, x0)


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
    G = jnp.einsum("bki,bkj->bij", A, A, precision=_HI)
    G = G + mu_ir * jnp.eye(A.shape[-1], dtype=A.dtype)
    chol = jnp.linalg.cholesky(G)
    Ab = jnp.einsum("bji,bj->bi", A, b, precision=_HI)

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
