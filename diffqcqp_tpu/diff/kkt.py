"""Implicit differentiation of the KKT conditions - dual recovery + VJP solves.

The reference does this with dynamic active-set index gymnastics (building
compacted matrices whose size depends on how many constraints are active:
Solver.cpp:136-196 QP, :263-371 box, :441-502 signed box, :584-681 QCQP). That
is unjittable. Here every system is FIXED-SHAPE: all constraint slots are
kept, inactive slots become decoupled identity rows/columns (solving exactly
to zero), and the transposed differentiated-KKT system is solved DIRECTLY -
batched LU (jnp.linalg.solve) on CPU/f64, the fused Householder-QR pallas
kernel on TPU/f32 (see _solve_T) - the same answers as the reference's
compacted systems on non-degenerate problems.

Why LU and not the reference's regularised normal equations
(iterative_refinement, Solver.cpp:15-44): squaring the system squares its
condition number, and the Richardson recurrence's contraction factor is
mu_ir/(sigma_min^2 + mu_ir) - for the saddle-structured KKT adjoints
(condition ~1e4-1e6 on routine problems) a fixed iteration budget simply
does not converge, in float64 or float32. The unsquared LU is exact in f64
and loses only ~cond * eps_f32 in f32. Weakly-active constraints
(gamma ~ 0 at an active constraint - a genuinely non-differentiable point)
would make the unsquared system singular, so slots additionally require
gamma > act_eps to enter the system; this picks the "inactive branch"
subgradient at those measure-zero points.

Sign conventions: stationarity is written P l + q + J^T gamma = 0 with
gamma >= 0 the standard KKT multipliers of constraints c(l) <= 0. This matches
the reference's box/signed-box/QCQP recovery (Solver.cpp:302, :496, :610). The
reference's plain-QP recovery returns the NEGATED multiplier
(gamma = -(Pl+q), Solver.cpp:127, active test gamma < -1e-10); internally we
use the same quantity for the activity test so thresholds match bit-for-bit.

Each ``*_vjp`` function takes the upstream cotangent g = dL/dl and returns the
adjoint solution of the transposed differentiated-KKT system, from which the
parameter gradients assemble as (qcqp.py:45-52, :167-181):

    grad_P = -dl l^T    grad_q = -dl
    grad_l_min = -gamma_lo * dgamma_lo     grad_l_max = +gamma_hi * dgamma_hi
    grad_l_n = E2 dgamma                   grad_mu  = E1 dgamma
      with E1 = diag(2 gamma l_n^2 mu), E2 = diag(2 gamma l_n mu^2)
      (Solver.cpp:683-691)

(The reference's Python box backward negates grad_l_max and swaps its saved
tensors, qcqp.py:72,91,93 - dead code there since it also calls a nonexistent
``asDiagonal``; the signs here are validated against finite differences.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..config import SolverConfig
from ..ops.linalg import newton_schulz_inverse_adaptive, spd_cholesky_solve


def _spd_inverse_f32(A: Array) -> Array:
    """Newton-Schulz inverse for large batched f32 SPD systems (the
    backward solves beyond the QR kernel's m <= 88 bound).

    XLA's batched Cholesky is column-serial on TPU (measured 22 ms at
    (2048, 96, 96) vs ~1-2 ms for ~22 NS steps of pure MXU matmuls). K
    carries no shift bound, so the init is I / ||A||_inf (max abs row
    sum) - a RIGOROUS lmax upper bound (a power-iteration estimate can
    undershoot and then NS diverges): e0 = 1 - lmin/||A||_inf, linear in
    cond with at most sqrt(m) slack.

    The trip count is the MEASURED stopping rule
    (ops/linalg.py::newton_schulz_inverse_adaptive): K carries no lmin
    bound and the computable a-priori alternative ||I - A/hi||_inf is
    >= 1 on these masked adjoint systems (measured 1.67 where the true
    spectral e0 was 0.98), but the per-step residual is free - typical
    masked K stops at ~6-7 CUBIC steps (the loop is step-overhead bound,
    not matmul bound, so the cubic family's fewer steps win ~19%:
    ops/linalg.py, DESIGN.md section 10). The 30-step cap covers cond ~1e4+, beyond which f32 gradients
    are dominated by eps * cond regardless of the solver (DESIGN.md
    section 9)."""
    n = A.shape[-1]
    hi = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)
    hi = jnp.maximum(hi, jnp.finfo(A.dtype).tiny)
    x0 = (1.0 / hi)[:, None, None] * jnp.eye(n, dtype=A.dtype)[None]
    return newton_schulz_inverse_adaptive(A, x0)


def _use_fused_kernel(P: Array, l: Array, cfg: SolverConfig) -> bool:
    """Dispatch to the fused single-kernel backwards (coord_bwd_pallas /
    qcqp_bwd_pallas): dense f32 problems on TPU, or backend='pallas'
    anywhere (off-TPU the kernels auto-run in interpret mode). The wrappers
    scale their lane tile to VMEM (kernels/layout.py::vmem_tile_b), so n is
    bounded only by what fits - n <= 64 keeps two (n, n, 128) buffers
    comfortably resident."""
    if P.ndim != 3:
        return False
    if cfg.backend == "pallas":
        return True
    return (
        cfg.backend == "auto"
        and l.dtype == jnp.float32
        and l.shape[-1] <= 64
        and jax.default_backend() == "tpu"
    )


def _diag_coord_adjoint(P: Array, g: Array, coeffs: list[Array]):
    """Closed-form KKT adjoint for DIAGONAL P with coordinate-wise
    constraints (QP / box / signed box).

    Every constraint touches one coordinate and diagonal P couples none, so
    (see kernels/coord_bwd_pallas.py for the same decoupling argument on
    dense P): a strict-active coordinate pins dl_i = 0, free coordinates
    solve P_i dl_i = g_i elementwise, and the active rows split their
    residual (= g_i, since (P dl)_i = 0 there) minimal-norm across the
    active slots' B-block coefficients.

    coeffs: per constraint block, the ALREADY-MASKED B-block coefficient
    (B, n) - zero at slots that are not strictly active. Returns
    (dl, [dgamma_block, ...]).
    """
    am = jnp.minimum(sum((c != 0).astype(g.dtype) for c in coeffs), 1.0)
    fm = 1.0 - am
    dl = fm * g / jnp.where(P > 0, P, 1.0) * (P > 0)
    resid = g * am
    den = jnp.maximum(
        sum(c * c for c in coeffs), jnp.finfo(g.dtype).tiny
    )
    return dl, [c * resid / den for c in coeffs]


def _solve_direct(
    A: Array, rhs: Array, cfg: SolverConfig, spd: bool = False
) -> Array:
    """Solve A x = rhs batched; A (B, m, m), rhs (B, m).

    Callers assemble the TRANSPOSED differentiated-KKT system directly (the
    blocks are masked broadcasts either way, and a batched trailing-dims
    transpose of (B, m, m) costs ~1.5 ms at the flagship shape on TPU -
    comparable to the whole solve). Dispatch mirrors api._use_pallas: on TPU
    in float32 the solve runs in the fused Householder-QR pallas kernel
    (kernels/qr_solve_pallas.py - XLA's pivoted batched LU dominates the
    whole backward otherwise); elsewhere (or with cfg.backend='xla') it is a
    batched LU.
    """
    # m <= 88 is the largest system whose QR-kernel working set fits VMEM
    # at the minimum 128-lane tile (see qr_solve_pallas); the AUTO dispatch
    # sends larger systems to XLA's batched LU. An EXPLICIT
    # backend='pallas' is honoured unconditionally (interpret off-TPU;
    # on-TPU an oversized system fails loudly at compile rather than
    # silently running a different code path than requested).
    use_pallas = cfg.backend == "pallas" or (
        cfg.backend == "auto"
        and rhs.dtype == jnp.float32
        and A.shape[-1] <= 88
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from ..kernels.qr_solve_pallas import qr_solve_pallas

        return qr_solve_pallas(A, rhs)
    if spd:
        # SPD systems (the QP class's masked K). float32: Newton-Schulz
        # inverse (MXU matmuls - this is what the N > 88 dense-QP backward
        # runs on). float64 (CPU tests/oracles): batched Cholesky, ~4x
        # XLA's pivoted batched LU (DESIGN.md section 3).
        if rhs.dtype == jnp.float32:
            return jnp.einsum("bij,bj->bi", _spd_inverse_f32(A), rhs,
                              precision=jax.lax.Precision.HIGHEST)
        return spd_cholesky_solve(A, rhs[..., None])[..., 0]
    return jnp.linalg.solve(A, rhs[..., None])[..., 0]


def _as_dense(P: Array) -> Array:
    """Expand a diagonal-P batch (B, N) to dense (B, N, N) for KKT assembly."""
    if P.ndim == 2:
        return P[..., None] * jnp.eye(P.shape[-1], dtype=P.dtype)
    return P


def _pl_plus_q(P: Array, l: Array, q: Array) -> Array:
    if P.ndim == 2:
        return P * l + q
    # multiply+reduce rather than einsum: a batched (N,N)@(N,1) dot_general
    # pads the 1-wide operand to a full MXU tile on TPU; the elementwise form
    # stays on the VPU.
    return jnp.sum(P * l[:, None, :], axis=-1) + q


# --------------------------------------------------------------------------
# Non-negative QP:  min 1/2 l^T P l + q^T l  s.t.  l >= 0
# --------------------------------------------------------------------------

def qp_dual(
    P: Array, q: Array, l: Array, cfg: SolverConfig, eps: Array | None = None
) -> Array:
    """Dual recovery, reference convention: gamma = -(Pl+q), zeroed where
    l > eps (Solver.cpp:125-134). Note gamma <= 0 at active constraints in
    this convention. ``eps`` overrides the activity threshold (scalar or
    (B, 1) array - the public recovery surface passes a scale-aware
    per-problem floor; None = cfg.eps, the autodiff path's behavior)."""
    e = cfg.eps if eps is None else eps
    gamma = -_pl_plus_q(P, l, q)
    return jnp.where(l > e, 0.0, gamma)


def qp_vjp(P: Array, q: Array, l: Array, g: Array, cfg: SolverConfig) -> Array:
    """Adjoint dl of the QP solution map (zeros on the active set).

    Active set: gamma < -act_eps (Solver.cpp:140). The differentiated KKT
    system decouples (Solver.cpp:148-177 builds structurally-zero off-diagonal
    blocks), leaving P_ff^T dl_f = g_f on the free set. Fixed-shape encoding:
    K = mask_f P mask_f + diag(active), solve K^T x = mask_f * g by LU (the
    active-slot diagonal is 1 rather than the reference's l_act ~ 0: the
    block is decoupled either way and solves to exactly zero, but the unit
    diagonal keeps the direct solve well conditioned).

    Diagonal P (the README-example representation): the masked system K is
    itself diagonal, so the adjoint is closed-form elementwise - no dense
    assembly, no linear solver, fully matrix-free end to end.
    """
    if P.ndim == 2:
        gamma = qp_dual(P, q, l, cfg)
        am = (gamma < -cfg.act_eps).astype(l.dtype)
        dl, _ = _diag_coord_adjoint(P, g, [am])
        return dl
    if _use_fused_kernel(P, l, cfg):
        # one fused kernel: dual recovery + masked SPD Cholesky solve
        # (kernels/coord_bwd_pallas.py; parity: tests/test_coord_bwd_kernel)
        from ..kernels.coord_bwd_pallas import KIND_QP, coord_kkt_bwd_fused

        (dl,) = coord_kkt_bwd_fused(
            P, q, l, g, None, None, None, KIND_QP,
            eps=cfg.eps, act_eps=cfg.act_eps, tile_b=cfg.pallas_tile_b,
        )
        return dl
    gamma = qp_dual(P, q, l, cfg)
    active = gamma < -cfg.act_eps
    free = ~active
    fm = free.astype(l.dtype)
    am = active.astype(l.dtype)
    Pd = _as_dense(P)
    n = l.shape[-1]
    K = Pd * fm[:, :, None] * fm[:, None, :] + jnp.eye(n, dtype=l.dtype) * (
        am
    )[:, None, :]
    # K is symmetric POSITIVE DEFINITE (masked symmetric SPD P + unit
    # diagonal on the active set): K^T = K, solvable by Cholesky.
    x = _solve_direct(K, g * fm, cfg, spd=True)
    return x * fm


# --------------------------------------------------------------------------
# Box QP:  min 1/2 l^T P l + q^T l  s.t.  l_min <= l <= l_max
# --------------------------------------------------------------------------

class BoxDuals(NamedTuple):
    gamma: Array      # (B, 2n): [gamma_lo | gamma_hi], zeros at inactive slots
    act_lo: Array     # (B, n) bool
    act_hi: Array     # (B, n) bool


def _box_activity(l: Array, l_min: Array, l_max: Array, eps: float):
    """Activity masks matching Solver.cpp:270-284: lower active iff
    l - l_min <= eps, upper active iff l - l_max >= -eps."""
    act_lo = (l - l_min) <= eps
    act_hi = (l - l_max) >= -eps
    return act_lo, act_hi


def _box_selector(act_lo: Array, act_hi: Array, dtype) -> Array:
    """Masked signed selector J (B, n, 2n): column i = -e_i if lower slot i is
    active, column n+i = +e_i if upper slot i is active (Solver.cpp:292-301),
    zero columns for inactive slots."""
    n = act_lo.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    lo = -eye * act_lo.astype(dtype)[:, None, :]
    hi = eye * act_hi.astype(dtype)[:, None, :]
    return jnp.concatenate([lo, hi], axis=-1)


def _box_selector_T(act_lo: Array, act_hi: Array, dtype) -> Array:
    """J^T (B, 2n, n), assembled directly (masks move to the row side)."""
    n = act_lo.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    lo = -eye * act_lo.astype(dtype)[:, :, None]
    hi = eye * act_hi.astype(dtype)[:, :, None]
    return jnp.concatenate([lo, hi], axis=-2)


def box_dual(
    P: Array, q: Array, l_min: Array, l_max: Array, l: Array,
    cfg: SolverConfig, eps: Array | None = None,
) -> BoxDuals:
    """Least-squares dual recovery J gamma = -(Pl+q) (Solver.cpp:263-308).

    The reference solves this with its regularised-normal-equations
    refinement (Solver.cpp:306 via :15-44). That is unnecessary: row i of
    the selector J touches only columns (i, n+i) and rows touch DISJOINT
    columns, so J J^T is diagonal and the minimal-norm least-squares
    solution (the refinement's fixed point) is closed form, elementwise:
    gamma_block = J_row^T rhs_i / (#active entries in the row). No batched
    factorisation anywhere. ``eps`` overrides the activity threshold
    (scalar or broadcastable array; None = cfg.eps).
    """
    act_lo, act_hi = _box_activity(
        l, l_min, l_max, cfg.eps if eps is None else eps
    )
    rhs = -_pl_plus_q(P, l, q)
    alo = act_lo.astype(l.dtype)
    ahi = act_hi.astype(l.dtype)
    denom = jnp.maximum(alo + ahi, 1.0)
    g_lo = -alo * rhs / denom
    g_hi = ahi * rhs / denom
    return BoxDuals(
        gamma=jnp.concatenate([g_lo, g_hi], axis=-1),
        act_lo=act_lo,
        act_hi=act_hi,
    )


class BoxVJP(NamedTuple):
    dl: Array         # (B, n)
    dgamma: Array     # (B, 2n)
    gamma: Array      # (B, 2n)


def box_vjp(
    P: Array,
    q: Array,
    l_min: Array,
    l_max: Array,
    l: Array,
    g: Array,
    cfg: SolverConfig,
    duals: BoxDuals | None = None,
) -> BoxVJP:
    """Adjoint of the box-QP solution map (Solver.cpp:310-371, fixed-shape).

    System (before transpose), unknowns (dgamma (2n), dl (n)):
        [[I_inact, B],    B = diag(gamma) J^T  (rows only for strict slots)
         [J,       P]]    J = masked signed selector (n, 2n)
    solve S^T x = [0; g] by LU; x = (dgamma, dl). A slot enters the system
    only if primal-active AND gamma > act_eps (strict complementarity);
    other slots are decoupled identity rows solving to zero.
    """
    if duals is None and P.ndim == 2:
        # Diagonal P: closed-form elementwise (_diag_coord_adjoint).
        duals_d = box_dual(P, q, l_min, l_max, l, cfg)
        n_ = l.shape[-1]
        g_lo, g_hi = duals_d.gamma[:, :n_], duals_d.gamma[:, n_:]
        am_lo = (duals_d.act_lo & (g_lo > cfg.act_eps)).astype(l.dtype)
        am_hi = (duals_d.act_hi & (g_hi > cfg.act_eps)).astype(l.dtype)
        dl, (dg_lo, dg_hi) = _diag_coord_adjoint(
            P, g, [-g_lo * am_lo, g_hi * am_hi]
        )
        return BoxVJP(
            dl=dl,
            dgamma=jnp.concatenate([dg_lo, dg_hi], axis=-1),
            gamma=duals_d.gamma,
        )
    if duals is None and _use_fused_kernel(P, l, cfg):
        from ..kernels.coord_bwd_pallas import KIND_BOX, coord_kkt_bwd_fused

        dl, dgamma, gamma = coord_kkt_bwd_fused(
            P, q, l, g, l_min, l_max, None, KIND_BOX,
            eps=cfg.eps, act_eps=cfg.act_eps, tile_b=cfg.pallas_tile_b,
        )
        return BoxVJP(dl=dl, dgamma=dgamma, gamma=gamma)
    if duals is None:
        duals = box_dual(P, q, l_min, l_max, l, cfg)
    n = l.shape[-1]
    act_prim = jnp.concatenate([duals.act_lo, duals.act_hi], axis=-1)
    act = act_prim & (duals.gamma > cfg.act_eps)
    am = act.astype(l.dtype)
    # S^T = [[I_inact, J^T], [B^T, P]] assembled directly (no batched
    # trailing-dims transpose); B = diag(gamma) J^T so B^T = J diag(gamma).
    J = _box_selector(act[:, :n], act[:, n:], l.dtype)
    Jt = _box_selector_T(act[:, :n], act[:, n:], l.dtype)
    Bt = J * (duals.gamma * am)[:, None, :]
    Pd = _as_dense(P)
    Bsz = l.shape[0]
    eye_inact = jnp.eye(2 * n, dtype=l.dtype) * (1.0 - am)[:, None, :]
    top = jnp.concatenate([eye_inact, Jt], axis=-1)
    bot = jnp.concatenate([Bt, Pd], axis=-1)
    ST = jnp.concatenate([top, bot], axis=-2)
    rhs = jnp.concatenate([jnp.zeros((Bsz, 2 * n), l.dtype), g], axis=-1)
    x = _solve_direct(ST, rhs, cfg)
    return BoxVJP(dl=x[:, 2 * n :], dgamma=x[:, : 2 * n] * am, gamma=duals.gamma)


# --------------------------------------------------------------------------
# Signed box QP: box plus sign(v) * l <= 0
# --------------------------------------------------------------------------

class SignedBoxDuals(NamedTuple):
    gamma: Array      # (B, 3n): [lo | hi | sign]
    act_lo: Array
    act_hi: Array
    act_sg: Array


def _signed_selector(
    act_lo: Array, act_hi: Array, act_sg: Array, v_sign: Array
) -> Array:
    """J (B, n, 3n): third block column i = v_i e_i when the sign constraint
    is active (Solver.cpp:480-495)."""
    dtype = v_sign.dtype
    n = act_lo.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    lo = -eye * act_lo.astype(dtype)[:, None, :]
    hi = eye * act_hi.astype(dtype)[:, None, :]
    sg = eye * (act_sg.astype(dtype) * v_sign)[:, None, :]
    return jnp.concatenate([lo, hi, sg], axis=-1)


def _signed_selector_T(
    act_lo: Array, act_hi: Array, act_sg: Array, v_sign: Array
) -> Array:
    """J^T (B, 3n, n), assembled directly (masks move to the row side)."""
    dtype = v_sign.dtype
    n = act_lo.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    lo = -eye * act_lo.astype(dtype)[:, :, None]
    hi = eye * act_hi.astype(dtype)[:, :, None]
    sg = eye * (act_sg.astype(dtype) * v_sign)[:, :, None]
    return jnp.concatenate([lo, hi, sg], axis=-2)


def signed_box_dual(
    P: Array,
    q: Array,
    l_min: Array,
    l_max: Array,
    v: Array,
    l: Array,
    cfg: SolverConfig,
    eps: Array | None = None,
) -> SignedBoxDuals:
    """3n-dual recovery (Solver.cpp:441-502): sign constraint active iff
    v*l >= -eps. ``eps`` overrides the activity threshold (None = cfg.eps)."""
    e = cfg.eps if eps is None else eps
    v_sign = jnp.sign(v)
    act_lo, act_hi = _box_activity(l, l_min, l_max, e)
    act_sg = v_sign * l >= -e
    rhs = -_pl_plus_q(P, l, q)
    # Same disjoint-row structure as box_dual: J row i touches columns
    # (i, n+i, 2n+i) with entries (-1, +1, v_i), v_i in {-1, 0, +1}, so the
    # minimal-norm least-squares dual is closed form per coordinate.
    alo = act_lo.astype(l.dtype)
    ahi = act_hi.astype(l.dtype)
    asg = act_sg.astype(l.dtype)
    denom = jnp.maximum(alo + ahi + asg * v_sign * v_sign, 1.0)
    g_lo = -alo * rhs / denom
    g_hi = ahi * rhs / denom
    g_sg = asg * v_sign * rhs / denom
    gamma = jnp.concatenate([g_lo, g_hi, g_sg], axis=-1)
    return SignedBoxDuals(gamma, act_lo, act_hi, act_sg)


class SignedBoxVJP(NamedTuple):
    dl: Array
    dgamma: Array     # (B, 3n)
    gamma: Array      # (B, 3n)


def signed_box_vjp(
    P: Array,
    q: Array,
    l_min: Array,
    l_max: Array,
    v: Array,
    l: Array,
    g: Array,
    cfg: SolverConfig,
) -> SignedBoxVJP:
    """Adjoint of the signed-box solution map, INCLUDING the sign-constraint
    dual. Divergence from the reference (documented): its Python backward
    reuses the plain box-QP derivative routine and never differentiates the
    sign constraint (qcqp.py:111-137, comment "npt implemented"). Here the
    third constraint block v_i l_i <= 0 enters the system like any other;
    gradients are validated against finite differences."""
    if P.ndim == 2:
        # Diagonal P: closed-form elementwise (_diag_coord_adjoint).
        duals_d = signed_box_dual(P, q, l_min, l_max, v, l, cfg)
        n_ = l.shape[-1]
        g_lo = duals_d.gamma[:, :n_]
        g_hi = duals_d.gamma[:, n_ : 2 * n_]
        g_sg = duals_d.gamma[:, 2 * n_ :]
        am_lo = (duals_d.act_lo & (g_lo > cfg.act_eps)).astype(l.dtype)
        am_hi = (duals_d.act_hi & (g_hi > cfg.act_eps)).astype(l.dtype)
        am_sg = (duals_d.act_sg & (g_sg > cfg.act_eps)).astype(l.dtype)
        dl, (dg_lo, dg_hi, dg_sg) = _diag_coord_adjoint(
            P, g,
            [-g_lo * am_lo, g_hi * am_hi, jnp.sign(v) * g_sg * am_sg],
        )
        return SignedBoxVJP(
            dl=dl,
            dgamma=jnp.concatenate([dg_lo, dg_hi, dg_sg], axis=-1),
            gamma=duals_d.gamma,
        )
    if _use_fused_kernel(P, l, cfg):
        from ..kernels.coord_bwd_pallas import (
            KIND_SIGNED_BOX,
            coord_kkt_bwd_fused,
        )

        dl, dgamma, gamma = coord_kkt_bwd_fused(
            P, q, l, g, l_min, l_max, jnp.sign(v), KIND_SIGNED_BOX,
            eps=cfg.eps, act_eps=cfg.act_eps, tile_b=cfg.pallas_tile_b,
        )
        return SignedBoxVJP(dl=dl, dgamma=dgamma, gamma=gamma)
    duals = signed_box_dual(P, q, l_min, l_max, v, l, cfg)
    v_sign = jnp.sign(v)
    n = l.shape[-1]
    act_prim = jnp.concatenate(
        [duals.act_lo, duals.act_hi, duals.act_sg], axis=-1
    )
    act = act_prim & (duals.gamma > cfg.act_eps)
    am = act.astype(l.dtype)
    # S^T assembled directly, as in box_vjp.
    J = _signed_selector(act[:, :n], act[:, n : 2 * n], act[:, 2 * n :], v_sign)
    Jt = _signed_selector_T(act[:, :n], act[:, n : 2 * n], act[:, 2 * n :], v_sign)
    Bt = J * (duals.gamma * am)[:, None, :]
    Pd = _as_dense(P)
    Bsz = l.shape[0]
    eye_inact = jnp.eye(3 * n, dtype=l.dtype) * (1.0 - am)[:, None, :]
    top = jnp.concatenate([eye_inact, Jt], axis=-1)
    bot = jnp.concatenate([Bt, Pd], axis=-1)
    ST = jnp.concatenate([top, bot], axis=-2)
    rhs = jnp.concatenate([jnp.zeros((Bsz, 3 * n), l.dtype), g], axis=-1)
    x = _solve_direct(ST, rhs, cfg)
    return SignedBoxVJP(dl=x[:, 3 * n :], dgamma=x[:, : 3 * n] * am, gamma=duals.gamma)


# --------------------------------------------------------------------------
# Friction-cone QCQP:  min 1/2 l^T P l + q^T l  s.t. ||l_(i)|| <= r_i = mu_i l_n_i
# --------------------------------------------------------------------------

class QCQPDuals(NamedTuple):
    gamma: Array      # (B, nc) standard multipliers, zeros at inactive
    active: Array     # (B, nc) bool


def qcqp_dual(
    P: Array, q: Array, radius: Array, l: Array, cfg: SolverConfig,
    eps: Array | None = None, r_min: Array | None = None,
) -> QCQPDuals:
    """Per-contact dual recovery (Solver.cpp:584-617).

    Active iff slack = r - ||l_(i)|| <= eps AND r >= eps (degenerate-cone
    guard, Solver.cpp:597). The constraint Jacobian C has disjoint per-contact
    columns (2 l_(i)), so the reference's normal-equations solve
    gamma = -(C~^T C~)^{-1} C~^T (Pl+q) is DIAGONAL:
    gamma_i = -(C^T(Pl+q))_i / (4 ||l_(i)||^2).

    ``eps`` overrides the slack activity threshold and ``r_min`` the
    degenerate-cone gate (scalar or broadcastable arrays; None = cfg.eps for
    both, the autodiff path's behavior). The public recovery surface
    (duals.py) passes scale-aware floors so f32 solutions - whose binding
    contacts sit O(eps_f32 * r) off the boundary after prox rounding or
    equilibration map-back - are classified correctly.
    """
    B = l.shape[0]
    nc = radius.shape[-1]
    pts = l.reshape(B, nc, 2)
    norms = jnp.linalg.norm(pts, axis=-1)
    slack = radius - norms
    e = cfg.eps if eps is None else eps
    rm = cfg.eps if r_min is None else r_min
    active = (slack <= e) & (radius >= rm)
    plq = _pl_plus_q(P, l, q).reshape(B, nc, 2)
    num = -2.0 * jnp.sum(pts * plq, axis=-1)          # (C^T (Pl+q))_i negated
    den = 4.0 * jnp.sum(pts * pts, axis=-1)
    # Dual-feasibility projection: gamma >= 0 at any KKT point of the cone
    # constraint, so a negative least-squares estimate is pure recovery
    # noise (f32 stationarity error ~delta/(2||l_i||) on a small-radius
    # binding contact). Left unclamped it can make D = P + 2*blockdiag(
    # gamma) indefinite and NaN the SPD adjoint paths (Cholesky /
    # Newton-Schulz); the reference's unclamped recovery feeds a
    # sign-agnostic LU and merely degrades. Mirrored in the fused
    # kernel's in-kernel recovery (kernels/qcqp_bwd_pallas.py).
    gamma = jnp.where(
        active,
        jnp.maximum(num, 0.0) / jnp.maximum(den, jnp.finfo(l.dtype).tiny),
        0.0,
    )
    return QCQPDuals(gamma=gamma, active=active)


def qcqp_strict_active(
    l: Array, radius: Array, gamma: Array, cfg: SolverConfig
) -> tuple[Array, Array]:
    """Squared slacks s and the strict-complementarity mask gating contacts
    into the differentiated-KKT system (Solver.cpp:639 + gamma > 0).

    The s-threshold must sit above the working dtype's noise floor of s
    (~eps_mach * (||l||^2 + r^2)); the reference's fixed 1e-10 is below
    float32 noise, so binding contacts would be randomly classified inactive
    and silently lose their gradient. Inert in float64 (8 ulps ~ 1e-15 *
    scale < act_eps)."""
    B_, n = l.shape
    nc = radius.shape[-1]
    pts = l.reshape(B_, nc, 2)
    sq = jnp.sum(pts * pts, axis=-1)
    s = sq - radius * radius
    s_tol = jnp.maximum(
        cfg.act_eps, 8.0 * jnp.finfo(l.dtype).eps * (sq + radius * radius)
    )
    active = (s > -s_tol) & (radius > cfg.act_eps) & (gamma > cfg.act_eps)
    return s, active


class QCQPVJP(NamedTuple):
    dl: Array         # (B, 2nc)
    dgamma: Array     # (B, nc)
    gamma: Array      # (B, nc)


def qcqp_vjp(
    P: Array,
    q: Array,
    radius: Array,
    l: Array,
    g: Array,
    cfg: SolverConfig,
    duals: QCQPDuals | None = None,
) -> QCQPVJP:
    """Adjoint of the QCQP solution map (Solver.cpp:619-681, fixed-shape).

    Squared-slack form s_i = ||l_(i)||^2 - r_i^2; system (before transpose),
    unknowns (dgamma (nc), dl (2nc)):
        [[diag(s)+I_inact,  B],    B = diag(gamma) C^T (rows for strict slots)
         [C (masked cols),  D]]    D = P + blockdiag(2 gamma_i I_2)
    Active iff s > -act_eps AND r > act_eps (Solver.cpp:639) AND
    gamma > act_eps (strict complementarity, required by the direct LU
    solve; see module docstring). Solved as S^T x = [0; g] by LU.
    """
    B_, n = l.shape
    nc = radius.shape[-1]

    if duals is None and P.ndim == 2:
        # Diagonal P: D = diag(P) + 2 gamma I is diagonal and C's columns
        # are disjoint per contact, so the Schur complement M is DIAGONAL
        # and the whole adjoint is closed-form elementwise - no assembly,
        # no solver (the diagonal analogue of qcqp_bwd_pallas.py's math).
        duals_d = qcqp_dual(P, q, radius, l, cfg)
        s, am_b = qcqp_strict_active(l, radius, duals_d.gamma, cfg)
        am = am_b.astype(l.dtype)
        tiny = jnp.finfo(l.dtype).tiny
        gam_coord = jnp.repeat(duals_d.gamma, 2, axis=-1)      # raw, (B, n)
        d = P + 2.0 * gam_coord
        d_safe = jnp.where(jnp.abs(d) > tiny, d, tiny)
        wg = g / d_safe
        pts = l.reshape(B_, nc, 2)
        wpts = wg.reshape(B_, nc, 2)
        dinv = (1.0 / d_safe).reshape(B_, nc, 2)
        ctd_c = 4.0 * jnp.sum(pts * pts * dinv, axis=-1)       # (C^T D^-1 C)_cc
        sigma = s * am + (1.0 - am)
        M = sigma - ctd_c * (duals_d.gamma * am) * am
        y = -2.0 * am * jnp.sum(pts * wpts, axis=-1)
        dgamma = am * y / jnp.where(jnp.abs(M) > tiny, M, tiny)
        coeff = (duals_d.gamma * am * dgamma)                  # (B, nc)
        dl = wg - (2.0 * l / d_safe) * jnp.repeat(coeff, 2, axis=-1)
        return QCQPVJP(dl=dl, dgamma=dgamma, gamma=duals_d.gamma)

    if duals is None and _use_fused_kernel(P, l, cfg):
        # One fused kernel: dual recovery + Schur-complement adjoint solve
        # (one SPD Cholesky of D + an nc x nc system, no (B, nc+n, nc+n)
        # assembly and no separate Pl+q pass; kernels/qcqp_bwd_pallas.py).
        from ..kernels.qcqp_bwd_pallas import qcqp_kkt_bwd_fused

        dgamma, dl, gamma = qcqp_kkt_bwd_fused(
            P, q, l, g, radius,
            eps=cfg.eps, act_eps=cfg.act_eps,
            stall_ulps=8.0 * float(jnp.finfo(jnp.float32).eps),
            tile_b=cfg.pallas_tile_b,
        )
        return QCQPVJP(dl=dl, dgamma=dgamma, gamma=gamma)

    if duals is None:
        duals = qcqp_dual(P, q, radius, l, cfg)
    s, active = qcqp_strict_active(l, radius, duals.gamma, cfg)
    am = active.astype(l.dtype)

    if nc + n > 88:
        # Beyond the QR kernel's VMEM bound, a (nc+n)-sized batched LU is
        # the expensive path (44 ms at the flagship shape, DESIGN.md
        # section 3, and growing as m^3). Eliminate dl instead: D = P +
        # blockdiag(2 gamma_i I_2) is SPD, so one batched Cholesky of D
        # and an nc x nc Schur system replace the LU - the XLA mirror of
        # the fused kernel's math (kernels/qcqp_bwd_pallas.py), tested
        # against the LU path in tests/test_large_n.py.
        return _qcqp_schur_vjp(P, l, g, s, am, duals.gamma, nc, n)

    # Assemble S^T DIRECTLY (each block a masked broadcast; D symmetric),
    # avoiding a batched trailing-dims transpose - blocks shared with the
    # Schur path via _qcqp_kkt_blocks.
    Ct, Bt, D = _qcqp_kkt_blocks(P, l, duals.gamma, am, nc, n)

    top = jnp.concatenate(
        [jnp.eye(nc, dtype=l.dtype) * (s * am + (1.0 - am))[:, :, None], Ct],
        axis=-1,
    )
    bot = jnp.concatenate([Bt, D], axis=-1)
    ST = jnp.concatenate([top, bot], axis=-2)
    rhs = jnp.concatenate([jnp.zeros((B_, nc), l.dtype), g], axis=-1)
    x = _solve_direct(ST, rhs, cfg)
    return QCQPVJP(dl=x[:, nc:], dgamma=x[:, :nc] * am, gamma=duals.gamma)


def _qcqp_kkt_blocks(P, l, gamma, am, nc: int, n: int):
    """Shared block assembly of the transposed differentiated-KKT system
    S^T = [[diag(sigma), C^T], [B^T, D]] (masked by the active set am):
    C (n, nc) column i = 2 l_(i) in rows (2i, 2i+1); B = diag(gamma) C^T;
    D = P + blockdiag(2 gamma_i I_2). One definition for both the direct
    (m <= 88) and Schur (m > 88) paths so a masking-convention fix cannot
    diverge between them."""
    dtype = l.dtype
    contact_of = jnp.arange(n) // 2                     # (n,)
    sel_T = (jnp.arange(nc)[:, None] == contact_of[None, :]).astype(dtype)
    Ct = 2.0 * l[:, None, :] * sel_T * am[:, :, None]               # (B, nc, n)
    Bt = 2.0 * l[:, :, None] * sel_T.T * (gamma * am)[:, None, :]   # (B, n, nc)
    gamma_per_coord = jnp.repeat(gamma, 2, axis=-1)                 # (B, n)
    D = _as_dense(P) + 2.0 * gamma_per_coord[:, :, None] * jnp.eye(
        n, dtype=dtype
    )
    return Ct, Bt, D


def _qcqp_schur_vjp(
    P: Array, l: Array, g: Array, s: Array, am: Array, gamma: Array,
    nc: int, n: int,
) -> QCQPVJP:
    """Schur-complement form of the transposed differentiated-KKT solve:

        sigma dgamma + C^T dl = 0,   B^T dgamma + D dl = g
        =>  (sigma - C^T D^{-1} B^T) dgamma = -C^T D^{-1} g
            dl = D^{-1} (g - B^T dgamma)

    with D = P + blockdiag(2 gamma_i I_2) SPD (one batched Cholesky, nc+1
    simultaneous right-hand sides) and an nc x nc system - never a
    (nc+n)^3 pivoted LU."""
    dtype = l.dtype
    Ct, Bt, D = _qcqp_kkt_blocks(P, l, gamma, am, nc, n)
    sigma = s * am + (1.0 - am)

    rhs = jnp.concatenate([g[..., None], Bt], axis=-1)              # (B, n, 1+nc)
    if dtype == jnp.float32:
        X = jnp.einsum("bij,bjk->bik", _spd_inverse_f32(D), rhs,
                        precision=jax.lax.Precision.HIGHEST)
    else:
        X = spd_cholesky_solve(D, rhs)
    y, W = X[..., 0], X[..., 1:]                    # D^{-1} g, D^{-1} B^T
    # precision pinned: TPU default-precision einsum runs bf16 and puts
    # ~1e-2 relative error into M before it is solved (ops/linalg.py:29
    # documents the measured failure; CPU parity tests cannot catch it).
    M = jnp.eye(nc, dtype=dtype) * sigma[:, :, None] - jnp.einsum(
        "bcn,bnk->bck", Ct, W, precision=jax.lax.Precision.HIGHEST
    )
    rhs_g = -jnp.sum(Ct * y[:, None, :], axis=-1)
    dgamma = jnp.linalg.solve(M, rhs_g[..., None])[..., 0] * am
    dl = y - jnp.sum(W * dgamma[:, None, :], axis=-1)
    return QCQPVJP(dl=dl, dgamma=dgamma, gamma=gamma)


def qcqp_radius_factors(l_n: Array, mu: Array, gamma: Array) -> tuple[Array, Array]:
    """Chain-rule diagonals E1, E2 (Solver.cpp:683-691) as vectors:
    E1 = 2 gamma l_n^2 mu (grad_mu factor), E2 = 2 gamma l_n mu^2 (grad_l_n
    factor)."""
    e1 = 2.0 * gamma * l_n * l_n * mu
    e2 = 2.0 * gamma * l_n * mu * mu
    return e1, e2
