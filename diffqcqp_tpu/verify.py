"""Solution verification: KKT residuals with least-squares dual recovery.

The reference's notion of solution correctness is the KKT residual
``||P l + q + J^T gamma||`` printed (commented out) in its dev harness
(/root/reference/qcqplib/Solver.cpp:721, :825, :867). This module makes that
a first-class, batched, assertable oracle for all four problem classes:

    stationarity        ||P l + q + J(l)^T gamma||_inf
    primal feasibility  max_j  max(c_j(l), 0)
    complementarity     max_j |gamma_j * c_j(l)|
    dual feasibility    max_j  max(-gamma_j, 0)

Duals are recovered by least squares on the masked active-constraint
Jacobian via ``ops.linalg.refine_solve`` - the batched, fixed-shape analogue
of the reference's ``iterative_refinement`` (Solver.cpp:15-44), used here in
exactly the regime where its regularised-normal-equations recurrence is
well-posed: the constraint Jacobians of these problem classes have DISJOINT
per-constraint support (unit selector rows / per-contact 2-vectors), so the
normal matrix is diagonal-dominant and the Richardson loop converges in a
couple of steps.

Intended use: float64 verification of (possibly float32, on-TPU) solutions -
``tpu_smoke.py`` and the test suite assert on these residuals. This is a
diagnostic path, not the autodiff path; the KKT adjoints in diff/kkt.py use
their own closed-form/fused dual recovery.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from .ops.linalg import refine_solve
from .utils.shapes import canon_problem


class KKTResiduals(NamedTuple):
    """Per-problem KKT residuals (all (B,), all >= 0, all ~0 at an exact
    solution) plus the recovered multipliers."""

    stationarity: Array      # ||Pl + q + J^T gamma||_inf
    primal: Array            # max constraint violation
    complementarity: Array   # max |gamma_j c_j(l)|
    dual: Array              # max(-gamma_j, 0) (multiplier sign violation)
    gamma: Array             # (B, m) recovered multipliers (0 at inactive)


def _recover_gamma(Jt: Array, rhs: Array, mu_ir: float, iters: int) -> Array:
    """gamma = argmin ||J^T gamma - rhs||: refine_solve on A = J^T."""
    return refine_solve(Jt, rhs, mu_ir=mu_ir, iters=iters)


def _finish(
    plq: Array, Jt: Array, gamma: Array, c: Array, act: Array
) -> KKTResiduals:
    gamma = gamma * act
    stat = jnp.max(jnp.abs(plq + jnp.einsum("bnm,bm->bn", Jt, gamma)), axis=-1)
    prim = jnp.max(jnp.maximum(c, 0.0), axis=-1)
    comp = jnp.max(jnp.abs(gamma * c), axis=-1)
    dual = jnp.max(jnp.maximum(-gamma, 0.0), axis=-1)
    return KKTResiduals(stat, prim, comp, dual, gamma)


def _plq(P: Array, l: Array, q: Array) -> Array:
    if P.ndim == 2:
        return P * l + q
    return jnp.sum(P * l[:, None, :], axis=-1) + q


def _prep(P, q, l, tol_act: Optional[float], dtype):
    c = canon_problem(P, q)
    P_, q_ = c.P.astype(dtype), c.q.astype(dtype)
    l_ = jnp.asarray(l)
    if tol_act is None:
        # activity detection must be robust at the SOLUTION's precision: an
        # f32 solve leaves binding constraints ~eps_f32-scale off the
        # boundary, and a tolerance at the (f64) verification dtype would
        # classify them inactive, zero their multipliers and report the full
        # stationarity residual as an error.
        tol_act = 100.0 * float(jnp.finfo(l_.dtype).eps)
    l_ = (l_.reshape(q_.shape) if l_.size == q_.size else l_).astype(dtype)
    return P_, q_, l_, tol_act


def stationarity_bound(
    P, q, l, stats, *, alpha: float = 1.5, mu_prox: float = 1e-7,
    dtype=jnp.float64,
):
    """Per-problem upper bound on the returned iterate's stationarity
    residual, computable purely from SolveStats - the quantity the solver
    actually CONTROLS via its stopping rule.

    Derivation (exact arithmetic, any iteration k of the engine in
    solvers/admm.py; the reference's loop Solver.cpp:79-121 satisfies the
    same identity): the projection step makes the scaled dual u an exact
    element of the constraint set's normal cone at l2, i.e. u = J^T gamma
    for an exact multiplier. Substituting the linear-solve optimality
    (P + (rho+mu)I) l = rho*l2_prev - u_prev - q + mu*l_prev into
    P l2 + q + u and eliminating l via r = alpha*l + (1-alpha)*l2_prev:

        P l2 + q + u = P (l2 - l) + rho [(1-1/alpha)(r - l2) - (l2-l2_prev)/alpha]
                       + mu (l_prev - l)
        l2 - l       = -(r - l2)/alpha - (1-alpha)/alpha * (l2 - l2_prev)

    Taking inf-norms with rp = ||r - l2||_inf (res_prim), rd = rho *
    ||l2 - l2_prev||_inf (res_dual):

        ||P l2 + q + J' gamma||_inf
          <= (||P||_inf / alpha) * (rp + |1-alpha| * rd/rho)
             + (1 - 1/alpha) * rho * rp  +  rd / alpha
             + 2 * mu_prox * (||l2||_inf + rp + rd/rho)

    plus a floating-point floor for the working dtype's solve/assembly
    rounding (the identity is exact only in exact arithmetic). tpu_smoke.py
    asserts the measured f64 stationarity of f32 on-device solutions
    against this bound - replacing round-2's per-class loosened tolerances
    with the claim the stopping rule actually makes. The QP family's
    dual-only stopping (Solver.cpp:88) leaves rp uncontrolled at exit,
    which is WHY its tail stationarity can sit at rho*rp ~ 1e-2: that is
    the algorithm's contract, now checked instead of excused.

    Args: P, q, l as in the check_* functions; ``stats`` a SolveStats
    (res_prim, res_dual, rho are used). Returns (B,) bound in ``dtype``.
    """
    c = canon_problem(P, q)
    P_, q_ = c.P.astype(dtype), c.q.astype(dtype)
    l_ = jnp.asarray(l)
    solve_eps = float(jnp.finfo(l_.dtype).eps)
    l_ = (l_.reshape(q_.shape) if l_.size == q_.size else l_).astype(dtype)
    rp = jnp.asarray(stats.res_prim, dtype)
    rd = jnp.asarray(stats.res_dual, dtype)
    rho = jnp.maximum(jnp.asarray(stats.rho, dtype), jnp.finfo(dtype).tiny)
    if P_.ndim == 2:
        normP = jnp.max(jnp.abs(P_), axis=-1)
    else:
        normP = jnp.max(jnp.sum(jnp.abs(P_), axis=-1), axis=-1)
    lmax = jnp.max(jnp.abs(l_), axis=-1)
    qmax = jnp.max(jnp.abs(q_), axis=-1)
    delta = rd / rho
    a = float(alpha)
    bound = (
        (normP / a) * (rp + abs(1.0 - a) * delta)
        + (1.0 - 1.0 / a) * rho * rp
        + rd / a
        + 2.0 * mu_prox * (lmax + rp + delta)
    )
    # f32 floor: rounding of the in-solver triangular solves / assembly and
    # of the f64 residual evaluation of an f32-quantised solution; 64 is a
    # conservative constant for the ~n-term accumulations involved.
    floor = 64.0 * solve_eps * (
        (normP + rho + mu_prox) * jnp.maximum(lmax, 1.0) + qmax
    )
    return bound + floor


def check_qp(
    P, q, l, *, tol_act: Optional[float] = None, mu_ir: float = 1e-12,
    iters: int = 5, dtype=jnp.float64,
) -> KKTResiduals:
    """KKT residuals of a non-negative QP solution (c_i = -l_i <= 0)."""
    P_, q_, l_, tol = _prep(P, q, l, tol_act, dtype)
    n = q_.shape[-1]
    plq = _plq(P_, l_, q_)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(l_), axis=-1, keepdims=True))
    act = (-l_ >= -tol * scale).astype(dtype)
    Jt = -jnp.eye(n, dtype=dtype)[None] * act[:, None, :]
    gamma = _recover_gamma(Jt, -plq, mu_ir, iters)
    return _finish(plq, Jt, gamma, -l_, act)


def check_box_qp(
    P, q, l_min, l_max, l, *, tol_act: Optional[float] = None,
    mu_ir: float = 1e-12, iters: int = 5, dtype=jnp.float64,
) -> KKTResiduals:
    """KKT residuals of a box-QP solution (c = [l_min - l, l - l_max])."""
    P_, q_, l_, tol = _prep(P, q, l, tol_act, dtype)
    n = q_.shape[-1]
    lo = jnp.broadcast_to(jnp.asarray(l_min, dtype), l_.shape)
    hi = jnp.broadcast_to(jnp.asarray(l_max, dtype), l_.shape)
    plq = _plq(P_, l_, q_)
    cons = jnp.concatenate([lo - l_, l_ - hi], axis=-1)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(l_), axis=-1, keepdims=True))
    act = (cons >= -tol * scale).astype(dtype)
    eye = jnp.eye(n, dtype=dtype)[None]
    Jt = jnp.concatenate([-eye * act[:, None, :n], eye * act[:, None, n:]], axis=-1)
    gamma = _recover_gamma(Jt, -plq, mu_ir, iters)
    return _finish(plq, Jt, gamma, cons, act)


def check_signed_box_qp(
    P, q, l_min, l_max, v, l, *, tol_act: Optional[float] = None,
    mu_ir: float = 1e-12, iters: int = 5, dtype=jnp.float64,
) -> KKTResiduals:
    """KKT residuals of a signed-box solution
    (c = [l_min - l, l - l_max, sign(v) * l])."""
    P_, q_, l_, tol = _prep(P, q, l, tol_act, dtype)
    n = q_.shape[-1]
    lo = jnp.broadcast_to(jnp.asarray(l_min, dtype), l_.shape)
    hi = jnp.broadcast_to(jnp.asarray(l_max, dtype), l_.shape)
    vs = jnp.sign(jnp.broadcast_to(jnp.asarray(v, dtype), l_.shape))
    plq = _plq(P_, l_, q_)
    cons = jnp.concatenate([lo - l_, l_ - hi, vs * l_], axis=-1)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(l_), axis=-1, keepdims=True))
    act = (cons >= -tol * scale).astype(dtype)
    # a zero-sign slot (v == 0) is no constraint at all
    act = act.at[:, 2 * n :].multiply(jnp.abs(vs))
    eye = jnp.eye(n, dtype=dtype)[None]
    Jt = jnp.concatenate(
        [
            -eye * act[:, None, :n],
            eye * act[:, None, n : 2 * n],
            eye * (vs[:, None, :] * act[:, None, 2 * n :]),
        ],
        axis=-1,
    )
    gamma = _recover_gamma(Jt, -plq, mu_ir, iters)
    return _finish(plq, Jt, gamma, cons, act)


def check_qcqp(
    P, q, l_n, mu, l, *, tol_act: Optional[float] = None,
    mu_ir: float = 1e-12, iters: int = 5, dtype=jnp.float64,
) -> KKTResiduals:
    """KKT residuals of a friction-cone QCQP solution, squared-slack form
    (c_i = ||l_(i)||^2 - r_i^2 <= 0 with r = l_n * mu, matching the
    differentiated system of Solver.cpp:619-681)."""
    P_, q_, l_, tol = _prep(P, q, l, tol_act, dtype)
    B, n = l_.shape
    nc = n // 2
    r = (jnp.asarray(l_n, dtype) * jnp.asarray(mu, dtype)).reshape(B, nc)
    plq = _plq(P_, l_, q_)
    pts = l_.reshape(B, nc, 2)
    sq = jnp.sum(pts * pts, axis=-1)
    cons = sq - r * r                                  # (B, nc)
    scale = jnp.maximum(1.0, sq + r * r)
    # Degenerate-cone gate: a cone is a point (multiplier undefined, J row
    # 2l ~ 0) only when r^2 is unresolvable above the solution dtype's noise
    # at the CONTACT's own scale - a radius-relative test. The earlier
    # absolute gate (r > tol ~ 1.2e-5 for f32) zeroed the multipliers of
    # genuinely binding small-force contacts and charged their full
    # stationarity residual as error.
    act = ((cons >= -tol * scale) & (r * r > tol * (sq + r * r))).astype(dtype)
    # J row i = 2 l_(i) on coords (2i, 2i+1): J^T (B, n, nc)
    coord_contact = (
        jnp.arange(nc)[None, :] == (jnp.arange(n) // 2)[:, None]
    ).astype(dtype)                                    # (n, nc)
    Jt = 2.0 * l_[:, :, None] * coord_contact[None] * act[:, None, :]
    gamma = _recover_gamma(Jt, -plq, mu_ir, iters)
    return _finish(plq, Jt, gamma, cons, act)
