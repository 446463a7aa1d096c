"""Full parameter Jacobians of the solution maps - one KKT solve, n RHS.

The reference exposes only VJPs (one cotangent per backward call,
qcqp.py:36-52, :156-181); a user wanting the full sensitivity dl/dq of a
solved problem has to run ``jax.jacrev`` over the solve, which re-runs the
whole backward - dual recovery, KKT assembly and a fresh factorisation -
once per output coordinate (n times). But the adjoint map g -> (dl, dgamma)
is LINEAR through one fixed matrix: the transposed differentiated-KKT system
S^T of diff/kkt.py. This module assembles S^T once and solves it against the
n-column identity cotangent block in a single batched multi-RHS solve, then
reads every parameter Jacobian off the solution with the same chain-rule
factors the VJPs use:

    dl_i/dq_j      = -DL[i, j]
    dl_i/dP_jk     = -(DL[i, j] l_k + l_j DL[i, k]) / 2      (symmetrised,
                      identical to jacrev of the solver; see api._grad_P)
    dl_i/dl_min_j  = -gamma_lo_j * DG_lo[i, j]               (box family)
    dl_i/dl_max_j  = +gamma_hi_j * DG_hi[i, j]
    dl_i/dl_n_c    =  E2_c * DG[i, c]                        (QCQP,
    dl_i/dmu_c     =  E1_c * DG[i, c]                         Solver.cpp:683)

with DL[i, :] = dl(e_i), DG[i, :] = dgamma(e_i) the adjoint solutions for
the basis cotangents. Agreement with ``jax.jacrev`` of the public solvers is
exact by construction (same masks, same system, same assembly) and is
asserted in tests/test_jacobian.py.

Cost: one solve with n right-hand sides instead of n solves - at B=4096
N=24 that is the difference between one batched factorisation and
twenty-four. These functions are a sensitivity-analysis surface (robotics
Jacobians, uncertainty propagation, active-set diagnostics), not the
training hot path: they run on the XLA engines (batched LU / Cholesky), not
the fused Pallas kernels, and materialise (B, n, n) outputs by design.

Conventions: inputs accept every layout ``canon_problem`` does (batched or
not, dense or diagonal P); outputs are in the flat canonical layout -
leading batch axis iff the input had one, Jacobian rows indexed by the
output coordinate l_i. Diagonal-P problems are differentiated through the
same dense assembly (the Jacobian itself is a dense (n, n) object either
way). ``dl_dP`` is the Jacobian against the SYMMETRISED parametrisation the
solver actually sees (canon_problem symmetrises P; api._grad_P documents
the equivalence with the reference's one-sided convention).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig
from ..ops.linalg import spd_cholesky_solve
from ..utils.shapes import canon_like, canon_problem
from . import kkt

_HI = jax.lax.Precision.HIGHEST


def _solve_multi(A: Array, rhs: Array, spd: bool = False) -> Array:
    """Batched multi-RHS solve, A (B, m, m), rhs (B, m, k) -> (B, m, k).

    SPD systems go through the shared batched Cholesky + two triangular
    sweeps (ops/linalg.py::spd_cholesky_solve - one definition with the
    adjoint paths); general (saddle) systems through one batched LU. Both
    factor ONCE for all right-hand sides - the entire point of this module.
    """
    if spd:
        return spd_cholesky_solve(A, rhs)
    return jnp.linalg.solve(A, rhs)


def _dl_dP(dl_dq: Array, l: Array) -> Array:
    """(B, n, n, n): dl_i/dP_jk = (dl_dq[i,j] l_k + l_j dl_dq[i,k]) / 2.

    Follows from grad_P(g) = -(dl l^T + l dl^T)/2 and grad_q(g) = -dl being
    the same linear functional of the adjoint dl (api._grad_P)."""
    return 0.5 * (
        dl_dq[..., :, :, None] * l[..., None, None, :]
        + l[..., None, :, None] * dl_dq[..., :, None, :]
    )


def _restore(batched: bool, *arrays):
    out = tuple(None if a is None else (a if batched else a[0]) for a in arrays)
    return out if len(out) > 1 else out[0]


# --------------------------------------------------------------------------
# Non-negative QP
# --------------------------------------------------------------------------

class QPJacobian(NamedTuple):
    dl_dq: Array            # (B, n, n)   [i, j] = dl_i / dq_j
    dl_dP: Optional[Array]  # (B, n, n, n) or None


def qp_jacobian(
    P, q, *, l=None, config: Optional[SolverConfig] = None,
    include_dP: bool = False,
) -> QPJacobian:
    """Full sensitivity of the non-negative-QP solution l(P, q).

    The masked system decouples (diff/kkt.py::qp_vjp): K = mask_f P mask_f +
    I_active is SPD and symmetric, so dl/dq = -mask_f K^{-1} mask_f via one
    Cholesky with n right-hand sides.

    Args:
      P, q: problem in any ``canon_problem`` layout.
      l: optional already-computed solution (same layout as q); solved here
        via ``solve_qp`` when omitted.
      include_dP: also materialise the (B, n, n, n) ``dl_dP`` block.
    """
    cfg = config if config is not None else QP_DEFAULTS
    c = canon_problem(P, q)
    if l is None:
        from ..api import solve_qp

        l = solve_qp(P, q, config=cfg)
    lc = canon_like(l, c, "l", width=c.q.shape[-1])
    n = lc.shape[-1]
    gamma = kkt.qp_dual(c.P, c.q, lc, cfg)
    fm = (~(gamma < -cfg.act_eps)).astype(lc.dtype)
    Pd = kkt._as_dense(c.P)
    K = Pd * fm[:, :, None] * fm[:, None, :] + jnp.eye(n, dtype=lc.dtype) * (
        1.0 - fm
    )[:, None, :]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=lc.dtype), K.shape)
    Kinv = _solve_multi(K, eye, spd=True)
    dl_dq = -Kinv * fm[:, :, None] * fm[:, None, :]
    dl_dP = _dl_dP(dl_dq, lc) if include_dP else None
    return QPJacobian(*_restore(c.batched, dl_dq, dl_dP))


# --------------------------------------------------------------------------
# Box QP / signed box QP (shared saddle-system core)
# --------------------------------------------------------------------------

class BoxJacobian(NamedTuple):
    dl_dq: Array                # (B, n, n)
    dl_dl_min: Array            # (B, n, n)
    dl_dl_max: Array            # (B, n, n)
    dl_dP: Optional[Array]      # (B, n, n, n) or None


def _coord_jacobian(ST, am, cn, n, dtype):
    """Solve S^T X = [0; I_n] once; return (DL, DG) with DL (B, n, n)
    rows dl(e_i), DG (B, n, cn) rows dgamma(e_i) (masked)."""
    Bsz = ST.shape[0]
    rhs = jnp.concatenate(
        [
            jnp.zeros((Bsz, cn, n), dtype),
            jnp.broadcast_to(jnp.eye(n, dtype=dtype), (Bsz, n, n)),
        ],
        axis=-2,
    )
    X = _solve_multi(ST, rhs)                   # (B, cn + n, n)
    DL = jnp.swapaxes(X[:, cn:, :], -1, -2)     # [i, j] = dl(e_i)_j
    DG = jnp.swapaxes(X[:, :cn, :], -1, -2) * am[:, None, :]
    return DL, DG


def box_qp_jacobian(
    P, q, l_min, l_max, *, l=None, config: Optional[SolverConfig] = None,
    include_dP: bool = False,
) -> BoxJacobian:
    """Full sensitivity of the box-QP solution l(P, q, l_min, l_max).

    One batched LU of the (3n x 3n) transposed differentiated-KKT saddle
    system (diff/kkt.py::box_vjp) against n right-hand sides."""
    cfg = config if config is not None else QP_DEFAULTS
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    if l is None:
        from ..api import solve_box_qp

        l = solve_box_qp(P, q, l_min, l_max, config=cfg)
    lc = canon_like(l, c, "l", width=n)
    duals = kkt.box_dual(c.P, c.q, lo, hi, lc, cfg)
    act_prim = jnp.concatenate([duals.act_lo, duals.act_hi], axis=-1)
    act = act_prim & (duals.gamma > cfg.act_eps)
    am = act.astype(lc.dtype)
    J = kkt._box_selector(act[:, :n], act[:, n:], lc.dtype)
    Jt = kkt._box_selector_T(act[:, :n], act[:, n:], lc.dtype)
    Bt = J * (duals.gamma * am)[:, None, :]
    Pd = kkt._as_dense(c.P)
    eye_inact = jnp.eye(2 * n, dtype=lc.dtype) * (1.0 - am)[:, None, :]
    top = jnp.concatenate([eye_inact, Jt], axis=-1)
    bot = jnp.concatenate([Bt, Pd], axis=-1)
    ST = jnp.concatenate([top, bot], axis=-2)
    DL, DG = _coord_jacobian(ST, am, 2 * n, n, lc.dtype)
    g_lo, g_hi = duals.gamma[:, :n], duals.gamma[:, n:]
    dl_dq = -DL
    dl_dl_min = -g_lo[:, None, :] * DG[:, :, :n]
    dl_dl_max = g_hi[:, None, :] * DG[:, :, n:]
    dl_dP = _dl_dP(dl_dq, lc) if include_dP else None
    return BoxJacobian(
        *_restore(c.batched, dl_dq, dl_dl_min, dl_dl_max, dl_dP)
    )


def signed_box_qp_jacobian(
    P, q, l_min, l_max, v, *, l=None, config: Optional[SolverConfig] = None,
    include_dP: bool = False,
) -> BoxJacobian:
    """Full sensitivity of the signed-box-QP solution.

    Same saddle-system core as ``box_qp_jacobian`` with the 3n-slot signed
    selector; v only enters through sign(v) (zero derivative a.e., matching
    the VJP), so no dl_dv block exists."""
    cfg = config if config is not None else QP_DEFAULTS
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    vv = canon_like(v, c, "v", width=n)
    if l is None:
        from ..api import solve_signed_box_qp

        l = solve_signed_box_qp(P, q, l_min, l_max, v, config=cfg)
    lc = canon_like(l, c, "l", width=n)
    v_sign = jnp.sign(vv)
    duals = kkt.signed_box_dual(c.P, c.q, lo, hi, vv, lc, cfg)
    act_prim = jnp.concatenate(
        [duals.act_lo, duals.act_hi, duals.act_sg], axis=-1
    )
    act = act_prim & (duals.gamma > cfg.act_eps)
    am = act.astype(lc.dtype)
    J = kkt._signed_selector(
        act[:, :n], act[:, n : 2 * n], act[:, 2 * n :], v_sign
    )
    Jt = kkt._signed_selector_T(
        act[:, :n], act[:, n : 2 * n], act[:, 2 * n :], v_sign
    )
    Bt = J * (duals.gamma * am)[:, None, :]
    Pd = kkt._as_dense(c.P)
    eye_inact = jnp.eye(3 * n, dtype=lc.dtype) * (1.0 - am)[:, None, :]
    top = jnp.concatenate([eye_inact, Jt], axis=-1)
    bot = jnp.concatenate([Bt, Pd], axis=-1)
    ST = jnp.concatenate([top, bot], axis=-2)
    DL, DG = _coord_jacobian(ST, am, 3 * n, n, lc.dtype)
    g_lo, g_hi = duals.gamma[:, :n], duals.gamma[:, n : 2 * n]
    dl_dq = -DL
    dl_dl_min = -g_lo[:, None, :] * DG[:, :, :n]
    dl_dl_max = g_hi[:, None, :] * DG[:, :, n : 2 * n]
    dl_dP = _dl_dP(dl_dq, lc) if include_dP else None
    return BoxJacobian(
        *_restore(c.batched, dl_dq, dl_dl_min, dl_dl_max, dl_dP)
    )


# --------------------------------------------------------------------------
# Friction-cone QCQP
# --------------------------------------------------------------------------

class QCQPJacobian(NamedTuple):
    dl_dq: Array                # (B, n, n)
    dl_dl_n: Array              # (B, n, nc)
    dl_dmu: Array               # (B, n, nc)
    dl_dP: Optional[Array]      # (B, n, n, n) or None


def qcqp_jacobian(
    P, q, l_n, mu, *, l=None, config: Optional[SolverConfig] = None,
    include_dP: bool = False,
) -> QCQPJacobian:
    """Full sensitivity of the friction-cone-QCQP solution l(P, q, l_n, mu).

    Schur-complement core (diff/kkt.py::_qcqp_schur_vjp): one batched
    Cholesky of D = P + blockdiag(2 gamma_i I_2) serving n + nc simultaneous
    right-hand sides, one nc x nc system with n right-hand sides - never a
    per-coordinate refactorisation. Radius chain rule through E1/E2
    (Solver.cpp:683-691)."""
    cfg = config if config is not None else QCQP_DEFAULTS
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    nc = n // 2
    ln = canon_like(l_n, c, "l_n", width=nc)
    m = canon_like(mu, c, "mu", width=nc)
    if l is None:
        from ..api import solve_qcqp

        l = solve_qcqp(P, q, l_n, mu, config=cfg)
    lc = canon_like(l, c, "l", width=n)
    dtype = lc.dtype
    radius = ln * m
    duals = kkt.qcqp_dual(c.P, c.q, radius, lc, cfg)
    s, active = kkt.qcqp_strict_active(lc, radius, duals.gamma, cfg)
    am = active.astype(dtype)
    Ct, Bt, D = kkt._qcqp_kkt_blocks(c.P, lc, duals.gamma, am, nc, n)
    sigma = s * am + (1.0 - am)

    # D^{-1} against [I_n | B^T] in one Cholesky (n + nc RHS columns).
    Bsz = lc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (Bsz, n, n))
    X = _solve_multi(D, jnp.concatenate([eye, Bt], axis=-1), spd=True)
    Y, W = X[..., :n], X[..., n:]               # D^{-1}, D^{-1} B^T
    # precision pinned on every einsum: TPU default-precision dot_generals
    # run bf16 and would put ~1e-2 relative error into the returned
    # sensitivities (same measured failure as ops/linalg.py:29; the CPU
    # jacrev parity tests cannot catch it).
    M = jnp.eye(nc, dtype=dtype) * sigma[:, :, None] - jnp.einsum(
        "bcn,bnk->bck", Ct, W, precision=_HI
    )
    RHS_G = -jnp.einsum("bcn,bnk->bck", Ct, Y, precision=_HI)  # (B, nc, n)
    DG_cols = jnp.linalg.solve(M, RHS_G) * am[:, :, None]
    DL_cols = Y - jnp.einsum("bnc,bck->bnk", W, DG_cols, precision=_HI)
    DL = jnp.swapaxes(DL_cols, -1, -2)          # [i, j] = dl(e_i)_j
    DG = jnp.swapaxes(DG_cols, -1, -2)          # [i, c] = dgamma(e_i)_c
    e1, e2 = kkt.qcqp_radius_factors(ln, m, duals.gamma)
    dl_dq = -DL
    dl_dl_n = e2[:, None, :] * DG
    dl_dmu = e1[:, None, :] * DG
    dl_dP = _dl_dP(dl_dq, lc) if include_dP else None
    return QCQPJacobian(
        *_restore(c.batched, dl_dq, dl_dl_n, dl_dmu, dl_dP)
    )
