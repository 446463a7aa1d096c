"""Public on-device dual recovery and raw KKT-derivative solves.

The reference exposes its adjoint machinery directly to users: the pybind
layer returns dl from ``solveDerivativesQP`` (pybindings.cpp:24-30), the
multipliers themselves as ``(blgamma, gamma)`` from ``solveDerivativesBoxQP``
(pybindings.cpp:40-45), and ``(E1, E2, blgamma)`` from
``solveDerivativesQCQP`` (pybindings.cpp:62-71). This module is that surface
for the TPU framework: batched, fixed-shape, jit/vmap-compatible, running in
the solution's working precision on the solver backend (the derivative
solves inherit diff/kkt.py's dispatch, i.e. the fused Pallas kernels on
TPU/f32) - e.g. a physics user can read contact normal/friction multipliers
(or raw dgamma/dl sensitivities) on-device without leaving f32.

Two families:

  * ``recover_*_duals`` - multipliers gamma of an already-solved problem.
    STANDARD KKT convention throughout: constraints written c(l) <= 0,
    stationarity P l + q + J^T gamma = 0, gamma >= 0 - the same convention
    as ``verify.KKTResiduals.gamma`` (the f64 diagnostic oracle), asserted
    to agree with it in tests/test_duals.py. NOTE the reference's plain-QP
    recovery returns the NEGATED multiplier (gamma = -(Pl+q),
    Solver.cpp:127); negate ``recover_qp_duals`` for bit-parity with
    ``dualFromPrimalQP``. Box/signed-box/QCQP conventions already match the
    reference (Solver.cpp:302, :496, :610).

    Activity thresholds are scale-aware BY DEFAULT (``act_floor``): a
    binding constraint of an f32 solution sits O(eps_f32 * scale) off the
    boundary (prox rounding, equilibration map-back), far above the
    reference's absolute eps=1e-10 - without the floor such slots would be
    classified inactive and silently lose their multiplier (the same trap
    CLAUDE.md records for gradient active-sets). Set ``act_floor=0`` for
    the reference's exact absolute-eps behavior.

  * ``*_derivatives`` - the transposed differentiated-KKT solve against a
    user-supplied cotangent grad_l: exactly what the reference's
    solveDerivatives* compute per batch item, here one batched fixed-shape
    solve (diff/kkt.py). Returns are UNPACKED (dl, per-block dgamma,
    per-block gamma) rather than the reference's scatter-packed blgamma
    vectors (Solver.cpp:363-370, :671-679) - same information, fixed
    shapes. Gradient assembly from these matches the reference recipe
    (qcqp.py:45-52, :167-181):

        grad_P = -dl l^T          grad_q = -dl
        grad_l_min = -gamma_lo * dgamma_lo
        grad_l_max = +gamma_hi * dgamma_hi
        grad_l_n = e2 * dgamma    grad_mu = e1 * dgamma

These are diagnostic/advanced surfaces: the solvers' autodiff (api.py)
already wires the same machinery into ``jax.custom_vjp``; use these when
you need the multipliers or sensitivities themselves.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from .config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig
from .diff import kkt
from .utils.shapes import Canon, canon_like, canon_problem

__all__ = [
    "recover_qp_duals",
    "recover_box_qp_duals",
    "recover_signed_box_qp_duals",
    "recover_qcqp_duals",
    "qp_derivatives",
    "box_qp_derivatives",
    "signed_box_qp_derivatives",
    "qcqp_derivatives",
    "BoxDualRecovery",
    "SignedBoxDualRecovery",
    "BoxQPDerivatives",
    "SignedBoxQPDerivatives",
    "QCQPDerivatives",
]


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _canon(P, q, l, cfg_base, config) -> tuple[Canon, Array, SolverConfig]:
    cfg = config if config is not None else cfg_base
    c = canon_problem(P, q)
    l_ = canon_like(l, c, "l", width=c.q.shape[-1])
    return c, l_, cfg


def _act_eps(l: Array, cfg: SolverConfig, act_floor: float) -> Array:
    """Per-problem activity threshold max(cfg.eps, floor * eps_mach *
    max(1, ||l||_inf)) as a (B, 1) array (broadcasts into every kkt
    activity test). floor=100 matches verify.py's default robustness
    margin; 0 restores the reference's absolute eps."""
    if act_floor <= 0.0:
        return jnp.asarray(cfg.eps, l.dtype)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(l), axis=-1, keepdims=True))
    floor = act_floor * jnp.finfo(l.dtype).eps * scale
    return jnp.maximum(jnp.asarray(cfg.eps, l.dtype), floor)


# --------------------------------------------------------------------------
# dual recovery
# --------------------------------------------------------------------------

def recover_qp_duals(
    P, q, l, *, config: Optional[SolverConfig] = None,
    act_floor: float = 100.0,
) -> Array:
    """Multipliers gamma >= 0 of min 1/2 l'Pl + q'l s.t. l >= 0 at the
    solution l (constraints c_i = -l_i <= 0; gamma_i = (Pl+q)_i at active
    slots, 0 elsewhere). Standard convention: the reference's
    ``dualFromPrimalQP`` (Solver.cpp:125-134) returns the NEGATED value."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    eps = _act_eps(l_, cfg, act_floor)
    gamma = -kkt.qp_dual(c.P, c.q, l_, cfg, eps=eps)
    return c.restore(gamma)


class BoxDualRecovery(NamedTuple):
    gamma_lo: Array   # (..., n) multipliers of l_min - l <= 0
    gamma_hi: Array   # (..., n) multipliers of l - l_max <= 0


def recover_box_qp_duals(
    P, q, l_min, l_max, l, *, config: Optional[SolverConfig] = None,
    act_floor: float = 100.0,
) -> BoxDualRecovery:
    """Box-QP multipliers at the solution l, minimal-norm least squares on
    the active selector rows - the closed form of the reference's
    ``dualFromPrimalBoxQP`` refinement solve (Solver.cpp:263-308; the rows
    touch disjoint columns so J J^T is diagonal)."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    eps = _act_eps(l_, cfg, act_floor)
    d = kkt.box_dual(c.P, c.q, lo, hi, l_, cfg, eps=eps)
    return BoxDualRecovery(
        gamma_lo=c.restore(d.gamma[:, :n]),
        gamma_hi=c.restore(d.gamma[:, n:]),
    )


class SignedBoxDualRecovery(NamedTuple):
    gamma_lo: Array    # (..., n)
    gamma_hi: Array    # (..., n)
    gamma_sign: Array  # (..., n) multipliers of sign(v) * l <= 0


def recover_signed_box_qp_duals(
    P, q, l_min, l_max, v, l, *, config: Optional[SolverConfig] = None,
    act_floor: float = 100.0,
) -> SignedBoxDualRecovery:
    """Signed-box multipliers (3n: lower/upper/sign blocks) at the solution
    l (``dualFromPrimalSignedBoxQP``, Solver.cpp:441-502)."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    vv = canon_like(v, c, "v", width=n)
    eps = _act_eps(l_, cfg, act_floor)
    d = kkt.signed_box_dual(c.P, c.q, lo, hi, vv, l_, cfg, eps=eps)
    return SignedBoxDualRecovery(
        gamma_lo=c.restore(d.gamma[:, :n]),
        gamma_hi=c.restore(d.gamma[:, n : 2 * n]),
        gamma_sign=c.restore(d.gamma[:, 2 * n :]),
    )


def recover_qcqp_duals(
    P, q, l_n, mu, l, *, config: Optional[SolverConfig] = None,
    act_floor: float = 100.0,
) -> Array:
    """Per-contact cone multipliers gamma >= 0 at the QCQP solution l
    (``dualFromPrimalQCQP``, Solver.cpp:584-617: the per-contact Jacobian
    columns are disjoint so the normal-equations solve is diagonal).
    SQUARED-slack convention, like the reference and verify.py: c_i =
    ||l_(i)||^2 - r_i^2 with Jacobian column 2 l_(i) (Solver.cpp:590-591);
    the norm-form multiplier of ||l_(i)|| <= r_i is 2 r_i gamma_i. In the
    physics reading these are the friction-cone constraint sensitivities at
    each contact.

    With ``act_floor`` > 0 the slack test is floored at
    eps_f32-scale * (r + ||l_(i)||) per contact and the degenerate-cone
    gate becomes radius-relative (a cone is only "a point" when its radius
    is unresolvable below the contact's own scale), both required for f32
    solutions; ``act_floor=0`` restores the reference's absolute gates."""
    c, l_, cfg = _canon(P, q, l, QCQP_DEFAULTS, config)
    n = c.q.shape[-1]
    nc = n // 2
    B = l_.shape[0]
    radius = canon_like(l_n, c, "l_n", width=nc) * canon_like(
        mu, c, "mu", width=nc
    )
    if act_floor > 0.0:
        pts = l_.reshape(B, nc, 2)
        norms = jnp.linalg.norm(pts, axis=-1)
        mach = jnp.finfo(l_.dtype).eps
        eps = jnp.maximum(cfg.eps, act_floor * mach * (radius + norms))
        r_min = jnp.maximum(cfg.eps, mach * norms)
    else:
        eps = r_min = None
    d = kkt.qcqp_dual(c.P, c.q, radius, l_, cfg, eps=eps, r_min=r_min)
    return c.restore(d.gamma)


# --------------------------------------------------------------------------
# raw KKT-derivative solves (the reference's solveDerivatives* surface)
# --------------------------------------------------------------------------

def qp_derivatives(
    P, q, l, grad_l, *, config: Optional[SolverConfig] = None
) -> Array:
    """dl of the transposed differentiated-KKT system against the cotangent
    grad_l (``solveDerivativesQP``, pybindings.cpp:24-30: zeros on the
    active set, P_ff^{-T} grad_l on the free set). Assemble grad_P = -dl l^T,
    grad_q = -dl exactly as the reference does (qcqp.py:45-52)."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    g = canon_like(grad_l, c, "grad_l", width=c.q.shape[-1])
    return c.restore(kkt.qp_vjp(c.P, c.q, l_, g, cfg))


class BoxQPDerivatives(NamedTuple):
    dl: Array         # (..., n)
    dgamma_lo: Array  # (..., n) zeros at inactive slots
    dgamma_hi: Array  # (..., n)
    gamma_lo: Array   # (..., n) the multipliers used in the system
    gamma_hi: Array   # (..., n)


def box_qp_derivatives(
    P, q, l_min, l_max, l, grad_l, *, config: Optional[SolverConfig] = None
) -> BoxQPDerivatives:
    """(dl, dgamma, gamma) of the box-QP KKT adjoint
    (``solveDerivativesBoxQP`` returns the packed blgamma plus gamma,
    pybindings.cpp:40-45; here unpacked per block, fixed shape)."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    g = canon_like(grad_l, c, "grad_l", width=n)
    r = kkt.box_vjp(c.P, c.q, lo, hi, l_, g, cfg)
    return BoxQPDerivatives(
        dl=c.restore(r.dl),
        dgamma_lo=c.restore(r.dgamma[:, :n]),
        dgamma_hi=c.restore(r.dgamma[:, n:]),
        gamma_lo=c.restore(r.gamma[:, :n]),
        gamma_hi=c.restore(r.gamma[:, n:]),
    )


class SignedBoxQPDerivatives(NamedTuple):
    dl: Array
    dgamma_lo: Array
    dgamma_hi: Array
    dgamma_sign: Array
    gamma_lo: Array
    gamma_hi: Array
    gamma_sign: Array


def signed_box_qp_derivatives(
    P, q, l_min, l_max, v, l, grad_l, *,
    config: Optional[SolverConfig] = None,
) -> SignedBoxQPDerivatives:
    """Signed-box KKT adjoint INCLUDING the sign-constraint block - the
    derivative the reference never implemented (its backward reuses the
    plain box routine, qcqp.py:111 "npt implemented")."""
    c, l_, cfg = _canon(P, q, l, QP_DEFAULTS, config)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    vv = canon_like(v, c, "v", width=n)
    g = canon_like(grad_l, c, "grad_l", width=n)
    r = kkt.signed_box_vjp(c.P, c.q, lo, hi, vv, l_, g, cfg)
    return SignedBoxQPDerivatives(
        dl=c.restore(r.dl),
        dgamma_lo=c.restore(r.dgamma[:, :n]),
        dgamma_hi=c.restore(r.dgamma[:, n : 2 * n]),
        dgamma_sign=c.restore(r.dgamma[:, 2 * n :]),
        gamma_lo=c.restore(r.gamma[:, :n]),
        gamma_hi=c.restore(r.gamma[:, n : 2 * n]),
        gamma_sign=c.restore(r.gamma[:, 2 * n :]),
    )


class QCQPDerivatives(NamedTuple):
    dl: Array      # (..., 2nc)
    dgamma: Array  # (..., nc) zeros at inactive contacts
    gamma: Array   # (..., nc)
    e1: Array      # (..., nc) diag(2 gamma l_n^2 mu): grad_mu = e1 * dgamma
    e2: Array      # (..., nc) diag(2 gamma l_n mu^2): grad_l_n = e2 * dgamma


def qcqp_derivatives(
    P, q, l_n, mu, l, grad_l, *, config: Optional[SolverConfig] = None
) -> QCQPDerivatives:
    """(dl, dgamma, gamma, E1, E2) of the QCQP KKT adjoint
    (``solveDerivativesQCQP`` returns (E1, E2, blgamma), pybindings.cpp:
    62-71; E1/E2 as vectors, Solver.cpp:683-691). The mu * l_n radius
    premultiply is applied internally as in the binding layer
    (pybindings.cpp:66)."""
    c, l_, cfg = _canon(P, q, l, QCQP_DEFAULTS, config)
    n = c.q.shape[-1]
    nc = n // 2
    ln = canon_like(l_n, c, "l_n", width=nc)
    m = canon_like(mu, c, "mu", width=nc)
    g = canon_like(grad_l, c, "grad_l", width=n)
    r = kkt.qcqp_vjp(c.P, c.q, ln * m, l_, g, cfg)
    e1, e2 = kkt.qcqp_radius_factors(ln, m, r.gamma)
    return QCQPDerivatives(
        dl=c.restore(r.dl),
        dgamma=c.restore(r.dgamma),
        gamma=c.restore(r.gamma),
        e1=c.restore(e1),
        e2=c.restore(e2),
    )
