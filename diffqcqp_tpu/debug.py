"""Per-iteration solve traces: the observability layer the reference only
had as commented-out printouts.

The reference's dev harness printed residuals inside the loop
(/root/reference/qcqplib/Solver.cpp, commented std::couts); SURVEY.md
section 5 promises the TPU-native equivalent as an aux-output pytree.
``trace_*`` run the IDENTICAL engine body as the production solvers (the
``make_admm_step`` closure shared with ``admm_solve``) under a fixed-length
``lax.scan``, recording per-iteration histories:

    tr = trace_qp(P, q, iters=60)
    tr.res_dual      # (iters, B) dual-residual trajectory
    tr.res_prim      # (iters, B)
    tr.rho           # (iters, B) penalty iteration k ran with
    tr.active        # (iters, B) bool: problem still iterating
    tr.l2            # (B, N) final iterate (== admm_solve's at that count)

This is a diagnostic tool (convergence-stall forensics, rho-schedule
tuning, plotting): it always runs exactly ``iters`` steps of the XLA
engine - converged problems freeze exactly as in production - and records
O(iters * B) history, so use moderate batch sizes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from .config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig
from .ops.equilibrate import isotropize, ruiz_diag, scale_problem
from .ops.prox import prox_box, prox_disk, prox_nonneg, prox_signed_box
from .solvers.admm import make_admm_step
from .utils.shapes import canon_like, canon_problem


class SolveTrace(NamedTuple):
    res_prim: Array      # (iters, B) residuals AFTER iteration k
    res_dual: Array      # (iters, B)
    rho: Array           # (iters, B) penalty iteration k RAN WITH (produces
                         # res_dual[k] = rho[k] * ||l2[k] - l2[k-1]||_inf)
    active: Array        # (iters, B) bool: still iterating at this step
    l2: Array            # (B, N) final iterate after `iters` steps (in
                         # cfg.accel mode: the PLAIN iterate, matching
                         # admm_solve's return, not the momentum-
                         # extrapolated restart point the engine carries)
    converged: Array     # (B,) bool at the end of the trace
    iterations: Array    # (B,) int32 per-problem iterations actually run


def _trace(P, q, ws, prox, cfg, iters, qcqp_stopping=False, damp_both=True):
    _, body, state0 = make_admm_step(
        P, q, ws, prox, cfg, qcqp_stopping, damp_both
    )

    def step(s, _):
        rec = (s.res_prim, s.res_dual, s.rho, ~s.converged)
        return body(s), rec

    final, (rp, rd, rho, act) = jax.lax.scan(
        step, state0, None, length=iters
    )
    # cfg.accel carries the momentum-EXTRAPOLATED (l2, u) as the restart
    # point; the solution candidate is the plain iterate - return that, as
    # admm_solve does, so the documented "l2 == admm_solve's at that count"
    # invariant holds in accel mode too.
    l2_final = final.l2_plain if cfg.accel else final.l2
    # the recorded quantities are the state BEFORE each body call; residuals
    # are shifted so row k holds the residuals AFTER iteration k. rho and
    # active stay PRE-step: rho[k] is the penalty iteration k ran with (the
    # engine computes res_dual[k] = rho[k] * ||delta l2||, so rho[k] and
    # res_*[k] are the aligned pair for rho-schedule tuning), and active[k]
    # is "was the problem still iterating when step k ran".
    return SolveTrace(
        res_prim=jnp.concatenate([rp[1:], final.res_prim[None]], axis=0),
        res_dual=jnp.concatenate([rd[1:], final.res_dual[None]], axis=0),
        rho=rho,
        active=act,
        l2=l2_final,
        converged=final.converged,
        iterations=final.iters,
    )


def trace_qp(
    P, q, warm_start=None, *, iters: int = 100,
    config: Optional[SolverConfig] = None,
) -> SolveTrace:
    """Trace a non-negative QP solve for exactly ``iters`` engine steps."""
    cfg = (config or QP_DEFAULTS).replace(max_iter=iters)
    c = canon_problem(P, q)
    P_, q_ = c.P, c.q
    ws = (
        jnp.zeros_like(q_) if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=q_.shape[-1])
    )
    d = None
    if cfg.equilibrate:
        # same preprocessing as api._qp: the trace must describe the solve
        # production actually runs (residuals/rho are on the EQUILIBRATED
        # problem, like the production stopping test; l2 is mapped back).
        d = ruiz_diag(P_, cfg.ruiz_iters)
        P_, q_ = scale_problem(P_, q_, d)
        ws = ws / d
    tr = _trace(P_, q_, ws, prox_nonneg, cfg, iters)
    return tr._replace(l2=tr.l2 * d) if d is not None else tr


def trace_box_qp(
    P, q, l_min, l_max, warm_start=None, *, iters: int = 100,
    config: Optional[SolverConfig] = None,
) -> SolveTrace:
    cfg = (config or QP_DEFAULTS).replace(max_iter=iters)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    P_, q_ = c.P, c.q
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    ws = (
        jnp.zeros_like(q_) if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    d = None
    if cfg.equilibrate:
        d = ruiz_diag(P_, cfg.ruiz_iters)
        P_, q_ = scale_problem(P_, q_, d)
        ws, lo, hi = ws / d, lo / d, hi / d
    tr = _trace(P_, q_, ws, lambda x: prox_box(x, lo, hi), cfg, iters)
    return tr._replace(l2=tr.l2 * d) if d is not None else tr


def trace_signed_box_qp(
    P, q, l_min, l_max, v, warm_start=None, *, iters: int = 100,
    config: Optional[SolverConfig] = None,
) -> SolveTrace:
    cfg = (config or QP_DEFAULTS).replace(max_iter=iters)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    P_, q_ = c.P, c.q
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    vs = jnp.sign(canon_like(v, c, "v", width=n))
    ws = (
        jnp.zeros_like(q_) if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    d = None
    if cfg.equilibrate:
        # sign(v * l) is invariant under the positive rescaling (api.py)
        d = ruiz_diag(P_, cfg.ruiz_iters)
        P_, q_ = scale_problem(P_, q_, d)
        ws, lo, hi = ws / d, lo / d, hi / d
    tr = _trace(
        P_, q_, ws, lambda x: prox_signed_box(x, lo, hi, vs), cfg, iters
    )
    return tr._replace(l2=tr.l2 * d) if d is not None else tr


def trace_qcqp(
    P, q, l_n, mu, warm_start=None, *, iters: int = 100,
    config: Optional[SolverConfig] = None,
) -> SolveTrace:
    """Trace a friction-cone QCQP solve (reference rho semantics:
    damp_both_taus=False, combined stopping rule)."""
    cfg = (config or QCQP_DEFAULTS).replace(max_iter=iters)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    P_, q_ = c.P, c.q
    radius = canon_like(l_n, c, "l_n", width=n // 2) * canon_like(
        mu, c, "mu", width=n // 2
    )
    ws = (
        jnp.zeros_like(q_) if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    d = None
    if cfg.equilibrate:
        # per-contact isotropic scale, as api._qcqp (disk stays a disk)
        d = isotropize(ruiz_diag(P_, cfg.ruiz_iters))
        P_, q_ = scale_problem(P_, q_, d)
        ws = ws / d
        radius = radius / d[:, ::2]
    tr = _trace(
        P_, q_, ws, lambda x: prox_disk(x, radius), cfg, iters,
        qcqp_stopping=True, damp_both=False,
    )
    return tr._replace(l2=tr.l2 * d) if d is not None else tr
