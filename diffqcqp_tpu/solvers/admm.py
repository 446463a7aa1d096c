"""One generic batched proximal over-relaxed adaptive-rho ADMM engine.

The reference implements the same algorithm four times (solveQP
Solver.cpp:61-123, solveBoxQP :198-261, solveSignedBoxQP :374-439, solveQCQP
:521-582), differing only in the projection and the stopping rule. Here there
is ONE engine, parameterised by a prox callable and a stopping-rule flag,
operating on a whole batch of independent problems at once:

  * the batch is the vector axis - every step is a batched matvec or an
    element-wise op over (B, N) arrays;
  * each problem carries its own (rho, tau, counters) and converges on its own
    iteration; converged problems are frozen by masking while the
    ``lax.while_loop`` keeps running until every problem (on every shard, via
    an optional ``lax.pmax``) is done or ``max_iter`` is reached;
  * the linear solve has two modes (SolverConfig.linsolve): the SPECTRAL
    handle (ops/linalg.py) for which every adaptive-rho shift change is free
    (one eigh up front), and the batched-CHOLESKY explicit inverse for large
    dense N where that eigh setup is the dominant cost - there each
    iteration is one matvec against the carried inverse, refactored only on
    rho-change iterations (gated to shared iterations by rho_sync).

Per-iteration recipe (matching Solver.cpp:79-121; note that in the reference
``l_2_pred`` always equals the previous ``l_2`` at the top of an iteration, so
steps (3) and (4) share one relaxation vector r):

    l      = (P + (rho+mu_prox) I)^{-1} (rho*l2 - u - q_prox)     (1)
    q_prox = q - mu_prox * l                                       (2)
    r      = alpha*l + (1-alpha)*l2
    l2'    = prox(r + u/rho)                                       (3)
    u     += rho * (r - l2')                                       (4)
    res_dual = rho * ||l2' - l2||_inf                              (5)
    res_prim = ||l2' - r||_inf
    stop: res_dual < eps                    (QP family, :88)
          res_prim < eps + eps_rel*||l||_2 and res_dual < eps (QCQP, :548)
    adaptive rho per problem                (:91-120)

Known divergence from the reference (documented, intentional): the reference
accepts a warm_start but overwrites it in the first loop statement before any
use (Solver.cpp:70 vs :80) - warm starting is dead code there. Here
``warm_start`` initialises the constraint iterate l2 (and is therefore a real
warm start); passing zeros reproduces the reference trajectory exactly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..config import SolverConfig
from ..ops.linalg import (
    Factorization,
    chol_inverse_shifted,
    factorize,
    linf_norm,
    ns_inverse_shifted,
    power_iteration,
    solve_shifted,
)


class ADMMState(NamedTuple):
    it: Array            # scalar int32, global iteration counter
    l: Array             # (B, N) primal iterate
    l2: Array            # (B, N) constraint-satisfying iterate (the output)
    u: Array             # (B, N) scaled dual iterate
    q_prox: Array        # (B, N) proximal recentred linear term
    rho: Array           # (B,)
    tau_inc: Array       # (B,)
    tau_dec: Array       # (B,)
    rho_up: Array        # (B,) int32: last rho direction (+1/-1/0)
    cpt: Array           # (B,) int32: trigger counter (Solver.cpp:93 cpt%5)
    converged: Array     # (B,) bool
    stalled: Array       # (B,) bool (see SolveStats.stalled)
    iters: Array         # (B,) int32: per-problem iterations actually run
    res_prim: Array      # (B,) last primal residual
    res_dual: Array      # (B,) last dual residual
    rho_res: Array       # (B,) the rho the recorded residuals were computed
                         # WITH (frozen with them). NOT always the final
                         # penalty: a max_iter-capped problem whose last
                         # iteration fires a rho update leaves `rho` already
                         # multiplied by tau (measured up to 16x) while the
                         # residuals predate the update.
    all_done: Array      # scalar bool (globally reduced when sharded)
    fact_inv: Array      # (B, N, N) inverse of P+(rho+mu)I (linsolve='chol'
                         # mode, refactored on rho-change iterations);
                         # scalar 0.0 dummy in the spectral/diagonal modes
    l2_plain: Array      # (B, N) un-extrapolated l2 (cfg.accel mode: the
                         # carried s.l2/s.u are the EXTRAPOLATED points the
                         # next iteration starts from; the plain iterates are
                         # the solution candidates). None when accel is off -
                         # None is an EMPTY pytree, so the default path's
                         # while_loop carry is unchanged by the feature.
    u_plain: Array       # (B, N) un-extrapolated dual (cfg.accel mode)
    acc_a: Array         # (B,) Nesterov a_k (cfg.accel mode)
    acc_c: Array         # (B,) previous combined residual c_{k-1} for the
                         # per-problem restart test (cfg.accel mode)


class SolveStats(NamedTuple):
    """Per-problem solve diagnostics (the converged-vs-capped signal the
    reference never returns - SURVEY.md section 7 bug list item 7)."""

    iterations: Array    # (B,) int32
    res_prim: Array      # (B,)
    res_dual: Array      # (B,)
    rho: Array           # (B,) the penalty the recorded residuals were
                         # computed with (NOT the post-final-update value,
                         # which can differ by tau on a capped solve whose
                         # last iteration fires an update) - with res_prim it
                         # makes the returned iterate's stationarity bound
                         # computable (verify.stationarity_bound): the ADMM
                         # optimality identity gives ||Pl2+q+J'g||_inf <=
                         # (||P||/a)(rp + |1-a| rd/rho) + (1-1/a) rho rp
                         # + rd/a + O(mu_prox).
    converged: Array     # (B,) bool
    stalled: Array       # (B,) bool: converged only via the machine-precision
                         # stall test (cfg.stall_tol), NOT eps-certified - the
                         # iterate hit the working dtype's noise floor above
                         # the requested eps. Always False when converged via
                         # res_dual < eps or when stall_tol == 0.


def _use_chol(P: Array, cfg: SolverConfig) -> bool:
    """linsolve dispatch: the explicit-inverse batched-Cholesky mode for
    dense P. 'auto' picks it above the pallas kernel's N <= 48 auto bound,
    where the spectral engine's one-off eigh setup (196 ms at B=4096 N=24,
    growing steeply with N) dominates whole solves. Below that, on the XLA
    engine's remaining duties (CPU/f64/sharded-lockstep), eigh amortises
    and every rho update staying factorisation-free wins."""
    if P.ndim != 3:
        return False
    if cfg.linsolve == "chol":
        return True
    return cfg.linsolve == "auto" and P.shape[-1] > 48


def _make_inverse_fn(P: Array, dtype):
    """shift (B,) -> inv(P + shift*I) for the chol engine mode.

    float32: Newton-Schulz with the rigorous row-sum-bound init (pure MXU
    matmuls - measured ~20x XLA's column-serial batched Cholesky at
    (2048, 96)). float64: batched Cholesky (NS would need ~35 steps for
    1e-16 and the f64 engine's duties are CPU tests / oracles where
    cholesky is fine)."""
    if dtype == jnp.float32:
        return lambda shift: ns_inverse_shifted(P, shift)
    return lambda shift: chol_inverse_shifted(P, shift)


def _initial_state(
    fact: Factorization | None,
    P: Array,
    q: Array,
    warm_start: Array,
    cfg: SolverConfig,
    inv_fn=None,
    lmax: Array | None = None,
) -> ADMMState:
    B, _ = q.shape
    dtype = q.dtype
    use_chol = fact is None
    if lmax is not None:
        L = lmax
    elif use_chol or cfg.lmax_method == "power":
        # chol mode has no spectral factorisation to read lmax from
        L = power_iteration(P, cfg.power_iters)
    else:
        L = fact.lmax
    L = jnp.maximum(L, jnp.asarray(cfg.mu_prox, dtype))  # guard degenerate P=0
    ratio = L / cfg.mu_prox
    rho = jnp.sqrt(cfg.mu_prox * L) * ratio**0.4 * cfg.rho0_scale  # Solver.cpp:72
    tau = ratio**0.15                                      # Solver.cpp:73
    zeros = jnp.zeros_like(q)
    if cfg.warm_start_dual:
        # u* = -(P l* + q) at any fixed point (see SolverConfig): derive the
        # dual warm start from the primal one instead of threading state.
        ws_c = warm_start.astype(dtype)
        if P.ndim == 2:
            u0 = -(P * ws_c + q)
        else:
            u0 = -(jnp.sum(P * ws_c[:, None, :], axis=-1) + q)
    else:
        u0 = zeros
    fact_inv = (
        inv_fn(rho.astype(dtype) + jnp.asarray(cfg.mu_prox, dtype))
        if use_chol
        else jnp.zeros((), dtype)
    )
    return ADMMState(
        fact_inv=fact_inv,
        it=jnp.zeros((), jnp.int32),
        l=zeros,
        l2=warm_start.astype(dtype),
        u=u0,
        q_prox=q,
        rho=rho.astype(dtype),
        tau_inc=tau.astype(dtype),
        tau_dec=tau.astype(dtype),
        rho_up=jnp.zeros((B,), jnp.int32),
        cpt=jnp.zeros((B,), jnp.int32),
        converged=jnp.zeros((B,), bool),
        stalled=jnp.zeros((B,), bool),
        iters=jnp.zeros((B,), jnp.int32),
        res_prim=jnp.full((B,), jnp.inf, dtype),
        res_dual=jnp.full((B,), jnp.inf, dtype),
        rho_res=rho.astype(dtype),
        all_done=jnp.zeros((), bool),
        l2_plain=warm_start.astype(dtype) if cfg.accel else None,
        u_plain=u0 if cfg.accel else None,
        acc_a=jnp.ones((B,), dtype) if cfg.accel else None,
        acc_c=jnp.full((B,), jnp.inf, dtype) if cfg.accel else None,
    )


def admm_solve(
    P: Array,
    q: Array,
    warm_start: Array,
    prox: Callable[[Array], Array],
    cfg: SolverConfig,
    qcqp_stopping: bool = False,
    damp_both_taus: bool = True,
) -> tuple[Array, SolveStats]:
    """Run the batched ADMM to convergence.

    Args:
      P: (B, N, N) dense SPD or (B, N) diagonal quadratic term.
      q: (B, N) linear term.
      warm_start: (B, N) initial l2 iterate (zeros == reference trajectory).
      prox: projection onto the constraint set, applied over (B, N).
      cfg: static solver configuration.
      qcqp_stopping: use the QCQP combined primal+dual rule (Solver.cpp:548)
        instead of the QP family's dual-only rule (Solver.cpp:88).
      damp_both_taus: the QP-family adaptive-rho damps both tau_inc and
        tau_dec on a direction flip (Solver.cpp:95-96, :108-110); the QCQP
        variant damps only the tau of the fired branch (Solver.cpp:554-556,
        :568-570).

    Returns:
      (l2, SolveStats) with l2 the per-problem solution (B, N).
    """
    cond, body, state0 = make_admm_step(
        P, q, warm_start, prox, cfg, qcqp_stopping, damp_both_taus
    )
    final = jax.lax.while_loop(cond, body, state0)
    stats = SolveStats(
        iterations=final.iters,
        res_prim=final.res_prim,
        res_dual=final.res_dual,
        rho=final.rho_res,
        converged=final.converged,
        stalled=final.stalled,
    )
    # accel mode: the carried l2 is the EXTRAPOLATED restart point; the
    # solution is the plain iterate (identical for converged problems,
    # momentum-free for max_iter-capped ones).
    return (final.l2_plain if cfg.accel else final.l2), stats


def make_admm_step(
    P: Array,
    q: Array,
    warm_start: Array,
    prox: Callable[[Array], Array],
    cfg: SolverConfig,
    qcqp_stopping: bool = False,
    damp_both_taus: bool = True,
) -> tuple[Callable, Callable, ADMMState]:
    """(cond, body, initial_state) of the ADMM loop, for callers that want
    to drive the iteration themselves: ``admm_solve`` runs it under
    ``lax.while_loop``; the debug tracer (debug.py) runs the SAME body
    under ``lax.scan`` to record per-iteration residual/rho histories
    (identical trajectories by construction)."""
    use_chol = _use_chol(P, cfg)
    fact = None if use_chol else factorize(P)
    if use_chol:
        lmax_est = jnp.maximum(
            power_iteration(P, cfg.power_iters),
            jnp.asarray(cfg.mu_prox, q.dtype),
        )
        inv_fn = _make_inverse_fn(P, q.dtype)
    else:
        lmax_est, inv_fn = None, None
    state0 = _initial_state(
        fact, P, q, warm_start, cfg, inv_fn=inv_fn, lmax=lmax_est
    )
    dtype = q.dtype
    eps = jnp.asarray(cfg.eps, dtype)
    mu_prox = jnp.asarray(cfg.mu_prox, dtype)
    alpha = jnp.asarray(cfg.alpha_relax, dtype)
    damp = jnp.asarray(cfg.tau_damping, dtype)

    def cond(s: ADMMState) -> Array:
        return (s.it < cfg.max_iter) & ~s.all_done

    def body(s: ADMMState) -> ADMMState:
        active = ~s.converged
        rho_c = s.rho[:, None]

        # named scopes annotate the HLO so jax.profiler traces attribute time
        # to solver phases (the tracing layer the reference lacks, SURVEY 5).
        with jax.named_scope("admm_linear_solve"):
            rhs = rho_c * s.l2 - s.u - s.q_prox
            if use_chol:
                # einsum (MXU dot_general): at the chol mode's N > 48 the
                # measured order flips vs small N - (2048, 96) batched
                # matvec is 0.01 ms on the MXU vs 0.09 ms as a VPU
                # multiply+reduce (the N=24 10-50x padding penalty in
                # CLAUDE.md does not apply at MXU-sized N).
                l = jnp.einsum("bij,bj->bi", s.fact_inv, rhs,
                               precision=jax.lax.Precision.HIGHEST)
            else:
                l = solve_shifted(fact, rhs, s.rho + mu_prox)
        with jax.named_scope("admm_prox_dual"):
            q_prox = q - mu_prox * l
            r = alpha * l + (1.0 - alpha) * s.l2
            l2 = prox(r + s.u / rho_c)
            u = s.u + rho_c * (r - l2)
        delta = linf_norm(l2 - s.l2)
        res_dual = s.rho * delta
        res_prim = linf_norm(l2 - r)

        eps_ok = res_dual < eps
        if cfg.stall_tol > 0.0:
            # machine-precision stall: the iterate cannot move below the
            # working dtype's fixed-point noise floor (see SolverConfig).
            floor = cfg.stall_tol * jnp.finfo(dtype).eps
            noise = floor * jnp.maximum(1.0, linf_norm(l2))
            dual_ok = eps_ok | (delta <= noise)
        else:
            dual_ok = eps_ok
        if qcqp_stopping or cfg.primal_check:
            # QCQP rule (Solver.cpp:548); with cfg.primal_check also applied
            # to the QP family - the reference's dual-only rule (:88) has a
            # false-convergence mode at box corners (see SolverConfig).
            prim_eps = res_prim < eps + cfg.eps_rel * jnp.linalg.norm(l, axis=-1)
            if cfg.stall_tol > 0.0:
                # primal-side noise floor, same scale as the dual one (the
                # kernel mirrors this; see admm_pallas.py for the argument
                # why the corner-parking mode cannot slip through it).
                prim_ok = prim_eps | (res_prim <= noise)
            else:
                prim_ok = prim_eps
            newly = prim_ok & dual_ok
            certified = eps_ok & prim_eps
        else:
            newly = dual_ok
            certified = eps_ok

        # --- adaptive rho (Solver.cpp:91-120), only for problems that are
        # still active and did not just converge (the reference breaks before
        # the update on convergence).
        adapt = active & ~newly
        if cfg.adaptive_rho:
            inc = adapt & (res_prim > cfg.mu_thresh * res_dual)
            dec = adapt & ~inc & (res_dual > cfg.mu_thresh * res_prim)
            fire = inc | dec
            if cfg.rho_sync:
                # batch-synchronous throttle (cfg.rho_sync): same limit point,
                # and on TPU all refactorisations share an iteration. it=0 is
                # excluded - rho0 was applied that very iteration, and on the
                # fused kernel every rho change is a tile-wide refactorisation
                # (~3 iterations' cost at the flagship shape).
                apply = fire & (s.it % cfg.rho_update_period == 0) & (s.it > 0)
            else:
                apply = fire & (s.cpt % cfg.rho_update_period == 0)
            app_inc = apply & inc
            app_dec = apply & dec
            flip_inc = app_inc & (s.rho_up == -1)
            flip_dec = app_dec & (s.rho_up == 1)
            if damp_both_taus:
                damp_mask = flip_inc | flip_dec
                tau_inc = jnp.where(damp_mask, 1.0 + damp * (s.tau_inc - 1.0), s.tau_inc)
                tau_dec = jnp.where(damp_mask, 1.0 + damp * (s.tau_dec - 1.0), s.tau_dec)
            else:
                tau_inc = jnp.where(flip_inc, 1.0 + damp * (s.tau_inc - 1.0), s.tau_inc)
                tau_dec = jnp.where(flip_dec, 1.0 + damp * (s.tau_dec - 1.0), s.tau_dec)
            rho = jnp.where(app_inc, s.rho * tau_inc, jnp.where(app_dec, s.rho / tau_dec, s.rho))
            rho_up = jnp.where(app_inc, 1, jnp.where(app_dec, -1, s.rho_up))
            cpt = jnp.where(fire, s.cpt + 1, s.cpt)
            if use_chol:
                # refactor only when some problem's rho changed (with
                # rho_sync these land on shared iterations, ~2-3 per
                # solve); problems with unchanged rho recompute the
                # identical inverse - pure function of (P, rho) - so the
                # batch-wide recompute is sound (same argument as the
                # pallas kernel's tile-wide refactor).
                fact_inv = jax.lax.cond(
                    jnp.any(app_inc | app_dec),
                    lambda: inv_fn(rho + mu_prox),
                    lambda: s.fact_inv,
                )
            else:
                fact_inv = s.fact_inv
        else:
            tau_inc, tau_dec, rho, rho_up, cpt = s.tau_inc, s.tau_dec, s.rho, s.rho_up, s.cpt
            fact_inv = s.fact_inv

        # --- freeze converged problems
        m = active[:, None]
        if cfg.accel:
            # fast-ADMM momentum with per-problem adaptive restart
            # (SolverConfig.accel): the carried (l2, u) become the
            # EXTRAPOLATED point the next iteration starts from; l2_plain/
            # u_plain keep the solution candidates. Restart (Goldstein et
            # al. 2014 eq. 31-like): the combined residual
            # c = rho(||l2'-r||^2 + ||l2'-l2_hat||^2) must shrink by
            # accel_eta per iteration, else momentum resets for that
            # problem (a=1, beta=0, c relaxed by 1/eta).
            c_new = s.rho * (
                jnp.sum((l2 - r) ** 2, axis=-1)
                + jnp.sum((l2 - s.l2) ** 2, axis=-1)
            )
            restart = c_new > cfg.accel_eta * s.acc_c
            a_new = jnp.where(
                restart, 1.0, 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * s.acc_a**2))
            )
            # newly-converged problems freeze at the PLAIN iterate
            beta = jnp.where(
                restart | newly, 0.0, (s.acc_a - 1.0) / a_new
            )[:, None]
            l2_c = l2 + beta * (l2 - s.l2_plain)
            u_c = u + beta * (u - s.u_plain)
            acc_a = jnp.where(active, a_new, s.acc_a)
            acc_c = jnp.where(
                active,
                jnp.where(restart, s.acc_c / cfg.accel_eta, c_new),
                s.acc_c,
            )
            l2_plain = jnp.where(m, l2, s.l2_plain)
            u_plain = jnp.where(m, u, s.u_plain)
        else:
            l2_c, u_c = l2, u
            acc_a, acc_c = s.acc_a, s.acc_c
            l2_plain, u_plain = s.l2_plain, s.u_plain
        l = jnp.where(m, l, s.l)
        l2 = jnp.where(m, l2_c, s.l2)
        u = jnp.where(m, u_c, s.u)
        q_prox = jnp.where(m, q_prox, s.q_prox)
        res_prim = jnp.where(active, res_prim, s.res_prim)
        res_dual = jnp.where(active, res_dual, s.res_dual)
        # the rho these residuals were computed with (res_dual = s.rho *
        # delta above) - frozen with them, BEFORE this iteration's update
        rho_res = jnp.where(active, s.rho, s.rho_res)
        converged = s.converged | (active & newly)
        # eps-certified vs noise-floor stall (SolveStats.stalled): certified
        # means BOTH residual tests passed at eps proper, not via a floor
        stalled = s.stalled | (active & newly & ~certified)
        iters = s.iters + active.astype(jnp.int32)

        local_done = jnp.all(converged)
        if cfg.axis_name is not None:
            all_done = jax.lax.pmin(
                local_done.astype(jnp.int32), axis_name=cfg.axis_name
            ).astype(bool)
        else:
            all_done = local_done

        return ADMMState(
            it=s.it + 1,
            l=l, l2=l2, u=u, q_prox=q_prox,
            rho=rho, tau_inc=tau_inc, tau_dec=tau_dec,
            rho_up=rho_up, cpt=cpt,
            converged=converged, stalled=stalled, iters=iters,
            res_prim=res_prim, res_dual=res_dual, rho_res=rho_res,
            all_done=all_done,
            fact_inv=fact_inv,
            l2_plain=l2_plain, u_plain=u_plain, acc_a=acc_a, acc_c=acc_c,
        )

    return cond, body, state0
