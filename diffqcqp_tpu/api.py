"""Public differentiable solver API.

Mirrors the reference surface one-to-one (pybindings.cpp:74-83 and the
torch.autograd wrappers qcqp.py:22-181):

    solve_qp          ~ solveQP + QPFn2
    solve_box_qp      ~ solveBoxQP + BoxQPFn2
    solve_signed_box_qp ~ solveSignedBoxQP + SignedBoxQPFn2
    solve_qcqp        ~ solveQCQP + QCQPFn2 (radius premultiply mu * l_n
                        applied internally, pybindings.cpp:57)

Every function is batched-first, jit/vmap/shard_map-compatible, and wired
with ``jax.custom_vjp`` implementing the implicit differentiation of the KKT
conditions (diff/kkt.py), so the solvers drop into JAX autodiff exactly as the
reference's autograd.Functions drop into PyTorch. ``warm_start`` receives a
zero gradient (at convergence the solution does not depend on it).

Each ``*_with_stats`` variant additionally returns per-problem SolveStats
(iteration counts, final residuals, converged mask) - the signal the
reference never exposes (its callers cannot tell a converged solve from a
max_iter-capped one, Solver.cpp:121-122).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from .config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig
from .diff import kkt
from .kernels import admm_pallas
from .ops.equilibrate import isotropize, ruiz_diag, scale_problem
from .ops.prox import prox_box, prox_disk, prox_nonneg, prox_signed_box
from .solvers.admm import SolveStats, admm_solve
from .utils.shapes import canon_like, canon_problem

__all__ = [
    "solve_qp",
    "solve_box_qp",
    "solve_signed_box_qp",
    "solve_qcqp",
    "solve_qp_with_stats",
    "solve_box_qp_with_stats",
    "solve_signed_box_qp_with_stats",
    "solve_qcqp_with_stats",
    "which_backend",
    "SolveStats",
    "SolverConfig",
]


def _build_cfg(
    base: SolverConfig,
    config: Optional[SolverConfig],
    eps: Optional[float],
    mu_prox: Optional[float],
    max_iter: Optional[int],
    adaptive_rho: Optional[bool],
    axis_name: Optional[str],
) -> SolverConfig:
    cfg = config if config is not None else base
    over = {}
    if eps is not None:
        over["eps"] = eps
    if mu_prox is not None:
        over["mu_prox"] = mu_prox
    if max_iter is not None:
        over["max_iter"] = int(max_iter)
    if adaptive_rho is not None:
        over["adaptive_rho"] = adaptive_rho
    if axis_name is not None:
        over["axis_name"] = axis_name
    cfg = cfg.replace(**over) if over else cfg
    if cfg.accel and (cfg.adaptive_rho or cfg.alpha_relax != 1.0):
        # permitted (the DESIGN.md section 8 measurements run exactly this)
        # but measured-harmful: momentum stacked on adaptive rho / over-
        # relaxation blows mean iterations 17 -> 67 and tails 23 -> 400 on
        # the flagship distribution. Warn rather than raise so the
        # combination stays measurable.
        import warnings

        warnings.warn(
            "SolverConfig.accel combined with adaptive_rho=True or "
            "alpha_relax != 1.0 is measured-harmful (momentum and the "
            "adaptive schedule harvest the same slack; tails blow up - "
            "DESIGN.md section 8). Use accel only with "
            "alpha_relax=1.0, adaptive_rho=False.",
            stacklevel=3,
        )
    return cfg


def _grad_P(dl: Array, l: Array, P: Array) -> Array:
    """Symmetrised grad_P = -(dl l^T + l dl^T)/2.

    The reference returns the one-sided -dl l^T (qcqp.py:49); both give the
    same downstream gradients for any symmetric parametrisation of P, but
    only the symmetrised form is the exact VJP of our solver, which (like
    any eigendecomposition-based solve) sees only the symmetric part of P.
    The diagonal-P path stores only the diagonal -dl*l
    (qcqp_no_batch.py:44-47)."""
    if P.ndim == 2:
        return -dl * l
    # two broadcasts fused elementwise, NOT outer + swapaxes: transposing the
    # trailing dims of a (B, N, N) is real data movement on TPU and measured
    # ~10x the cost of the arithmetic here.
    return -0.5 * (
        dl[:, :, None] * l[:, None, :] + l[:, :, None] * dl[:, None, :]
    )


def _use_pallas(P, q, cfg: SolverConfig) -> bool:
    """Dispatch: the fused pallas kernel handles dense float32 problems on
    TPU up to N <= 112 automatically; everything else goes through the XLA
    engine. The bound is the kernel's VMEM ceiling, not compile time: with
    the factor scratch plus a single-buffered P slab (manual HBM->VMEM DMA
    above N=48, kernels/admm_pallas.py) the two resident (N, N, 128) f32
    planes hit the ~16 MiB budget at N ~ 112-120 (round 3's compile-time
    cliff - 213 s at N=64, ~16 min at N=96 - is gone: the ROLLED
    factorisation, SolverConfig.pallas_rolled, compiles N=96 in ~20-34 s
    and runs measured faster than the unrolled form everywhere tried;
    benchmarks/profile_rolled.py). Beyond 112 the XLA chol/Newton-Schulz
    engine takes over (measured crossover: the kernel still wins 1.3x AT
    112 - 22.8 vs 30.2 ms at B=4096 - so the remaining XLA-engine duties
    start where the kernel no longer fits). Use ``which_backend`` to
    inspect the decision. The pallas path always estimates L by power
    iteration (reference semantics) and is per-tile rather than globally
    synchronised, so it is not used when a cross-shard axis_name is set
    (the XLA engine's pmin handles that)."""
    if cfg.backend == "pallas":
        if cfg.accel:
            raise ValueError(
                "SolverConfig.accel is not supported by the pallas backend; "
                "use backend='xla' (or 'auto', which avoids the kernel)."
            )
        return True
    if cfg.backend != "auto":
        return False
    return (
        P.ndim == 3
        and P.shape[-1] <= 112
        and q.dtype == jnp.float32
        and cfg.axis_name is None
        and not cfg.accel
        and jax.default_backend() == "tpu"
    )


def which_backend(P, q, config: Optional[SolverConfig] = None) -> str:
    """Report which forward engine a solve with these inputs would use:
    'pallas' (the fused single-kernel TPU path) or 'xla' (the spectral
    shifted-solve engine).

    The auto dispatch is shape/dtype/backend dependent (see ``_use_pallas``);
    a dense N=120 float32 batch on TPU, for example, silently exceeds the
    kernel's N <= 112 VMEM-bound auto limit and falls back to the XLA
    chol/Newton-Schulz engine - this helper makes the cliff inspectable:

        >>> which_backend(P, q)          # 'pallas' or 'xla'
    """
    cfg = config if config is not None else QP_DEFAULTS
    c = canon_problem(P, q)
    return "pallas" if _use_pallas(c.P, c.q, cfg) else "xla"


# --------------------------------------------------------------------------
# Non-negative QP
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _qp(P, q, ws, cfg):
    d = None
    if cfg.equilibrate:
        # D > 0 preserves l >= 0; solve the rescaled problem, map back.
        d = ruiz_diag(P, cfg.ruiz_iters)
        P, q, ws = *scale_problem(P, q, d), ws / d
    if _use_pallas(P, q, cfg):
        l, stats = admm_pallas.admm_solve_pallas(
            P, q, ws, admm_pallas.PROX_NONNEG, (), cfg,
            tile_b=cfg.pallas_tile_b,
        )
    else:
        l, stats = admm_solve(P, q, ws, prox_nonneg, cfg)
    return (l * d if d is not None else l), stats


def _qp_fwd(P, q, ws, cfg):
    out = _qp(P, q, ws, cfg)
    l, _ = out
    return out, (P, q, l)


def _qp_bwd(cfg, res, ct):
    g, _ = ct
    P, q, l = res
    dl = kkt.qp_vjp(P, q, l, g, cfg)
    return _grad_P(dl, l, P), -dl, jnp.zeros_like(l)


_qp.defvjp(_qp_fwd, _qp_bwd)


# --------------------------------------------------------------------------
# Box QP
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _box_qp(P, q, l_min, l_max, ws, cfg):
    d = None
    if cfg.equilibrate:
        d = ruiz_diag(P, cfg.ruiz_iters)
        P, q, ws = *scale_problem(P, q, d), ws / d
        l_min, l_max = l_min / d, l_max / d
    if _use_pallas(P, q, cfg):
        l, stats = admm_pallas.admm_solve_pallas(
            P, q, ws, admm_pallas.PROX_BOX, (l_min, l_max), cfg,
            tile_b=cfg.pallas_tile_b,
        )
    else:
        prox = lambda x: prox_box(x, l_min, l_max)
        l, stats = admm_solve(P, q, ws, prox, cfg)
    return (l * d if d is not None else l), stats


def _box_qp_fwd(P, q, l_min, l_max, ws, cfg):
    out = _box_qp(P, q, l_min, l_max, ws, cfg)
    l, _ = out
    return out, (P, q, l_min, l_max, l)


def _box_qp_bwd(cfg, res, ct):
    g, _ = ct
    P, q, l_min, l_max, l = res
    r = kkt.box_vjp(P, q, l_min, l_max, l, g, cfg)
    n = l.shape[-1]
    g_lo = r.gamma[:, :n]
    g_hi = r.gamma[:, n:]
    d_lo = r.dgamma[:, :n]
    d_hi = r.dgamma[:, n:]
    return (
        _grad_P(r.dl, l, P),
        -r.dl,
        -g_lo * d_lo,
        g_hi * d_hi,
        jnp.zeros_like(l),
    )


_box_qp.defvjp(_box_qp_fwd, _box_qp_bwd)


# --------------------------------------------------------------------------
# Signed box QP
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _signed_box_qp(P, q, l_min, l_max, v, ws, cfg):
    v_sign = jnp.sign(v)
    d = None
    if cfg.equilibrate:
        # sign(v * l) is invariant under the positive rescaling.
        d = ruiz_diag(P, cfg.ruiz_iters)
        P, q, ws = *scale_problem(P, q, d), ws / d
        l_min, l_max = l_min / d, l_max / d
    if _use_pallas(P, q, cfg):
        l, stats = admm_pallas.admm_solve_pallas(
            P, q, ws, admm_pallas.PROX_SIGNED_BOX, (l_min, l_max, v_sign),
            cfg, tile_b=cfg.pallas_tile_b,
        )
    else:
        prox = lambda x: prox_signed_box(x, l_min, l_max, v_sign)
        l, stats = admm_solve(P, q, ws, prox, cfg)
    return (l * d if d is not None else l), stats


def _signed_box_qp_fwd(P, q, l_min, l_max, v, ws, cfg):
    out = _signed_box_qp(P, q, l_min, l_max, v, ws, cfg)
    l, _ = out
    return out, (P, q, l_min, l_max, v, l)


def _signed_box_qp_bwd(cfg, res, ct):
    g, _ = ct
    P, q, l_min, l_max, v, l = res
    r = kkt.signed_box_vjp(P, q, l_min, l_max, v, l, g, cfg)
    n = l.shape[-1]
    g_lo, g_hi = r.gamma[:, :n], r.gamma[:, n : 2 * n]
    d_lo, d_hi = r.dgamma[:, :n], r.dgamma[:, n : 2 * n]
    return (
        _grad_P(r.dl, l, P),
        -r.dl,
        -g_lo * d_lo,
        g_hi * d_hi,
        jnp.zeros_like(v),   # v enters only through sign(v): a.e. zero grad
        jnp.zeros_like(l),
    )


_signed_box_qp.defvjp(_signed_box_qp_fwd, _signed_box_qp_bwd)


# --------------------------------------------------------------------------
# Friction-cone QCQP
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _qcqp(P, q, l_n, mu, ws, cfg):
    radius = l_n * mu                       # pybindings.cpp:57
    d = None
    if cfg.equilibrate:
        # both coordinates of a contact must share one scale (isotropize)
        # or the disk constraint would become an ellipse.
        d = isotropize(ruiz_diag(P, cfg.ruiz_iters))
        P, q, ws = *scale_problem(P, q, d), ws / d
        radius = radius / d[:, ::2]
    if _use_pallas(P, q, cfg):
        l, stats = admm_pallas.admm_solve_pallas(
            P, q, ws, admm_pallas.PROX_DISK, (radius,), cfg,
            qcqp_stopping=True, damp_both=False, tile_b=cfg.pallas_tile_b,
        )
    else:
        prox = lambda x: prox_disk(x, radius)
        l, stats = admm_solve(
            P, q, ws, prox, cfg, qcqp_stopping=True, damp_both_taus=False
        )
    return (l * d if d is not None else l), stats


def _qcqp_fwd(P, q, l_n, mu, ws, cfg):
    out = _qcqp(P, q, l_n, mu, ws, cfg)
    l, _ = out
    return out, (P, q, l_n, mu, l)


def _qcqp_bwd(cfg, res, ct):
    g, _ = ct
    P, q, l_n, mu, l = res
    radius = l_n * mu
    r = kkt.qcqp_vjp(P, q, radius, l, g, cfg)
    e1, e2 = kkt.qcqp_radius_factors(l_n, mu, r.gamma)
    return (
        _grad_P(r.dl, l, P),
        -r.dl,
        e2 * r.dgamma,                      # grad_l_n (qcqp.py:178)
        e1 * r.dgamma,                      # grad_mu  (qcqp.py:180)
        jnp.zeros_like(l),
    )


_qcqp.defvjp(_qcqp_fwd, _qcqp_bwd)


# --------------------------------------------------------------------------
# Public wrappers
# --------------------------------------------------------------------------

def _stats_restore(stats: SolveStats, batched: bool) -> SolveStats:
    if batched:
        return stats
    return SolveStats(*(x[0] for x in stats))


def solve_qp(
    P,
    q,
    warm_start=None,
    *,
    eps: Optional[float] = None,
    mu_prox: Optional[float] = None,
    max_iter: Optional[int] = None,
    adaptive_rho: Optional[bool] = None,
    config: Optional[SolverConfig] = None,
    axis_name: Optional[str] = None,
) -> Array:
    """Solve min 1/2 l'Pl + q'l s.t. l >= 0, batched and differentiable.

    P: (B,N,N) dense | (B,N) diagonal | unbatched variants. Returns l in the
    layout of q. Differentiable in (P, q).
    """
    l, _ = solve_qp_with_stats(
        P, q, warm_start, eps=eps, mu_prox=mu_prox, max_iter=max_iter,
        adaptive_rho=adaptive_rho, config=config, axis_name=axis_name,
    )
    return l


def solve_qp_with_stats(
    P, q, warm_start=None, *, eps=None, mu_prox=None, max_iter=None,
    adaptive_rho=None, config=None, axis_name=None,
):
    cfg = _build_cfg(QP_DEFAULTS, config, eps, mu_prox, max_iter, adaptive_rho, axis_name)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    ws = (
        jnp.zeros_like(c.q)
        if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    l, stats = _qp(c.P, c.q, ws, cfg)
    return c.restore(l), _stats_restore(stats, c.batched)


def solve_box_qp(
    P, q, l_min, l_max, warm_start=None, *, eps=None, mu_prox=None,
    max_iter=None, adaptive_rho=None, config=None, axis_name=None,
) -> Array:
    """Solve min 1/2 l'Pl + q'l s.t. l_min <= l <= l_max.

    Differentiable in (P, q, l_min, l_max).
    """
    l, _ = solve_box_qp_with_stats(
        P, q, l_min, l_max, warm_start, eps=eps, mu_prox=mu_prox,
        max_iter=max_iter, adaptive_rho=adaptive_rho, config=config,
        axis_name=axis_name,
    )
    return l


def solve_box_qp_with_stats(
    P, q, l_min, l_max, warm_start=None, *, eps=None, mu_prox=None,
    max_iter=None, adaptive_rho=None, config=None, axis_name=None,
):
    cfg = _build_cfg(QP_DEFAULTS, config, eps, mu_prox, max_iter, adaptive_rho, axis_name)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    ws = (
        jnp.zeros_like(c.q)
        if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    l, stats = _box_qp(c.P, c.q, lo, hi, ws, cfg)
    return c.restore(l), _stats_restore(stats, c.batched)


def solve_signed_box_qp(
    P, q, l_min, l_max, v, warm_start=None, *, eps=None, mu_prox=None,
    max_iter=None, adaptive_rho=None, config=None, axis_name=None,
) -> Array:
    """Box QP with the additional sign constraint sign(v) * l <= 0.

    Differentiable in (P, q, l_min, l_max); v receives a zero gradient (it
    enters only through its sign).
    """
    l, _ = solve_signed_box_qp_with_stats(
        P, q, l_min, l_max, v, warm_start, eps=eps, mu_prox=mu_prox,
        max_iter=max_iter, adaptive_rho=adaptive_rho, config=config,
        axis_name=axis_name,
    )
    return l


def solve_signed_box_qp_with_stats(
    P, q, l_min, l_max, v, warm_start=None, *, eps=None, mu_prox=None,
    max_iter=None, adaptive_rho=None, config=None, axis_name=None,
):
    cfg = _build_cfg(QP_DEFAULTS, config, eps, mu_prox, max_iter, adaptive_rho, axis_name)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    lo = canon_like(l_min, c, "l_min", width=n)
    hi = canon_like(l_max, c, "l_max", width=n)
    vv = canon_like(v, c, "v", width=n)
    ws = (
        jnp.zeros_like(c.q)
        if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    l, stats = _signed_box_qp(c.P, c.q, lo, hi, vv, ws, cfg)
    return c.restore(l), _stats_restore(stats, c.batched)


def solve_qcqp(
    P, q, l_n, mu, warm_start=None, *, eps=None, mu_prox=None, max_iter=None,
    adaptive_rho=None, config=None, axis_name=None,
) -> Array:
    """Solve the friction-cone QCQP: min 1/2 l'Pl + q'l s.t.
    ||l_(i)||_2 <= mu_i * l_n_i per 2-D contact block i.

    l is 2*nc long; l_n, mu are nc long. Differentiable in (P, q, l_n, mu).
    """
    l, _ = solve_qcqp_with_stats(
        P, q, l_n, mu, warm_start, eps=eps, mu_prox=mu_prox,
        max_iter=max_iter, adaptive_rho=adaptive_rho, config=config,
        axis_name=axis_name,
    )
    return l


def solve_qcqp_with_stats(
    P, q, l_n, mu, warm_start=None, *, eps=None, mu_prox=None, max_iter=None,
    adaptive_rho=None, config=None, axis_name=None,
):
    cfg = _build_cfg(QCQP_DEFAULTS, config, eps, mu_prox, max_iter, adaptive_rho, axis_name)
    c = canon_problem(P, q)
    n = c.q.shape[-1]
    ln = canon_like(l_n, c, "l_n", width=n // 2)
    m = canon_like(mu, c, "mu", width=n // 2)
    ws = (
        jnp.zeros_like(c.q)
        if warm_start is None
        else canon_like(warm_start, c, "warm_start", width=n)
    )
    l, stats = _qcqp(c.P, c.q, ln, m, ws, cfg)
    return c.restore(l), _stats_restore(stats, c.batched)
