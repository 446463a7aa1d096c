"""Batch-level retry: re-solve with warm starts until everything converges.

The reference cannot even distinguish a converged solve from an
iteration-capped one (Solver.cpp:121-122); here SolveStats carries the
per-problem signal, which makes the recovery policy SURVEY.md section 5
calls "trivially expressible" actually expressible: warm-start another
batched solve from the previous iterate with a larger budget, keep the
already-converged results frozen, repeat.

This runs a STATIC number of rounds (Python loop, each round one jitted
batched solve), so it composes with jit/grad; converged problems cost one
first iteration per extra round (they re-enter the solver but freeze at
their fixed point immediately - prox of a fixed point is itself, so the
iterate does not move and the dual residual is 0 on round entry).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..config import SolverConfig
from ..solvers.admm import SolveStats


def solve_resumed(
    solve_with_stats: Callable,
    *args,
    config: SolverConfig,
    rounds: int = 3,
    growth: int = 4,
    warm_start=None,
    **kwargs,
):
    """Run ``solve_with_stats(*args, warm_start, config=...)`` up to
    ``rounds`` times, multiplying max_iter by ``growth`` each round and
    warm-starting from the previous solution. Returns (l, SolveStats) with
    per-problem totals (iterations summed across the rounds each problem
    actually ran).

    Works with any of the solve_*_with_stats functions:

        l, st = solve_resumed(solve_qcqp_with_stats, P, q, l_n, mu,
                              config=cfg, rounds=3)
    """
    l, stats = solve_with_stats(*args, warm_start, config=config, **kwargs)
    total_iters = stats.iterations
    max_iter = config.max_iter
    for _ in range(rounds - 1):
        max_iter *= growth
        cfg = config.replace(max_iter=int(max_iter))
        l_new, st = solve_with_stats(*args, l, config=cfg, **kwargs)
        unconv = ~stats.converged
        mask = unconv[:, None] if l.ndim == 2 else unconv
        l = jnp.where(mask, l_new, l)
        total_iters = total_iters + jnp.where(unconv, st.iterations, 0)
        stats = SolveStats(
            iterations=total_iters,
            res_prim=jnp.where(unconv, st.res_prim, stats.res_prim),
            res_dual=jnp.where(unconv, st.res_dual, stats.res_dual),
            rho=jnp.where(unconv, st.rho, stats.rho),
            converged=stats.converged | st.converged,
            stalled=jnp.where(unconv, st.stalled, stats.stalled),
        )
    return l, stats
