"""Compaction autotuning from measured solve statistics.

The two-phase straggler compaction (SolverConfig.compact_iters,
kernels/admm_pallas.py) needs a phase-boundary K "just past the easy mass"
of the iteration distribution - a distribution property no pre-solve
predictor can estimate (measured corr <= 0.11, DESIGN.md section 8), but
one that a SINGLE representative solve's ``SolveStats.iterations`` reveals
exactly. ``tune_compact_iters`` turns that into a K (or a decline) using
the kernel's measured economics, so production callers tune nothing:

    _, stats = solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)   # once
    K = tune_compact_iters(stats.iterations, n=P.shape[-1],
                            tile_b=cfg.pallas_tile_b)
    cfg = cfg.replace(compact_iters=K)          # 0 = leave compaction off

Cost model (all in units of one TILE-iteration; measured at the flagship
shape: whole-batch iteration ~30 us at 8 tiles, phase boundary ~230 us ~
``boundary_iters=8`` whole-batch iterations - DESIGN.md section 8):

    single-phase:   sum over natural-order tiles of tile-max iterations
    two-phase at K: sum_t min(tile_max_t, K)                (phase 1)
                    + boundary_iters * n_tiles              (argsort, P
                      re-pack, state permute, second launch)
                    + sum over COMPACTED survivor tiles of their max
                      remaining iterations                  (phase 2)

K is searched over the distinct iteration counts; the best K is returned
only if its modeled saving clears ``min_saving_frac`` of the single-phase
cost (protects against noise-level "wins" that the ±40% chip drift would
erase). The in-graph ``compact_iters='auto'`` mode is the no-calibration
alternative (fixed K1, runtime survivor decision) - measured weaker on
long tails (retains ~half of the tuned gain) but zero-setup; this
calibrator retains the tuned gain by construction because it reproduces
the tuned K from the same evidence.
"""

from __future__ import annotations

import numpy as np

__all__ = ["tune_compact_iters"]


def tune_compact_iters(
    iterations,
    *,
    tile_b: int = 512,
    n: int | None = None,
    boundary_iters: float = 8.0,
    min_saving_frac: float = 0.1,
    max_iter: int | None = None,
) -> int:
    """Pick ``SolverConfig.compact_iters`` from measured per-problem
    iteration counts; 0 means compaction is not worth its boundary.

    Args:
      iterations: (B,) per-problem iteration counts from a representative
        solve's ``SolveStats`` (any int/float array-like).
      tile_b: the REQUESTED lane-tile width (``SolverConfig.pallas_tile_b``).
      n: the problem size. STRONGLY recommended: the kernel silently clamps
        the requested tile to what VMEM fits (512 at N=24 but 384/256/128
        as N grows - kernels/layout.py::forward_tile_plan); pricing the
        requested width would put the model's tile count off 2-4x exactly
        on the large-N distributions compaction exists for. With ``n`` the
        model uses the tile the kernel will actually run.
      boundary_iters: phase-boundary cost in whole-batch-iteration units
        (measured ~230 us / ~30 us ~ 8 at the flagship shape).
      min_saving_frac: required modeled saving as a fraction of the
        single-phase cost before a K is returned.
      max_iter: optional cap; candidate Ks above it are ignored.

    Returns:
      The best phase-boundary K, or 0 to leave compaction off.
    """
    if n is not None:
        from ..kernels.layout import forward_tile_b

        tile_b = forward_tile_b(n, tile_b)
    it = np.asarray(iterations, np.int64).ravel()
    B = it.size
    if B <= tile_b:
        return 0                      # single tile: compaction is a no-op
    n_tiles = -(-B // tile_b)
    pad = n_tiles * tile_b - B
    # padded lanes converge on their first iteration (identity problems)
    nat = np.concatenate([it, np.ones(pad, np.int64)]).reshape(n_tiles, tile_b)
    tile_max = nat.max(axis=1)
    single_cost = float(tile_max.sum())

    sorted_desc = np.sort(it)[::-1]
    candidates = np.unique(it)
    if max_iter is not None:
        candidates = candidates[candidates < max_iter]
    best_k, best_cost = 0, single_cost
    for K in candidates:
        phase1 = float(np.minimum(tile_max, K).sum())
        remaining = sorted_desc[sorted_desc > K] - K
        if remaining.size == 0:
            continue
        n_surv_tiles = -(-remaining.size // tile_b)
        # CONSERVATIVE phase-2 model: the kernel sorts survivors by dual
        # residual, but residual is a weak proxy for remaining difficulty
        # (measured corr <= 0.11, DESIGN.md section 8) - so assume every
        # compacted tile pays the GLOBAL max remaining, i.e. compaction's
        # win is the tile-count reduction, not difficulty grouping. (The
        # optimistic perfectly-sorted model prefers compacting BEFORE the
        # easy mass has converged - exactly the regime where the proxy
        # assumption is false.)
        phase2 = float(n_surv_tiles * remaining[0])
        cost = phase1 + phase2 + boundary_iters * n_tiles
        if cost < best_cost:
            best_k, best_cost = int(K), cost
    if best_k and (single_cost - best_cost) >= min_saving_frac * single_cost:
        return best_k
    return 0
