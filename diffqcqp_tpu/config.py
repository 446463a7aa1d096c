"""Solver configuration.

The reference (quentinll/diffqcqp) scatters its knobs between the pybind layer
defaults (/root/reference/pybindings.cpp:76-82: epsilon=1e-10, mu_prox=1e-7,
max_iter=1000, adaptative_rho=true) and hard-coded constants inside each solver
(/root/reference/qcqplib/Solver.cpp:64 mu_thresh=10, alpha_relax=1.5; :73 tau
formula; :93 five-iteration update throttle; :95 0.8 damping; :524 eps_rel=1e-4
for QCQP; :15 iterative-refinement mu_ir=1e-7 / eps=1e-10 / 10 iters).

Here every knob lives in one frozen (hashable) dataclass so the whole config is
a static argument under ``jax.jit`` / ``jax.custom_vjp``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static hyper-parameters of the proximal over-relaxed adaptive-rho ADMM.

    Attributes:
      eps: absolute convergence tolerance on the dual residual
        (``rho * ||l2 - l2_prev||_inf``). Reference default 1e-10
        (pybindings.cpp:76).
      eps_rel: relative primal tolerance used by the QCQP stopping rule
        ``res_prim < eps + eps_rel * ||l||_2`` (Solver.cpp:524, :548) and,
        when ``primal_check`` is on, by the QP family too.
      primal_check: require ``res_prim < eps + eps_rel * ||l||_2`` in the
        QP-family stopping rule as well (the QCQP rule always has it).
        DIVERGENCE from the reference, which stops the QP family on the
        dual residual alone (Solver.cpp:88) and therefore carries a false-
        convergence mode: when the prox output l2 repeats exactly between
        consecutive iterations (iterates parked at a box corner - common
        with two-sided/narrow boxes), res_dual == 0 while the primal split
        ||l - l2|| is still O(1), and the solver certifies a feasible but
        SUBOPTIMAL point after a handful of iterations. Found by the exact
        BVLS box oracle (benchmarks/external_oracle.py); the native
        reference-equivalent solver reproduces the failure bit-for-bit.
        Set False only for strict reference iteration parity.
      mu_prox: proximal regularisation weight (pybindings.cpp:76).
      max_iter: hard iteration cap (static; the loop is a ``lax.while_loop``
        bounded by this).
      adaptive_rho: enable the adaptive penalty schedule (Solver.cpp:91-120).
      alpha_relax: over-relaxation factor (Solver.cpp:64).
      mu_thresh: residual-ratio threshold triggering a rho update
        (Solver.cpp:64, :92, :106).
      tau_damping: damping applied to tau on a rho-direction flip
        (Solver.cpp:95-96 ``tau = 1 + .8*(tau-1)``).
      rho_update_period: a fired trigger only applies every this-many fires
        (Solver.cpp:93 ``cpt % 5 == 0``).
      power_iters: iterations of power method when ``lmax_method=='power'``
        (Solver.cpp:71 uses 10 for the QP family, :530 uses 100 for QCQP).
      lmax_method: how the largest eigenvalue L of P (used for rho0/tau) is
        estimated. ``'eigh'`` reads it off the spectral factorisation the TPU
        solver computes anyway (exact, free); ``'power'`` replicates the
        reference's fixed-count power iteration (Solver.cpp:46-59) for
        trajectory parity.
      act_eps: active-set threshold in the dual recovery / KKT differentiation
        (Solver.cpp:129, :140, :270, :597, :639 all use 1e-10-ish guards).
      mu_ir: Tikhonov weight of the regularised normal equations used for the
        backward KKT solves (Solver.cpp:15 ``mu_ir=1e-7``).
      ir_iters: fixed Richardson-refinement step count for those solves
        (the reference runs at most 10 data-dependent steps, Solver.cpp:28;
        we run a static count so the computation is shape-stable under jit).
      axis_name: optional mesh axis name. When set, the convergence test of
        the while-loop is reduced with ``jax.lax.pmax`` across that axis so
        all shards of a ``shard_map``-ped solve agree on the stopping
        iteration (the only collective the algorithm needs).
      linsolve: ``'auto'`` | ``'spectral'`` | ``'chol'`` - the XLA engine's
        linear-solve mode for dense P (ignored by the pallas kernel, which
        has its own in-VMEM Cholesky, and by diagonal P). ``'spectral'``:
        one batched eigh up front, every adaptive-rho shift is then free -
        right when N is small or iterations are many. ``'chol'``: batched
        Cholesky of P + (rho+mu)I with an explicit inverse carried through
        the loop (one matvec per iteration), refactored only on rho-change
        iterations - kills the eigh setup cliff at large N (196 ms at
        B=4096 N=24 vs 11.6 ms for cholesky, and growing with N; DESIGN.md
        section 3). ``'auto'`` picks chol for dense N > 48, spectral
        otherwise.
      backend: ``'auto'`` | ``'xla'`` | ``'pallas'``. The pallas backend is
        the fused single-kernel TPU path (kernels/admm_pallas.py; float32,
        dense P, always power-iteration L). ``'auto'`` picks pallas exactly
        when those conditions hold on a TPU backend AND N <= 112 - the
        kernel's VMEM ceiling at the minimum 128-lane tile (the round-3
        compile-time cliff is gone, see ``pallas_rolled``; the kernel still
        beats the XLA engine 1.5x AT N=96, api._use_pallas). Else the pure
        XLA engine (solvers/admm.py).
      pallas_tile_b: problems per kernel instance (lane-tile width) for the
        pallas backend.
      stall_tol: machine-precision stall test, in ulps: a problem also counts
        as converged when ``||l2 - l2_prev||_inf <= stall_tol * eps_machine *
        max(1, ||l2||_inf)`` - the iterate has reached the fixed-point noise
        floor of the working dtype and cannot certify a tighter eps. Without
        this, float32 problems asked for eps below ~1e-6 spin to max_iter
        (and, because convergence is tile-synchronous on TPU, drag every
        problem in their tile with them). Problems converged this way are
        flagged in ``SolveStats.stalled`` so callers can distinguish an
        eps-certified solve from a noise-floor stall. Rarely triggered in
        float64 at reference tolerances (8 ulps ~ 2e-15), but when adaptive
        rho grows large, rho*delta can exceed eps while delta sits below the
        ulp floor - check the stalled flag if a certified eps matters.
        When the primal test is active (QCQP, or ``primal_check``), the same
        floor also bounds the primal residual: ``res_prim`` at the noise
        floor counts as passed (and the solve is flagged stalled unless both
        residuals met eps proper) - without it, a problem whose primal
        residual floors above ``eps + eps_rel*||l||`` (e.g. ``||l*|| = 0``
        with eps below the f32 floor) would spin its tile to max_iter.
        0 disables.
      rho_sync: when True (default), fired rho updates apply only on global
        iterations ``it % rho_update_period == 0``, so every problem's
        refactorisation lands on the same iteration. The reference instead
        throttles per problem by trigger count (``cpt % 5``, Solver.cpp:93),
        which staggers updates across a batch - on TPU that makes the fused
        kernel's (tile-wide) Cholesky refactor fire nearly every iteration.
        Same fixed point either way (the schedule shapes the trajectory, not
        the limit); set False for the reference's exact per-problem schedule.
      rho0_scale: multiplier on the reference's initial-penalty formula
        rho0 = sqrt(mu_prox L) (L/mu_prox)^0.4 (Solver.cpp:72). 1.0 (default)
        reproduces the reference; on the benchmark QCQP distribution ~3.0
        cuts mean iterations ~30% with identical solutions (the adaptive
        schedule converges to the same fixed point). A tuning knob, not a
        semantic change.
      pallas_rolled: ``'auto'`` | ``'on'`` | ``'off'`` - whether the fused
        pallas forward kernel uses the ROLLED (lax.fori_loop over a
        column-major VMEM factor) Cholesky factorisation instead of the
        fully unrolled one. The unrolled body's Mosaic compile time grows
        ~quadratically in its op count (measured one-off: ~10 s at N=24,
        ~73 s at N=48, ~213 s at N=64, ~16 min + VMEM OOM at N=96 -
        docs/DESIGN.md), dominated by the n^2/2-op factorisation repeated
        in up to three instantiations; rolling it bounds compile time at
        a mask-reduce scalar extraction per inner step + loop overhead.
        MEASURED (benchmarks/profile_rolled.py, B=4096 QCQP): compile
        10->3 s at N=24, 67->8 s at N=48, 213->11 s at N=64,
        infeasible->20 s at N=96, with runtime EQUAL or BETTER everywhere
        tried (N=48: 3.57->2.61 ms; N=24 within chip drift) - the smaller
        instruction stream wins. 'auto' rolls whenever the padded N
        exceeds 16 (tiny problems keep the unrolled form, whose compile
        is ~1 s and where loop overhead is the largest share). Bitwise-
        identical trajectories either way (same arithmetic order);
        parity-tested in tests/test_pallas.py.
      compact_iters: straggler compaction for the pallas backend. 0 (default)
        = off. ``'auto'`` = no tuning: phase 1 runs a fixed 32 iterations
        (kernels/admm_pallas.py::AUTO_K1 - past the easy mass of benign
        distributions, a broad optimum for long-tailed ones), then a
        runtime ``lax.cond`` three-way decision from the phase-1 survivor
        stats (which the manual mode discards): all lanes converged ->
        return phase-1 results directly (no argsort, no repack, no second
        kernel - benign distributions pay ~nothing); survivors would free
        at least one lane-tile -> full repack + compacted resume; survivors
        everywhere -> resume on the natural order (skips the boundary
        gather that could not pay for itself). Measured: flagship-neutral
        (within chip drift) and retains the hand-tuned speedup on the
        config-8 long-tail distribution (benchmarks/run_benchmarks.py).
        K > 0 (manual) splits the fused solve in two phases: phase 1 runs K
        iterations on the natural batch order, then the still-unconverged
        problems - known exactly at that point, unlike any pre-solve
        difficulty predictor (none works; DESIGN.md) - are grouped into as
        few lane-tiles as possible (sorted converged-last, then by dual
        residual so similar difficulty shares a tile) and phase 2 resumes
        them from carried state (l2, u, q_prox, rho, taus, counters).
        Rationale: convergence is tile-synchronous, so each tile pays its
        SLOWEST problem; compaction makes only ceil(unconverged/tile_b)
        tiles pay the iteration tail instead of all of them, and
        all-converged tiles exit phase 2 without factorising. The
        compacted solve runs the IDENTICAL per-problem update rule and
        rho schedule (state resumes exactly; the rho-update grid stays on
        global iterations via a static offset - without it the dual-only
        stopping rule exited measurably looser, 2.7e-3 vs 1.1e-4 against
        a tight solve); solutions agree with the single-phase solve to
        solve tolerance. (Not bitwise: the resume kernel is a separate
        Mosaic compilation whose FMA contraction may differ by 1 ulp per
        step - measured 6e-7 after one resumed iteration with an identity
        permutation.) Measured economics in DESIGN.md
        section 8: the phase boundary costs ~230 us at B=4096 N=24, one
        whole-batch iteration ~30 us, so enable it (K ~ just past the
        iteration-count median) only when the iteration distribution has
        a LONG tail - tile-max >> mean, e.g. heterogeneous conditioning;
        on the tuned flagship distribution it is net negative. Ignored by
        the XLA engine.
      warm_start_dual: also warm-start the scaled dual iterate. ADMM's
        convergence state is (l2, u), and at a fixed point u* = -(P l* + q)
        EXACTLY (substitute l = l2 = l* into the l-update; mu_prox-sized
        error only). Warm-starting l2 alone therefore barely helps - the
        solver still has to rediscover u (measured: NO iteration reduction
        on sequences of slowly-drifting problems). With this flag the
        engine synthesises u0 = -(P ws + q) from the primal warm start, so
        a warm start at the previous timestep's solution resumes from a
        near-fixed-point (l2, u) pair - the OSQP-style primal+dual warm
        start, derived instead of threaded. Measured ~3-4x fewer iterations
        on drifting-problem sequences (tests/test_contact_sim.py). Off by
        default: it changes the trajectory (not the solution) whenever the
        warm start is nonzero... and with ws = 0 it sets u0 = -q rather
        than 0, which diverges from the reference's iterate sequence.
      accel: opt-in accelerated ADMM (Goldstein et al. 2014 "fast ADMM"
        momentum with per-problem adaptive restart). Each iteration is still
        a STANDARD ADMM step - executed from an extrapolated (l2, u) point -
        so the per-iterate residual definitions and the stationarity bound
        (verify.stationarity_bound) are unchanged; momentum only moves where
        the next iteration starts. Restart: the combined residual
        c = rho(||r - l2'||^2 + ||l2' - l2_hat||^2) must decrease by factor
        accel_eta per iteration, else that problem's momentum resets (a=1,
        extrapolation from the plain iterate) - the standard safeguard that
        makes momentum safe under over-relaxation + adaptive rho (both of
        which fall outside the vanilla fast-ADMM theory). A trajectory
        knob, not a semantic change: same fixed point. XLA engine only
        (auto dispatch avoids the pallas kernel; backend='pallas' raises).
        MEASURED (DESIGN.md section 8, flagship QCQP distribution): in the
        vanilla regime (alpha_relax=1.0, adaptive_rho=False) momentum cuts
        mean iterations ~28% (43 -> 31) as the fast-ADMM literature
        promises - but the default pipeline's over-relaxation alone (29)
        already beats it, the tuned adaptive-rho schedule (17) dominates
        it outright, and STACKING momentum on that pipeline is strictly
        worse everywhere tried (mean 17 -> 67, tails blow up 23 -> 400).
        Momentum and over-relaxation/adaptive-rho harvest the same slack.
        Use only with alpha_relax=1.0 and adaptive_rho=False.
      accel_eta: restart threshold (Goldstein's eta), default 0.999.
      equilibrate: Ruiz-rescale each problem (ops/equilibrate.py) before
        solving and map the solution back - an algorithmic improvement the
        reference lacks, essential for its own pathologically-conditioned
        benchmark generator (exp-diag P, condition up to ~e^40) and for
        float32 on anything ill-conditioned. With equilibration on, eps is
        enforced on the EQUILIBRATED residuals (a relative-like criterion,
        the OSQP semantic); gradients are unaffected (the KKT adjoint always
        differentiates the original problem at the mapped-back solution).
      ruiz_iters: fixed Ruiz iteration count when equilibrate is set.
    """

    eps: float = 1e-10
    eps_rel: float = 1e-4
    primal_check: bool = True
    mu_prox: float = 1e-7
    max_iter: int = 1000
    adaptive_rho: bool = True
    alpha_relax: float = 1.5
    mu_thresh: float = 10.0
    tau_damping: float = 0.8
    rho_update_period: int = 5
    power_iters: int = 10
    lmax_method: str = "eigh"
    act_eps: float = 1e-10
    mu_ir: float = 1e-7
    ir_iters: int = 10
    axis_name: Optional[str] = None
    backend: str = "auto"
    linsolve: str = "auto"
    pallas_tile_b: int = 512
    pallas_rolled: str = "auto"
    stall_tol: float = 8.0
    rho_sync: bool = True
    rho0_scale: float = 1.0
    compact_iters: int | str = 0      # 0 off | K > 0 manual | 'auto'
    warm_start_dual: bool = False
    accel: bool = False
    accel_eta: float = 0.999
    equilibrate: bool = False
    ruiz_iters: int = 10

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)


# Reference defaults for the two problem families. The QCQP family uses 100
# power-iteration steps in the reference (Solver.cpp:530) vs 10 for QPs
# (Solver.cpp:71); only relevant when lmax_method == 'power'.
QP_DEFAULTS = SolverConfig()
QCQP_DEFAULTS = SolverConfig(power_iters=100)
