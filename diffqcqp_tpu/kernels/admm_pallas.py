"""Fused Pallas TPU kernel for the whole ADMM solve (self-contained).

Why a kernel: XLA's batched small-matrix linear algebra is hostile to this
workload - measured on a v5e chip at B=4096, N=24: ``jnp.linalg.eigh`` 196 ms,
``cholesky`` 11.6 ms, a triangular-solve pair 2.1 ms PER ITERATION, while the
whole ADMM loop needs ~40 iterations of a few hundred kFLOP each. The right
TPU program is ONE kernel per batch tile that loads P once into VMEM and does
EVERYTHING there: the power-iteration L estimate, the Cholesky factorisation
of P + (rho+mu)I, the ADMM loop with triangular solves, and the masked
refactorisations when the per-problem adaptive-rho schedule fires. HBM
traffic is O(B*N^2) total instead of O(iters * B * N^2), and no XLA linalg
kernel is ever invoked.

Layout: problems live on the LANE axis (last dim, multiples of 128) and
problem coordinates on the sublane axis - the struct-of-arrays trick for
batching tiny problems on a vector unit. Every dense step (matvec against P,
Cholesky column update, triangular-solve sweep) is a short unrolled chain of
(N, TILE_B) fused multiply-adds on the VPU; per-problem scalars (rho, taus,
counters, masks) are (1, TILE_B) float32 rows. There is no MXU-sized matmul
anywhere in this workload (per-problem matrices are ~24x24), so VPU on
VMEM-resident data IS the speed-of-light path.

For the QCQP disk prox the coordinates are pre-permuted so contact i owns
rows (i, nc+i) instead of (2i, 2i+1): the per-contact 2-norm then reads as
x[:nc]**2 + x[nc:]**2 - pure elementwise. The permutation is applied to P
(rows+cols) in XLA and undone on the output.

Mosaic quirks encoded here (found the hard way):
  * (1, lanes) loop-carried vectors must NOT be initialised from constants -
    constants get a sublane-replicated layout and the carry relayout
    (concrete -> replicated) is rejected. All zero-inits derive from loaded
    data.
  * int32 (1, lanes) carries hit the same relayout bug - counters and masks
    are f32 (exact below 2^24) and cast outside the kernel.

The engine semantics mirror solvers/admm.py exactly (same constants, same
update order, same stopping rules); tests/test_pallas.py asserts parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig
from ..solvers.admm import SolveStats
from .ldl import chol_to_unit, ldl_solve, ldl_solve_cm
from .layout import LANES as _LANES
from .layout import forward_tile_plan, pack_P, pack_vec, qcqp_perm, unpack_vec
from .layout import round_up as _round_up

PROX_NONNEG = 0
PROX_BOX = 1
PROX_SIGNED_BOX = 2
PROX_DISK = 3

# compact_iters='auto' phase-1 length: safely past the easy mass of benign
# distributions (flagship tile-max ~23 at the production schedule) and a
# broad optimum for long-tailed ones - see the auto block in
# admm_solve_pallas and SolverConfig.compact_iters.
AUTO_K1 = 32

# Carried-state layout for the two-phase (straggler-compaction) solve.
# One (2n, tb) vector plane: rows [0, n) = u, [n, 2n) = q_prox (l2 rides in
# the warm-start input slot); one (16, tb) scalar-row plane:
_SROW_RHO, _SROW_TAU_INC, _SROW_TAU_DEC, _SROW_RHO_UP, _SROW_CPT = 0, 1, 2, 3, 4
_SROW_CONV, _SROW_STALL, _SROW_ITERS, _SROW_RESP, _SROW_RESD = 5, 6, 7, 8, 9
_SROW_RHO_REC = 10                   # rho the recorded residuals used
_SCAL_ROWS = 16                      # 11 used + 5 sublane-alignment pad


def _admm_chol_kernel(
    *refs,
    n: int, n_real: int, nc: int, prox_kind: int, cfg: SolverConfig,
    qcqp_stopping: bool, damp_both: bool,
    state_in: bool = False, state_out: bool = False, it_offset: int = 0,
    rolled: bool = False, p_in_hbm: bool = False,
):
    # positional refs (pallas passes inputs, then outputs, then scratch):
    #   p, q, ws, a, b, c, [svec_in, srow_in],
    #   l2, iters, resp, resd, rho, conv, stall, [svec_out, srow_out], lc
    refs = list(refs)
    p_ref, q_ref, ws_ref, a_ref, b_ref, c_ref = refs[:6]
    del refs[:6]
    if state_in:
        svec_in, srow_in = refs[:2]
        del refs[:2]
    (l2_out, iters_out, resp_out, resd_out, rho_out, conv_out,
     stall_out) = refs[:7]
    del refs[:7]
    if state_out:
        svec_out, srow_out = refs[:2]
        del refs[:2]
    if p_in_hbm:
        # P stays in HBM (BlockSpec memory_space=ANY - no pipeline double
        # buffering) and this tile's slab is DMA'd into a VMEM scratch
        # once per kernel instance. Halving P's VMEM residency buys a
        # WIDER lane tile at N >= 48 (ops are fixed-overhead dominated,
        # so fewer/wider tiles are near-proportionally faster); the
        # one-shot ~N^2*tb*4B copy costs tens of us against a ~ms solve.
        lc_ref, dinv_ref, p_vmem, p_sem = refs
        i = pl.program_id(0)
        tb_ = q_ref.shape[-1]
        cp = pltpu.make_async_copy(
            p_ref.at[:, :, pl.ds(i * tb_, tb_)], p_vmem, p_sem
        )
        cp.start()
        cp.wait()
        p_ref = p_vmem
    else:
        lc_ref, dinv_ref = refs
    f32 = jnp.float32
    eps = f32(cfg.eps)
    mu_prox = f32(cfg.mu_prox)
    alpha = f32(cfg.alpha_relax)
    mu_thresh = f32(cfg.mu_thresh)
    damp = f32(cfg.tau_damping)
    eps_rel = f32(cfg.eps_rel)
    tiny = f32(1e-30)

    q = q_ref[:]
    tb = q.shape[-1]
    zeros_1 = jnp.sum(q[0:1, :], axis=0, keepdims=True) * 0.0   # concrete-layout (1, tb)
    zeros_nv = q * 0.0

    # row-index column (n, 1) built in-kernel (pallas kernels cannot capture
    # array constants), broadcast over lanes in comparisons
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def matvec_p(x):
        acc = p_ref[:, 0, :] * x[0:1, :]
        for k in range(1, n):
            acc += p_ref[:, k, :] * x[k : k + 1, :]
        return acc

    if not state_in:
        # ---- power iteration for L (reference: Solver.cpp:46-59, fixed
        # count). Skipped entirely on resume: rho and the taus - the only
        # quantities derived from L - are carried in the state rows.
        v = zeros_nv + jnp.where(
            row_idx < n_real, f32(1.0 / np.sqrt(n_real)), f32(0.0)
        ).astype(f32)
        for _ in range(cfg.power_iters):
            av = matvec_p(v)
            nrm = jnp.sqrt(jnp.sum(av * av, axis=0, keepdims=True))
            v = av / jnp.maximum(nrm, tiny)
        L = jnp.sum(v * matvec_p(v), axis=0, keepdims=True)
        L = jnp.maximum(L, mu_prox)
        ratio = L / mu_prox
        rho0 = jnp.sqrt(mu_prox * L) * jnp.power(ratio, f32(0.4)) * f32(cfg.rho0_scale)
        tau0 = jnp.power(ratio, f32(0.15))

    def factorize(shift):
        """lc_ref <- unit-diag LDL^T of (P + diag(shift)), shift (1, tb).

        UNROLLED form (rolled=False): left-looking standard-Cholesky
        columns (n^2/2 small (n, tb) ops), then converted in place to the
        zero-diagonal normalised form + dinv plane (kernels/ldl.py) so
        every solve sweep row is ONE broadcast-FMA. Measured notes: a
        tile-wide refactorisation costs ~3 ADMM iterations at the flagship
        shape and is op-LATENCY bound; a right-looking variant with one
        3-D trailing-panel broadcast per column was tried and lowered ~60%
        SLOWER through Mosaic (3-D ref-slice updates do not vectorise
        well), so the simple form stays. The rho_sync it>0 throttle keeps
        refactorisations to ~2 per solve instead.

        ROLLED form (rolled=True, SolverConfig.pallas_rolled): the same
        math under two lax.fori_loops, bounding the Mosaic compile time
        that grows ~quadratically in the unrolled op count (10 s at N=24
        -> 213 s at N=64 -> infeasible at N=96). The factor is stored
        COLUMN-MAJOR - lc_ref[j] is column j - so the loop body only ever
        indexes the ref's LEADING (untiled) axis dynamically (dynamic
        sublane indexing is the Mosaic pattern that fails; static middle-
        axis slices, which the solve sweeps still use, are fine). The
        scalar L[j, k] each inner step needs is extracted by a mask-reduce
        against the row-j indicator (~3 ops per inner step vs 1 unrolled -
        refactorisations are ~2-3 per solve, so this costs a few
        iterations' equivalent at large N where it is enabled). P's column
        j is read as its row j (symmetric, identity-padded).
        """
        if rolled:
            def col_body(j, carry):
                ej = (row_idx == j).astype(f32)
                pj = p_ref[pl.ds(j, 1), :, :][0]
                s = pj + ej * shift

                def inner(k, s_):
                    colk = lc_ref[pl.ds(k, 1), :, :][0]
                    ljk = jnp.sum(colk * ej, axis=0, keepdims=True)
                    return s_ - colk * ljk

                s = jax.lax.fori_loop(0, j, inner, s)
                d = jnp.maximum(jnp.sum(s * ej, axis=0, keepdims=True), tiny)
                col = s * jax.lax.rsqrt(d) * (row_idx >= j).astype(f32)
                lc_ref[pl.ds(j, 1), :, :] = col[None]
                return carry

            jax.lax.fori_loop(0, n, col_body, jnp.int32(0))

            def conv_body(j, dinv_val):
                # in-place chol_to_unit (kernels/ldl.py), column-major:
                # zero-diag unit columns + the dinv = 1/L_jj^2 plane
                # accumulated as a carried value (no dynamic-row stores).
                ej = (row_idx == j).astype(f32)
                colj = lc_ref[pl.ds(j, 1), :, :][0]
                rj = 1.0 / jnp.sum(colj * ej, axis=0, keepdims=True)
                strict = (row_idx > j).astype(f32)
                lc_ref[pl.ds(j, 1), :, :] = (colj * (rj * strict))[None]
                return dinv_val * (1.0 - ej) + ej * (rj * rj)

            dinv_ref[:] = jax.lax.fori_loop(0, n, conv_body, zeros_nv)
            return

        for j in range(n):
            ej = (row_idx == j).astype(f32)
            s = p_ref[:, j, :] + ej * shift
            for k in range(j):
                colk = lc_ref[:, k, :]
                s = s - colk * colk[j : j + 1, :]
            d = jnp.maximum(s[j : j + 1, :], tiny)
            col = s * jax.lax.rsqrt(d)
            mask = (row_idx >= j).astype(f32)
            lc_ref[:, j, :] = col * mask
        chol_to_unit(lc_ref, dinv_ref, n, row_idx)

    def solve_normal(rhs):
        """x = (L L^T)^{-1} rhs, 2n + 1 broadcast-FMAs (kernels/ldl.py).

        (Two earlier forms, both measured: row-by-row sweeps with (1, tb)
        divides - 2 ops per row; and a block-of-4 variant - no gain. The
        zero-diag LDL^T form halves the sweeps' op count.)
        """
        if rolled:
            return ldl_solve_cm(lc_ref, dinv_ref, rhs, n)
        return ldl_solve(lc_ref, dinv_ref, rhs, n)

    def prox(x):
        if prox_kind == PROX_NONNEG:
            return jnp.maximum(x, 0.0)
        if prox_kind == PROX_BOX:
            return jnp.minimum(jnp.maximum(x, a_ref[:]), b_ref[:])
        if prox_kind == PROX_SIGNED_BOX:
            y = jnp.minimum(jnp.maximum(x, a_ref[:]), b_ref[:])
            vs = c_ref[:]
            return vs * jnp.minimum(vs * y, 0.0)
        # PROX_DISK (permuted layout: contact c owns rows (c, nc + c))
        r = a_ref[:nc, :]
        xa = x[:nc, :]
        xb = x[nc : 2 * nc, :]
        nrm = jnp.sqrt(xa * xa + xb * xb)
        scale = jnp.where(nrm > r, r / jnp.maximum(nrm, tiny), f32(1.0))
        parts = [xa * scale, xb * scale]
        if n > 2 * nc:
            parts.append(x[2 * nc :, :])
        return jnp.concatenate(parts, axis=0)

    if state_in:
        # resume from carried state (two-phase straggler compaction). A
        # tile whose every lane already converged skips the factorisation
        # AND the loop body (all_done starts true): its cost is just the
        # HBM loads of its blocks.
        rho_in = srow_in[_SROW_RHO : _SROW_RHO + 1, :]
        conv_in = srow_in[_SROW_CONV : _SROW_CONV + 1, :]
        start_done = jnp.min(conv_in) > f32(0.5)

        @pl.when(~start_done)
        def _():
            factorize(rho_in + mu_prox)

        state = (
            jnp.zeros((), jnp.int32),                        # it
            ws_ref[:],                                        # l2 (carried)
            svec_in[:n, :],                                   # u
            svec_in[n : 2 * n, :],                            # q_prox
            rho_in,                                           # rho
            srow_in[_SROW_TAU_INC : _SROW_TAU_INC + 1, :],    # tau_inc
            srow_in[_SROW_TAU_DEC : _SROW_TAU_DEC + 1, :],    # tau_dec
            srow_in[_SROW_RHO_UP : _SROW_RHO_UP + 1, :],      # rho_up
            srow_in[_SROW_CPT : _SROW_CPT + 1, :],            # cpt
            conv_in,                                          # converged
            srow_in[_SROW_STALL : _SROW_STALL + 1, :],        # stalled
            srow_in[_SROW_ITERS : _SROW_ITERS + 1, :],        # iters
            srow_in[_SROW_RESP : _SROW_RESP + 1, :],          # res_prim
            srow_in[_SROW_RESD : _SROW_RESD + 1, :],          # res_dual
            srow_in[_SROW_RHO_REC : _SROW_RHO_REC + 1, :],    # rho_rec
            start_done,                                       # all_done
        )
    else:
        factorize(rho0 + mu_prox)

        if cfg.warm_start_dual:
            # u* = -(P l* + q) at any fixed point (SolverConfig docstring):
            # synthesise the dual warm start from the primal one. Pad rows
            # carry P diag 1 / q 0 / ws 0, so their u0 stays 0.
            u0 = -(matvec_p(ws_ref[:]) + q)
        else:
            u0 = zeros_nv

        state = (
            jnp.zeros((), jnp.int32),           # it
            ws_ref[:],                           # l2
            u0,                                  # u
            q,                                   # q_prox
            rho0,                                # rho
            tau0,                                # tau_inc
            tau0,                                # tau_dec
            zeros_1,                             # rho_up  (f32 {-1,0,1})
            zeros_1,                             # cpt     (f32 counter)
            zeros_1,                             # converged (f32 0/1)
            zeros_1,                             # stalled (f32 0/1)
            zeros_1,                             # iters   (f32 counter)
            zeros_1 + f32(jnp.inf),              # res_prim
            zeros_1 + f32(jnp.inf),              # res_dual
            rho0,                                # rho_rec (see rho_out)
            jnp.zeros((), jnp.bool_),            # all_done
        )

    def cond(s):
        return (s[0] < cfg.max_iter) & ~s[15]

    def body(s):
        (it, l2, u, q_prox, rho, tau_inc, tau_dec, rho_up, cpt,
         conv, stall, iters, resp, resd, rho_rec, _) = s
        active = 1.0 - conv

        l = solve_normal(rho * l2 - u - q_prox)
        q_prox_n = q - mu_prox * l
        r = alpha * l + (f32(1.0) - alpha) * l2
        l2_n = prox(r + u / rho)
        u_n = u + rho * (r - l2_n)
        delta = jnp.max(jnp.abs(l2_n - l2), axis=0, keepdims=True)
        rd = rho * delta
        rp = jnp.max(jnp.abs(l2_n - r), axis=0, keepdims=True)

        eps_ok = rd < eps
        if cfg.stall_tol > 0.0:
            # machine-precision stall (SolverConfig.stall_tol): without this,
            # f32 problems asked for eps below ~1e-6 spin to max_iter and -
            # convergence being tile-synchronous - drag their whole tile.
            floor = f32(cfg.stall_tol * 1.1920929e-7)
            l2inf = jnp.max(jnp.abs(l2_n), axis=0, keepdims=True)
            noise = floor * jnp.maximum(l2inf, f32(1.0))
            dual_ok = eps_ok | (delta <= noise)
        else:
            dual_ok = eps_ok
        if qcqp_stopping or cfg.primal_check:
            # QCQP rule; with cfg.primal_check also for the QP family (the
            # reference's dual-only rule falsely certifies at box corners -
            # see SolverConfig.primal_check).
            lnorm = jnp.sqrt(jnp.sum(l * l, axis=0, keepdims=True))
            prim_eps = rp < eps + eps_rel * lnorm
            if cfg.stall_tol > 0.0:
                # primal-side noise floor (same scale as the dual one): a
                # lane whose primal residual sits at the f32 fixed-point
                # floor but above eps + eps_rel*||l|| (e.g. ||l*|| = 0 with
                # eps below f32 noise) must not spin its whole tile to
                # max_iter. The corner-parking mode primal_check exists for
                # has rp = O(1) - orders above this floor - so the escape
                # cannot re-admit it.
                prim_ok = prim_eps | (rp <= noise)
            else:
                prim_ok = prim_eps
            newly = (prim_ok & dual_ok).astype(f32)
            certified = eps_ok & prim_eps
        else:
            newly = dual_ok.astype(f32)
            certified = eps_ok

        adapt = active * (1.0 - newly)
        if cfg.adaptive_rho:
            def rho_update(gate):
                inc = adapt * (rp > mu_thresh * rd).astype(f32)
                dec = adapt * (1.0 - inc) * (rd > mu_thresh * rp).astype(f32)
                fire = inc + dec
                app_inc = gate * inc
                app_dec = gate * dec
                flip_inc = app_inc * (rho_up < -0.5).astype(f32)
                flip_dec = app_dec * (rho_up > 0.5).astype(f32)
                damped_inc = 1.0 + damp * (tau_inc - 1.0)
                damped_dec = 1.0 + damp * (tau_dec - 1.0)
                if damp_both:
                    dm = flip_inc + flip_dec
                    tau_inc_n = dm * damped_inc + (1.0 - dm) * tau_inc
                    tau_dec_n = dm * damped_dec + (1.0 - dm) * tau_dec
                else:
                    tau_inc_n = flip_inc * damped_inc + (1.0 - flip_inc) * tau_inc
                    tau_dec_n = flip_dec * damped_dec + (1.0 - flip_dec) * tau_dec
                rho_n = (
                    app_inc * (rho * tau_inc_n)
                    + app_dec * (rho / tau_dec_n)
                    + (1.0 - app_inc - app_dec) * rho
                )
                rho_up_n = app_inc - app_dec + (1.0 - app_inc - app_dec) * rho_up
                cpt_n = cpt + fire
                any_change = jnp.max(app_inc + app_dec) > 0.5
                return tau_inc_n, tau_dec_n, rho_n, rho_up_n, cpt_n, any_change

            if cfg.rho_sync:
                # batch-synchronous throttle (cfg.rho_sync): refactorisations
                # land on shared iterations instead of firing tile-wide
                # nearly every step from per-lane staggering. it=0 excluded
                # (rho0 was applied this very iteration; a tile-wide
                # refactor costs ~3 iterations) - mirrored in
                # solvers/admm.py for parity. The predicate is a SCALAR, so
                # the whole ~25-op update block runs under lax.cond only on
                # period iterations (1 in rho_update_period) instead of
                # computing masked no-ops every iteration. cpt (unused for
                # gating in sync mode, not an output) is only maintained on
                # those iterations.
                # it_offset (static) keeps the GLOBAL iteration count
                # across a two-phase resume, so the sync-mode rho schedule
                # of a compacted solve is identical to the single-phase
                # one by construction (refactors recompute pure functions
                # of (P, rho), so tile regrouping cannot change the
                # trajectory - only the gate's phase could, and this pins
                # it). Without the offset, a phase-2 restart shifts the
                # update grid and the dual-only stopping rule can exit at
                # a visibly looser point (measured 2.7e-3 vs 1.1e-4 error
                # against a tight solve at K=1, eps=1e-6).
                git = it + it_offset
                period_ok = (git % cfg.rho_update_period == 0) & (git > 0)
                (tau_inc_n, tau_dec_n, rho_n, rho_up_n, cpt_n,
                 any_change) = jax.lax.cond(
                    period_ok,
                    lambda: rho_update(f32(1.0)),
                    lambda: (tau_inc, tau_dec, rho, rho_up, cpt,
                             jnp.zeros((), jnp.bool_)),
                )
            else:
                period_gate = (
                    (cpt - jnp.floor(cpt / cfg.rho_update_period)
                     * cfg.rho_update_period) < 0.5
                ).astype(f32)
                (tau_inc_n, tau_dec_n, rho_n, rho_up_n, cpt_n,
                 any_change) = rho_update(period_gate)

            # refactor the tile's Cholesky when any lane's rho changed; lanes
            # with unchanged rho recompute the identical factor (pure
            # function of P and rho), so a tile-wide refactor is sound.
            @pl.when(any_change)
            def _():
                factorize(rho_n + mu_prox)
        else:
            tau_inc_n, tau_dec_n, rho_n, rho_up_n, cpt_n = (
                tau_inc, tau_dec, rho, rho_up, cpt,
            )

        keep = active
        l2_o = keep * l2_n + (1.0 - keep) * l2
        u_o = keep * u_n + (1.0 - keep) * u
        qp_o = keep * q_prox_n + (1.0 - keep) * q_prox
        # residual carries START at +inf, so the freeze must be a SELECT:
        # the arithmetic blend keep*new + (1-keep)*old evaluates 0*inf =
        # NaN on the first iteration and the NaN then propagates to the
        # recorded stats forever (found on hardware in round 3; the
        # stopping logic was unaffected - it uses the freshly computed
        # residuals - so solutions/convergence were always correct).
        resp_o = jnp.where(keep > 0.5, rp, resp)
        resd_o = jnp.where(keep > 0.5, rd, resd)
        # the rho these residuals were computed with (rd = rho * delta,
        # the ENTRY carry) - frozen with them, BEFORE this iteration's
        # update: on a max_iter-capped problem whose last iteration fires
        # a rho update, the carry leaves already multiplied by tau
        # (measured up to 16x) and would break the stationarity-bound
        # reconstruction delta = res_dual / rho.
        rho_rec_o = jnp.where(keep > 0.5, rho, rho_rec)
        conv_o = jnp.maximum(conv, active * newly)
        # eps-certified vs noise-floor stall (SolveStats.stalled): certified
        # means BOTH residual tests passed at eps proper, not via a floor
        stall_o = jnp.maximum(
            stall, active * newly * (1.0 - certified.astype(f32))
        )
        iters_o = iters + active
        done = jnp.min(conv_o) > 0.5

        return (it + 1, l2_o, u_o, qp_o, rho_n, tau_inc_n, tau_dec_n,
                rho_up_n, cpt_n, conv_o, stall_o, iters_o, resp_o, resd_o,
                rho_rec_o, done)

    final = jax.lax.while_loop(cond, body, state)
    l2_out[:] = final[1]
    iters_out[:] = final[11]
    resp_out[:] = final[12]
    resd_out[:] = final[13]
    rho_out[:] = final[14]       # residual-consistent rho (NOT the carry)
    conv_out[:] = final[9]
    stall_out[:] = final[10]
    if state_out:
        # full-plane stores (Mosaic: no partial-row writes)
        svec_out[:] = jnp.concatenate([final[2], final[3]], axis=0)
        # row _SROW_RHO carries the LIVE penalty (phase 2 resumes with
        # it); row _SROW_RHO_REC the residual-consistent one for stats.
        srow_out[:] = jnp.concatenate(
            [final[4], final[5], final[6], final[7], final[8], final[9],
             final[10], final[11], final[12], final[13], final[14]]
            + [zeros_1] * (_SCAL_ROWS - 11),
            axis=0,
        )


def admm_solve_pallas(
    P: Array,
    q: Array,
    warm_start: Array,
    prox_kind: int,
    prox_args: tuple,
    cfg: SolverConfig,
    qcqp_stopping: bool = False,
    damp_both: bool = True,
    tile_b: int = 256,
    interpret: bool = False,
) -> tuple[Array, SolveStats]:
    """Drop-in replacement for solvers.admm.admm_solve (dense P).

    Computes in float32 regardless of input dtype (TPU-native precision);
    outputs are cast back. prox_args: () | (l_min, l_max) |
    (l_min, l_max, v_sign) | (radius,). Off-TPU (e.g. cfg.backend='pallas'
    on the CPU test backend) the kernel runs in interpret mode - Mosaic only
    lowers for TPU.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    B, n = q.shape
    nc = n // 2
    orig_dtype = q.dtype
    f32 = jnp.float32

    if prox_kind == PROX_DISK:
        perm, inv = qcqp_perm(n)
    else:
        perm = inv = None

    if not (
        cfg.compact_iters in ("auto", -1)
        or (
            isinstance(cfg.compact_iters, int)
            and not isinstance(cfg.compact_iters, bool)
            and cfg.compact_iters >= 0
        )
    ):
        raise ValueError(
            "SolverConfig.compact_iters must be 0 (off), a positive int K, "
            f"or 'auto' (alias -1); got {cfg.compact_iters!r}"
        )

    n_pad = _round_up(n, 8)
    # Tile plan (kernels/layout.py::forward_tile_plan - ONE definition,
    # shared with the compaction calibrator so its cost model prices the
    # tiles the kernel actually runs). VMEM anchors: measured failure
    # n_pad=24, tile_b=2048 ("20.53M > 16.00M"). p_in_hbm = single-buffered
    # P slab (manual HBM->VMEM DMA, no pipeline double buffer): taken when
    # it admits a WIDER lane tile - per-(rows, tile) ops are fixed-overhead
    # dominated, so fewer/wider tiles are near-proportionally faster
    # (measured: N=64 tb 128->256, ~25%) - and forced at n_pad >= 96 where
    # the double-buffered footprint sits at the ~16 MiB ceiling (the
    # round-3 N=96 OOM). Not in interpret mode (the generic interpreter
    # lacks TPU DMA primitives).
    req = min(tile_b, _round_up(B, _LANES))
    tb, p_in_hbm = forward_tile_plan(n, req, hbm_p=not interpret)
    Bp = _round_up(B, tb)

    def to_kernel_vec(x, fill=0.0):
        if perm is not None:
            x = x[:, perm]
        return pack_vec(x, n_pad, Bp, fill=fill)

    zero_plane = jnp.zeros((n_pad, Bp), f32)

    def pack_inputs(Pu, qu, pa):
        """Kernel planes for (possibly batch-permuted) UNPACKED inputs.

        kernels/layout.py: padded coords get an identity diagonal, padded
        problems P = I (they solve trivially to 0 since their q = 0).
        """
        P_b = pack_P(Pu, n_pad, Bp, perm=perm)
        q_b = to_kernel_vec(qu)
        if prox_kind == PROX_BOX:
            a_b = to_kernel_vec(pa[0], fill=-1.0)
            b_b = to_kernel_vec(pa[1], fill=1.0)
            c_b = zero_plane
        elif prox_kind == PROX_SIGNED_BOX:
            a_b = to_kernel_vec(pa[0], fill=-1.0)
            b_b = to_kernel_vec(pa[1], fill=1.0)
            c_b = to_kernel_vec(pa[2], fill=0.0)
        elif prox_kind == PROX_DISK:
            # (B, nc) radii sit in the FIRST nc sublane rows of an
            # (n_pad, Bp) plane (kernel reads a_ref[:nc, :]); no
            # coordinate permutation.
            a_b = pack_vec(pa[0], n_pad, Bp)
            b_b = zero_plane
            c_b = zero_plane
        else:
            a_b = zero_plane
            b_b = zero_plane
            c_b = zero_plane
        return P_b, q_b, a_b, b_b, c_b

    P_k, q_kk, a_k, b_k, c_k = pack_inputs(P, q, prox_args)
    ws_kk = to_kernel_vec(warm_start)

    # rolled factorisation (SolverConfig.pallas_rolled). Measured on-chip
    # (benchmarks/profile_rolled.py, B=4096 QCQP): compile 10->3 s at N=24,
    # 67->8 s at N=48, 213->11 s at N=64, infeasible->20 s at N=96; runtime
    # EQUAL-or-better everywhere tried (N=48: 3.57->2.61 ms) - the smaller
    # instruction stream beats the unrolled form's per-op savings. Auto
    # keeps only tiny problems (n_pad <= 16, factorisation <= ~150 ops,
    # compile ~1 s) on the unrolled path where loop overhead is the largest
    # share.
    rolled = cfg.pallas_rolled == "on" or (
        cfg.pallas_rolled == "auto" and n_pad > 16
    )

    grid = (Bp // tb,)
    vec_spec = pl.BlockSpec((n_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    if p_in_hbm:
        # whole array, un-blocked; the kernel DMAs its own tile slab
        mat_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        mat_spec = pl.BlockSpec(
            (n_pad, n_pad, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
    svec_spec = pl.BlockSpec(
        (2 * n_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    srow_spec = pl.BlockSpec(
        (_SCAL_ROWS, tb), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def call(cfg_k, P_b, q_b, ws_b, a_b, b_b, c_b, svec=None, srow=None,
             state_out=False, it_offset=0):
        state_in = svec is not None
        kernel = functools.partial(
            _admm_chol_kernel,
            n=n_pad, n_real=n, nc=nc, prox_kind=prox_kind, cfg=cfg_k,
            qcqp_stopping=qcqp_stopping, damp_both=damp_both,
            state_in=state_in, state_out=state_out, it_offset=it_offset,
            rolled=rolled, p_in_hbm=p_in_hbm,
        )
        in_specs = [mat_spec] + [vec_spec] * 5
        inputs = [P_b, q_b, ws_b, a_b, b_b, c_b]
        if state_in:
            in_specs += [svec_spec, srow_spec]
            inputs += [svec, srow]
        out_specs = [vec_spec] + [row_spec] * 6
        out_shape = [jax.ShapeDtypeStruct((n_pad, Bp), f32)] + [
            jax.ShapeDtypeStruct((1, Bp), f32)
        ] * 6   # iters, res_prim, res_dual, rho, converged, stalled
        if state_out:
            out_specs += [svec_spec, srow_spec]
            out_shape += [
                jax.ShapeDtypeStruct((2 * n_pad, Bp), f32),
                jax.ShapeDtypeStruct((_SCAL_ROWS, Bp), f32),
            ]
        scratch = [
            pltpu.VMEM((n_pad, n_pad, tb), f32),
            pltpu.VMEM((n_pad, tb), f32),
        ]
        if p_in_hbm:
            scratch += [
                pltpu.VMEM((n_pad, n_pad, tb), f32),   # P tile slab
                pltpu.SemaphoreType.DMA(()),
            ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)

    K = cfg.compact_iters
    auto = K in ("auto", -1)
    if auto:
        # auto mode (SolverConfig.compact_iters='auto'): a FIXED phase
        # boundary at AUTO_K1 iterations - past the easy mass of every
        # benign distribution measured (flagship tile-max ~23) and a broad
        # optimum for long-tailed ones (the savings derivative w.r.t. K is
        # flat once most lanes have converged: moving K from p50+2 to 32
        # trades ~n_saved_tiles * dK tile-iterations in phase 1 against
        # the same count back in a smaller phase 2) - then a RUNTIME
        # three-way decision from the phase-1 outputs (the survivor stats
        # the hand-tuned mode discards):
        #   all converged       -> return phase-1 results: no argsort, no
        #                          repack, no second kernel (lax.cond) -
        #                          the flagship-neutrality case;
        #   survivors free >= 1 -> full repack + compacted resume (the
        #      tile                hand-tuned path);
        #   survivors everywhere-> resume on the NATURAL order: pays one
        #                          extra kernel launch but skips the
        #                          argsort/gather boundary cost that
        #                          cannot pay for itself.
        K = AUTO_K1 if cfg.max_iter > AUTO_K1 else 0
    if 0 < K < cfg.max_iter and Bp > tb:
        # Two-phase straggler compaction (see SolverConfig.compact_iters):
        # convergence is tile-synchronous, so each tile pays its slowest
        # lane. Phase 1 runs K iterations; the survivors - known exactly,
        # where no pre-solve difficulty predictor works - are packed into
        # as few tiles as possible (converged last; among survivors,
        # largest dual residual first so similar difficulty shares a tile)
        # and resumed from full carried state. All-converged tiles skip
        # factorisation and loop in phase 2.
        (l2_1, it_1, rp_1, rd_1, rho_1, cv_1, st_1, svec_1, srow_1) = call(
            cfg.replace(max_iter=K), P_k, q_kk, ws_kk, a_k, b_k, c_k,
            state_out=True,
        )
        cfg2 = cfg.replace(max_iter=cfg.max_iter - K)

        def repack_branch():
            key = jnp.where(cv_1[0] > 0.5, jnp.inf, -rd_1[0])
            bperm = jnp.argsort(key)        # stable: batch padding last
            inv_bperm = jnp.argsort(bperm)

            # Gather-cost note (measured, B=4096 N=24): a lane-axis take of
            # the packed (n, n, Bp) P plane is 219 us - half a forward solve -
            # while an axis-0 take of the batch-major ORIGINAL (contiguous
            # rows) followed by the same pack as phase 1 is ~24 us. So the
            # dense inputs are re-packed from permuted originals, and the
            # lane-major state planes ride through one combined
            # transpose/row-take/transpose (~10 us). bperm[:B] indexes only
            # real problems: every padded lane (P=I, q=0) converges on its
            # first iteration, so padding sorts into the tail; a real
            # converged problem displaced past position B gets padding
            # P=I/q=0 in phase 2, which is sound - converged lanes never
            # read their problem data again (active=0 freezes them).
            bperm_b = bperm[:B]
            P_k2, q_k2, a_k2, b_k2, c_k2 = pack_inputs(
                jnp.take(P, bperm_b, axis=0),
                jnp.take(q, bperm_b, axis=0),
                tuple(jnp.take(x, bperm_b, axis=0) for x in prox_args),
            )
            comb = jnp.concatenate([l2_1, svec_1, srow_1], axis=0)
            comb = jnp.take(comb.T, bperm, axis=0).T
            ws_2 = comb[:n_pad]
            svec_2 = comb[n_pad : 3 * n_pad]
            srow_2 = comb[3 * n_pad :]
            outs2 = call(
                cfg2, P_k2, q_k2, ws_2, a_k2, b_k2, c_k2,
                svec=svec_2, srow=srow_2, it_offset=K,
            )
            comb_o = jnp.concatenate([outs2[0]] + list(outs2[1:]), axis=0)
            comb_o = jnp.take(comb_o.T, inv_bperm, axis=0).T
            return tuple(
                [comb_o[:n_pad]]
                + [comb_o[n_pad + i : n_pad + i + 1] for i in range(6)]
            )

        if auto:
            def done_branch():
                return (l2_1, it_1, rp_1, rd_1, rho_1, cv_1, st_1)

            def natural_branch():
                # resume from carried state on the ORIGINAL lane order:
                # the identical update rule, no boundary gather.
                return call(
                    cfg2, P_k, q_kk, l2_1, a_k, b_k, c_k,
                    svec=svec_1, srow=srow_1, it_offset=K,
                )

            n_tiles = Bp // tb
            unconv = cv_1[0] < 0.5
            surv = jnp.sum(unconv.astype(jnp.int32))
            act_tiles = jnp.sum(
                jnp.any(unconv.reshape(n_tiles, tb), axis=1).astype(jnp.int32)
            )
            tiles_after = (surv + tb - 1) // tb
            outs = jax.lax.cond(
                surv == 0,
                done_branch,
                lambda: jax.lax.cond(
                    tiles_after < act_tiles, repack_branch, natural_branch
                ),
            )
        else:
            outs = repack_branch()
        (l2_k, iters_k, resp_k, resd_k, rho_k, conv_k, stall_k) = outs
    else:
        l2_k, iters_k, resp_k, resd_k, rho_k, conv_k, stall_k = call(
            cfg, P_k, q_kk, ws_kk, a_k, b_k, c_k
        )

    l2 = unpack_vec(l2_k, B, n, inv=inv)
    stats = SolveStats(
        iterations=iters_k[0, :B].astype(jnp.int32),
        res_prim=resp_k[0, :B].astype(orig_dtype),
        res_dual=resd_k[0, :B].astype(orig_dtype),
        rho=rho_k[0, :B].astype(orig_dtype),
        converged=conv_k[0, :B] > 0.5,
        stalled=stall_k[0, :B] > 0.5,
    )
    return l2.astype(orig_dtype), stats
