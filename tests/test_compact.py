"""Two-phase straggler compaction (SolverConfig.compact_iters).

Compaction re-orders the batch between two kernel invocations and resumes
the unconverged problems from carried state; these tests pin the contract:
identical fixed points to the single-phase solve (same stopping rule per
problem), correct stats plumbing across the phase boundary, and graceful
fallbacks at the edges (single tile, K >= max_iter). Interpret mode on CPU
with tile_b=128 so several tiles exist at small B.

Reference note: the reference solver (Solver.cpp) has no analogue - it
solves one problem per call. Compaction exists because the TPU kernel's
convergence is tile-synchronous (see kernels/admm_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.config import QCQP_DEFAULTS, SolverConfig

B, NC = 300, 3  # Bp = 384 at tile 128 -> 3 tiles
N = 2 * NC

BASE = SolverConfig(
    eps=1e-6, max_iter=500, lmax_method="power", backend="pallas",
    pallas_tile_b=128,
)
QBASE = QCQP_DEFAULTS.replace(
    eps=1e-6, max_iter=500, backend="pallas", pallas_tile_b=128,
)


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(7)
    S = rng.standard_normal((B, N, N)).astype(np.float32)
    P = jnp.asarray(
        S @ S.transpose(0, 2, 1) + 0.1 * np.eye(N, dtype=np.float32)
    )
    q = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    lo = jnp.asarray(-rng.random((B, N)).astype(np.float32) - 0.1)
    hi = jnp.asarray(rng.random((B, N)).astype(np.float32) + 0.1)
    sign = jnp.asarray(
        np.sign(rng.standard_normal((B, N))).astype(np.float32)
    )
    l_n = jnp.asarray((rng.random((B, NC)) * 0.5 + 0.05).astype(np.float32))
    mu = jnp.asarray((rng.random((B, NC)) * 0.5 + 0.05).astype(np.float32))
    return P, q, lo, hi, sign, l_n, mu


def _solve(kind, prob, cfg):
    P, q, lo, hi, sign, l_n, mu = prob
    if kind == "qp":
        return dq.solve_qp_with_stats(P, q, config=cfg)
    if kind == "box":
        return dq.solve_box_qp_with_stats(P, q, lo, hi, config=cfg)
    if kind == "signed":
        return dq.solve_signed_box_qp_with_stats(
            P, q, lo, hi, sign, config=cfg
        )
    return dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)


@pytest.mark.parametrize("kind", ["qp", "box", "signed", "qcqp"])
def test_compact_matches_single_phase(prob, kind):
    cfg0 = QBASE if kind == "qcqp" else BASE
    l0, st0 = _solve(kind, prob, cfg0)
    assert bool(np.all(np.asarray(st0.converged)))
    for K in (1, 7, 20):
        lK, stK = _solve(kind, prob, cfg0.replace(compact_iters=K))
        assert bool(np.all(np.asarray(stK.converged))), (kind, K)
        # same update rule and rho schedule (it_offset pins the sync-mode
        # update grid to global iterations; without it this bound fails at
        # 2.6e-3). Not bitwise: the resume kernel is a separate
        # compilation whose FMA contraction differs at the ulp level, so
        # trajectories drift ~1 ulp/step - observed max 1.1e-5 here.
        err = float(np.max(np.abs(np.asarray(lK) - np.asarray(l0))))
        assert err < 1e-4, (kind, K, err)
        it = np.asarray(stK.iterations)
        assert int(it.max()) <= cfg0.max_iter
        # iterations accumulate across the phase boundary: converged
        # problems keep their phase-1 count, stragglers add phase-2 steps
        assert int(it.min()) >= 1
        assert np.all(np.isfinite(np.asarray(stK.res_dual))), (kind, K)
        assert np.all(np.asarray(stK.rho) > 0), (kind, K)


def test_compact_gradients_match(prob):
    P, q, lo, hi, sign, l_n, mu = prob

    def loss(cfg):
        def f(q):
            return jnp.sum(dq.solve_qcqp(P, q, l_n, mu, config=cfg) ** 2)
        return f

    g0 = jax.grad(loss(QBASE))(q)
    gK = jax.grad(loss(QBASE.replace(compact_iters=6)))(q)
    # the backward differentiates the SAME KKT system at eps-close
    # solutions; gradients agree to solve tolerance
    scale = float(np.max(np.abs(np.asarray(g0)))) + 1e-12
    assert float(np.max(np.abs(np.asarray(gK - g0)))) / scale < 5e-3


def test_compact_warm_start(prob):
    P, q, lo, hi, sign, l_n, mu = prob
    cfg = QBASE.replace(compact_iters=4)
    l0 = dq.solve_qcqp(P, q, l_n, mu, config=QBASE)
    l1, st = dq.solve_qcqp_with_stats(
        P, q, l_n, mu, warm_start=l0, config=cfg
    )
    assert bool(np.all(np.asarray(st.converged)))
    assert float(np.max(np.abs(np.asarray(l1) - np.asarray(l0)))) < 5e-4


def test_compact_auto_matches_single_phase(prob):
    """compact_iters='auto' (fixed K1=32 boundary + runtime three-way
    lax.cond on the phase-1 survivor stats): same fixed points as the
    single-phase solve on every branch the decision can take."""
    # (a) default distribution: some problems exceed 32 iterations at this
    # eps, exercising the resume branches
    for kind in ("qp", "qcqp"):
        cfg0 = QBASE if kind == "qcqp" else BASE
        l0, st0 = _solve(kind, prob, cfg0)
        lA, stA = _solve(kind, prob, cfg0.replace(compact_iters="auto"))
        assert bool(np.all(np.asarray(stA.converged))), kind
        err = float(np.max(np.abs(np.asarray(lA) - np.asarray(l0))))
        assert err < 1e-4, (kind, err)
        assert int(np.asarray(stA.iterations).max()) <= cfg0.max_iter

    # (b) all-easy: every problem converges inside K1 -> done branch
    # (phase-1 results returned directly); iterations must match the
    # single-phase solve EXACTLY (same kernel, same trajectory). Built
    # well-conditioned (dominant +I diagonal) so the whole batch is
    # comfortably under the K1=32 boundary.
    P, q, lo, hi, sign, l_n, mu = prob
    rng = np.random.default_rng(13)
    S = rng.standard_normal((B, N, N)).astype(np.float32) / np.sqrt(N)
    P_e = jnp.asarray(
        S @ S.transpose(0, 2, 1) + 1.0 * np.eye(N, dtype=np.float32)
    )
    easy = QBASE.replace(eps=1e-5)
    l0, st0 = dq.solve_qcqp_with_stats(P_e, q, l_n, mu, config=easy)
    assert int(np.asarray(st0.iterations).max()) <= 32, "fixture drifted"
    lA, stA = dq.solve_qcqp_with_stats(
        P_e, q, l_n, mu, config=easy.replace(compact_iters="auto")
    )
    assert np.array_equal(np.asarray(lA), np.asarray(l0))
    assert np.array_equal(
        np.asarray(stA.iterations), np.asarray(st0.iterations)
    )

    # (c) auto composes with the rolled factorisation
    lR, stR = dq.solve_qcqp_with_stats(
        P, q, l_n, mu,
        config=QBASE.replace(compact_iters="auto", pallas_rolled="on"),
    )
    lP, _ = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=QBASE)
    assert bool(np.all(np.asarray(stR.converged)))
    assert float(np.max(np.abs(np.asarray(lR) - np.asarray(lP)))) < 1e-4


def test_tune_compact_iters_calibrator():
    """dq.tune_compact_iters: picks K from one solve's iteration stats by
    the measured economics, declines when compaction cannot pay its
    boundary (the no-user-tuning path for production distributions)."""
    rng = np.random.default_rng(0)
    # flagship-like: tight distribution, tile-max ~23 -> decline (the
    # boundary costs ~8 whole-batch iterations; there is no tail to save)
    flag = rng.integers(10, 24, size=4096)
    assert dq.tune_compact_iters(flag, tile_b=512) == 0
    # config-8-like: p50 ~17, 5% stragglers to ~120 spread over every
    # tile -> compact just past the easy mass
    tail = rng.integers(10, 24, size=4096)
    hard = rng.random(4096) < 0.05
    tail[hard] = rng.integers(60, 120, size=int(hard.sum()))
    K = dq.tune_compact_iters(tail, tile_b=512)
    assert 20 <= K <= 40, K
    # single tile: always a no-op
    assert dq.tune_compact_iters(tail[:256], tile_b=512) == 0
    # n-aware: the kernel clamps a requested 512 to narrower tiles as N
    # grows (kernels/layout.py::forward_tile_plan); the calibrator must
    # price the EFFECTIVE tile, not the requested one
    from diffqcqp_tpu.kernels.layout import forward_tile_b

    assert forward_tile_b(96, 512) < 512
    k_req = dq.tune_compact_iters(tail, tile_b=512)
    k_eff = dq.tune_compact_iters(tail, tile_b=512, n=96)
    assert k_eff == dq.tune_compact_iters(
        tail, tile_b=forward_tile_b(96, 512)
    )
    # narrower tiles change the economics (more tiles pay the boundary,
    # finer survivor packing): on this distribution the requested-512 and
    # effective-128 models land on DIFFERENT K (22 vs 23) - pin that the
    # n-aware clamp actually changes the model's answer
    assert k_req != k_eff, (k_req, k_eff)
    # max_iter cap respected (the model may still find a capped win -
    # e.g. a tile-count reduction below the easy mass - but never a K at
    # or above the cap)
    assert dq.tune_compact_iters(tail, tile_b=512, max_iter=15) < 15
    # the calibrated K really solves identically (wiring check, interpret)
    rng2 = np.random.default_rng(7)
    S = rng2.standard_normal((B, N, N)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(N, dtype=np.float32))
    q = jnp.asarray(rng2.standard_normal((B, N)).astype(np.float32))
    l0, st0 = dq.solve_qp_with_stats(P, q, config=BASE)
    K2 = dq.tune_compact_iters(
        st0.iterations, tile_b=BASE.pallas_tile_b, max_iter=BASE.max_iter
    )
    lK, stK = dq.solve_qp_with_stats(
        P, q, config=BASE.replace(compact_iters=max(K2, 5))
    )
    assert bool(np.all(np.asarray(stK.converged)))
    assert float(np.max(np.abs(np.asarray(lK) - np.asarray(l0)))) < 1e-4


def test_compact_invalid_value_raises(prob):
    """A typo'd compact_iters ('Auto', 'on', -3) must fail with a clear
    config error, not an opaque TypeError from inside tracing."""
    for bad in ("Auto", "on", -3):
        with pytest.raises(ValueError, match="compact_iters"):
            _solve("qcqp", prob, QBASE.replace(compact_iters=bad))


def test_compact_edge_cases(prob):
    P, q, lo, hi, sign, l_n, mu = prob
    l0, _ = _solve("qcqp", prob, QBASE)
    # K >= max_iter: compaction disabled, plain solve
    lK, st = _solve("qcqp", prob, QBASE.replace(compact_iters=500))
    assert float(np.max(np.abs(np.asarray(lK) - np.asarray(l0)))) == 0.0
    # single tile (tile_b >= Bp): compaction is a no-op by construction
    big = QBASE.replace(pallas_tile_b=512, compact_iters=5)
    ref = QBASE.replace(pallas_tile_b=512)
    lb, _ = _solve("qcqp", prob, big)
    lr, _ = _solve("qcqp", prob, ref)
    assert float(np.max(np.abs(np.asarray(lb) - np.asarray(lr)))) == 0.0
    # max_iter barely above K: phase 2 gets the remainder and may not
    # converge everything - stats must still be well-formed
    lS, stS = _solve("qcqp", prob, QBASE.replace(compact_iters=3, max_iter=5))
    assert np.all(np.isfinite(np.asarray(stS.res_dual)))
    assert np.asarray(stS.iterations).max() <= 5
