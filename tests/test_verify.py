"""KKT-residual verification oracle (diffqcqp_tpu/verify.py).

The verifier is itself validated here: near-zero residuals on converged
solves of all four problem classes, large residuals on corrupted solutions,
and the underlying refine_solve least-squares recovery against
numpy.linalg.lstsq on the masked selector systems it is reserved for.
"""

import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from diffqcqp_tpu import verify
from diffqcqp_tpu.ops.linalg import refine_solve

CFG = dq.SolverConfig(eps=1e-11, max_iter=20000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=50000)


def _qp_problem(rng, spd, b=12, n=8):
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    return P, q


def test_verify_qp(rng, spd):
    P, q = _qp_problem(rng, spd)
    l = dq.solve_qp(P, q, config=CFG)
    r = verify.check_qp(P, q, l)
    assert float(jnp.max(r.stationarity)) < 1e-7
    assert float(jnp.max(r.primal)) < 1e-10
    assert float(jnp.max(r.complementarity)) < 1e-7
    assert float(jnp.max(r.dual)) < 1e-7


def test_verify_box(rng, spd):
    P, q = _qp_problem(rng, spd)
    lo = jnp.array(-(rng.random(q.shape) * 0.5 + 0.1))
    hi = jnp.array(rng.random(q.shape) * 0.5 + 0.1)
    l = dq.solve_box_qp(P, q, lo, hi, config=CFG)
    r = verify.check_box_qp(P, q, lo, hi, l)
    assert float(jnp.max(r.stationarity)) < 1e-7
    assert float(jnp.max(r.primal)) < 1e-10
    assert float(jnp.max(r.complementarity)) < 1e-7


def test_verify_signed_box(rng, spd):
    P, q = _qp_problem(rng, spd)
    lo = jnp.array(-(rng.random(q.shape) * 0.5 + 0.1))
    hi = jnp.array(rng.random(q.shape) * 0.5 + 0.1)
    v = jnp.array(rng.standard_normal(q.shape))
    l = dq.solve_signed_box_qp(P, q, lo, hi, v, config=CFG)
    r = verify.check_signed_box_qp(P, q, lo, hi, v, l)
    assert float(jnp.max(r.stationarity)) < 1e-7
    assert float(jnp.max(r.primal)) < 1e-10
    assert float(jnp.max(r.complementarity)) < 1e-7


def test_verify_qcqp(rng, spd):
    b, nc = 12, 4
    P, q = _qp_problem(rng, spd, b=b, n=2 * nc)
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    l = dq.solve_qcqp(P, q, l_n, mu, config=QCFG)
    r = verify.check_qcqp(P, q, l_n, mu, l)
    assert float(jnp.max(r.stationarity)) < 1e-6
    assert float(jnp.max(r.primal)) < 1e-8
    assert float(jnp.max(r.complementarity)) < 1e-6


def test_verify_detects_corruption(rng, spd):
    P, q = _qp_problem(rng, spd)
    l = dq.solve_qp(P, q, config=CFG)
    bad = l + 0.5
    r = verify.check_qp(P, q, bad)
    assert float(jnp.max(r.stationarity)) > 1e-2


def _assert_bound(P, q, l, stats, check, margin=2.0):
    r = check(l)
    bound = np.asarray(verify.stationarity_bound(P, q, l, stats))
    stat = np.asarray(r.stationarity)
    assert np.all(stat <= margin * bound), (
        f"stationarity exceeds ADMM optimality bound: "
        f"max ratio {np.max(stat / bound):.3f}"
    )
    return stat, bound


def test_stationarity_bound_all_classes(rng, spd):
    """The returned iterate's f64 stationarity is within the per-problem
    ADMM optimality bound computed from SolveStats alone - for every class,
    at a LOOSE eps where the residuals (and hence the bound) are far above
    the noise floor, so the identity itself is what is being checked."""
    cfg = dq.SolverConfig(eps=1e-5, max_iter=5000)
    qcfg = dq.QCQP_DEFAULTS.replace(eps=1e-5, max_iter=5000)
    b, nc = 16, 4
    n = 2 * nc
    P, q = _qp_problem(rng, spd, b=b, n=n)
    lo = jnp.array(-(rng.random((b, n)) * 0.5 + 0.1))
    hi = jnp.array(rng.random((b, n)) * 0.5 + 0.1)
    v = jnp.array(rng.standard_normal((b, n)))
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)

    l, st = dq.solve_qp_with_stats(P, q, config=cfg)
    _assert_bound(P, q, l, st, lambda l: verify.check_qp(P, q, l))
    l, st = dq.solve_box_qp_with_stats(P, q, lo, hi, config=cfg)
    _assert_bound(P, q, l, st, lambda l: verify.check_box_qp(P, q, lo, hi, l))
    l, st = dq.solve_signed_box_qp_with_stats(P, q, lo, hi, v, config=cfg)
    _assert_bound(
        P, q, l, st, lambda l: verify.check_signed_box_qp(P, q, lo, hi, v, l)
    )
    l, st = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=qcfg)
    _assert_bound(
        P, q, l, st, lambda l: verify.check_qcqp(P, q, l_n, mu, l)
    )


def test_stationarity_bound_capped_solve(rng, spd):
    """The bound is a per-ITERATION identity, so it must hold even for a
    max_iter-capped, far-from-converged solve with large residuals."""
    cfg = dq.SolverConfig(eps=1e-12, max_iter=3)
    P, q = _qp_problem(rng, spd)
    l, st = dq.solve_qp_with_stats(P, q, config=cfg)
    assert not bool(np.any(np.asarray(st.converged)))
    stat, bound = _assert_bound(
        P, q, l, st, lambda l: verify.check_qp(P, q, l)
    )
    assert np.max(stat) > 1e-6   # genuinely unconverged: the check is live


def test_stats_rho_positive_and_frozen(rng, spd):
    """SolveStats.rho: positive, finite, and the one the final residuals
    were computed with (converged problems freeze rho with the iterate)."""
    P, q = _qp_problem(rng, spd)
    _, st = dq.solve_qp_with_stats(P, q, config=CFG)
    rho = np.asarray(st.rho)
    assert np.all(rho > 0) and np.all(np.isfinite(rho))


def test_stats_rho_is_residual_consistent_on_capped_solve(rng, spd):
    """The residual-consistency contract on the adversarial case: a
    max_iter cap landing EXACTLY on a rho-update iteration. The carry rho
    leaves that iteration already multiplied by tau (was measured up to
    16x the residuals' rho before the rho_res fix); the stats field must
    be the one that produced res_dual, i.e. res_dual/rho == res_dual/rho
    of the max_iter-1 run's last recorded iteration's penalty."""
    P, q = _qp_problem(rng, spd)
    # eps=0: nothing converges, every problem runs to the cap; period=24
    # puts an update exactly on the last executed iteration (it=24).
    cfg = CFG.replace(eps=1e-30, stall_tol=0.0, max_iter=25,
                      rho_update_period=24)
    _, st25 = dq.solve_qp_with_stats(P, q, config=cfg)
    # one iteration earlier the update cannot have fired yet
    _, st24 = dq.solve_qp_with_stats(P, q, config=cfg.replace(max_iter=24))
    r25, r24 = np.asarray(st25.rho), np.asarray(st24.rho)
    # the it=24 residuals were computed with the penalty as of entry to
    # it=24, which is the (unchanged since) penalty recorded at it=23
    np.testing.assert_allclose(r25, r24, rtol=1e-6)


def test_refine_solve_matches_lstsq_on_selector_system(rng):
    """refine_solve on the masked-selector least-squares systems it is
    reserved for (near-diagonal normal matrix): matches numpy's lstsq."""
    b, n, m = 6, 8, 16
    A = np.zeros((b, n, m))
    for i in range(b):
        for r in range(n):
            # at most one active selector column per row (disjoint support,
            # the regime verify.py uses refine_solve in): lower, upper or none
            pick = rng.integers(0, 3)
            if pick == 0:
                A[i, r, r] = 1.0
            elif pick == 1:
                A[i, r, n + r] = -1.0
    rhs = rng.standard_normal((b, n))
    x = np.array(refine_solve(jnp.array(A), jnp.array(rhs), mu_ir=1e-12, iters=5))
    for i in range(b):
        expect, *_ = np.linalg.lstsq(A[i], rhs[i], rcond=None)
        np.testing.assert_allclose(x[i], expect, atol=1e-8)
