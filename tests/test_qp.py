"""Forward-solve correctness for the non-negative QP.

Oracles (SURVEY.md section 4 - the test layer the reference lacks):
  * closed form for diagonal P: l* = max(0, -q/diag)
  * KKT residual assertions (stationarity / feasibility / complementarity)
  * solution parity with the NumPy transcription of the reference recipe
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from tests import np_reference as ref

CFG = dq.SolverConfig(eps=1e-10, max_iter=5000)


def kkt_residuals_qp(P, q, l):
    """-> (stationarity on free set, feasibility violation, complementarity)."""
    Plq = np.einsum("bij,bj->bi", P, l) + q
    free = l > 1e-9
    stat = np.abs(np.where(free, Plq, 0.0)).max()
    feas = np.maximum(-l, 0.0).max()
    comp = np.abs(l * np.minimum(Plq, 0.0)).max()
    return stat, feas, comp


def test_qp_diagonal_closed_form(rng):
    b, n = 16, 8
    d = rng.random((b, n)) + 0.1
    q = rng.standard_normal((b, n))
    l = np.array(dq.solve_qp(jnp.array(d), jnp.array(q), config=CFG))
    expected = np.maximum(0.0, -q / d)
    np.testing.assert_allclose(l, expected, atol=1e-7)


def test_qp_dense_kkt(rng, spd):
    b, n = 8, 12
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    l, stats = dq.solve_qp_with_stats(jnp.array(P), jnp.array(q), config=CFG)
    assert bool(np.all(stats.converged))
    stat, feas, comp = kkt_residuals_qp(P, q, np.array(l))
    assert stat < 1e-6
    assert feas == 0.0
    assert comp < 1e-6


def test_qp_matches_reference_recipe(rng, spd):
    b, n = 6, 8
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    cfg = CFG.replace(lmax_method="power", power_iters=10, rho_sync=False)
    l = np.array(dq.solve_qp(jnp.array(P), jnp.array(q), config=cfg))
    for i in range(b):
        l_ref, _, _, _ = ref.solve_qp(P[i], q[i], eps=1e-10, max_iter=5000)
        np.testing.assert_allclose(l[i], l_ref, atol=1e-7)


def test_qp_ill_conditioned_exp_diag(rng):
    """Scaled-down version of the reference benchmark's pathological
    conditioning (test_script.py:144-149 squares an exp(U(-10,10)) diagonal
    twice, condition ~e^80 - unverifiable at any absolute eps; e^20 here
    still gives condition ~5e8)."""
    b, n = 4, 8
    d = np.exp(rng.uniform(-2.5, 2.5, (b, n)))
    d4 = d**4
    P = np.eye(n) * d4[:, None, :]
    q = rng.uniform(-1, 1, (b, n))
    cfg = CFG.replace(max_iter=200000)
    l, stats = dq.solve_qp_with_stats(jnp.array(P), jnp.array(q), config=cfg)
    assert bool(np.all(stats.converged))
    expected = np.maximum(0.0, -q / d4)
    np.testing.assert_allclose(np.array(l), expected, atol=1e-5, rtol=1e-6)


def test_qp_warm_start_reaches_same_solution(rng, spd):
    b, n = 4, 6
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_cold, s_cold = dq.solve_qp_with_stats(P, q, config=CFG)
    l_warm, s_warm = dq.solve_qp_with_stats(P, q, warm_start=l_cold, config=CFG)
    np.testing.assert_allclose(np.array(l_warm), np.array(l_cold), atol=1e-7)
    assert int(s_warm.iterations.max()) <= int(s_cold.iterations.max())


def test_qp_stats_report_cap(rng, spd):
    P = jnp.array(spd(rng, 2, 6))
    q = jnp.array(rng.standard_normal((2, 6)))
    _, stats = dq.solve_qp_with_stats(P, q, config=CFG.replace(max_iter=3))
    assert not bool(np.any(stats.converged))
    np.testing.assert_array_equal(np.array(stats.iterations), [3, 3])


def test_qp_jit_and_vmap_compose(rng, spd):
    P = jnp.array(spd(rng, 4, 6))
    q = jnp.array(rng.standard_normal((4, 6)))
    f = jax.jit(lambda P, q: dq.solve_qp(P, q, config=CFG))
    np.testing.assert_allclose(
        np.array(f(P, q)), np.array(dq.solve_qp(P, q, config=CFG)), atol=1e-12
    )
