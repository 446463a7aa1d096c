"""Opt-in accelerated ADMM (SolverConfig.accel) - fast-ADMM momentum with
per-problem adaptive restart (VERDICT r2 item 1's last untried option).

The measured economics are a NEGATIVE result on the tuned pipeline (see
SolverConfig.accel / DESIGN.md section 8): momentum only wins in the
vanilla alpha=1 fixed-rho regime. These tests pin (a) that win, (b) that
the accelerated solve reaches the same solution, and (c) the dispatch
guard - so the knob cannot rot into silently-wrong behavior.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq


def _qcqp_problems(rng, b=64, nc=6):
    """The flagship benchmark generator (Wishart/sqrt(n) + 0.1 I). NOTE the
    conftest `spd` fixture omits the 1/sqrt(n) and is much better
    conditioned - there the vanilla-regime momentum win does NOT hold
    (measured 34 -> 38 mean iterations at nc=6): the benefit is
    distribution-dependent even in its home regime, which is exactly why
    the knob is opt-in."""
    n = 2 * nc
    s = rng.standard_normal((b, n, n)).astype(np.float32) / np.sqrt(n)
    P = jnp.asarray(s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray((rng.standard_normal((b, n)) * 0.5).astype(np.float32))
    l_n = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))
    mu = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))
    return P, q, l_n, mu


def test_accel_same_solution_and_vanilla_win(rng):
    # seeded flagship distribution: plain 43.3 / accel 31.1 mean iterations
    P, q, l_n, mu = _qcqp_problems(rng, b=256, nc=12)
    base = dq.QCQP_DEFAULTS.replace(
        eps=1e-7, max_iter=2000, backend="xla",
        alpha_relax=1.0, adaptive_rho=False,
    )
    l0, st0 = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=base)
    l1, st1 = dq.solve_qcqp_with_stats(
        P, q, l_n, mu, config=base.replace(accel=True)
    )
    assert bool(np.all(np.array(st0.converged)))
    assert bool(np.all(np.array(st1.converged)))
    # same fixed point (both at the eps=1e-7 f32 solve tolerance)
    np.testing.assert_allclose(np.array(l0), np.array(l1), atol=5e-5)
    # the momentum win in its home regime (measured ~28% at batch scale;
    # demand >= 10% so distribution noise cannot flake the assert)
    it0 = float(np.mean(np.array(st0.iterations)))
    it1 = float(np.mean(np.array(st1.iterations)))
    assert it1 < 0.9 * it0, (it0, it1)


def test_accel_nonneg_qp_gradients_match_plain(rng, spd):
    """The custom_vjp differentiates the PROBLEM at the returned solution,
    so plain and accelerated solves must give matching gradients."""
    import jax

    b, n = 8, 6
    P = jnp.asarray(np.asarray(spd(rng, b, n), np.float64))
    q = jnp.asarray(rng.standard_normal((b, n)))
    base = dq.QP_DEFAULTS.replace(
        eps=1e-10, max_iter=5000, backend="xla",
        alpha_relax=1.0, adaptive_rho=False,
    )

    def loss(cfg):
        return lambda P, q: jnp.sum(
            dq.solve_qp(P, q, config=cfg) ** 2
        )

    g0 = jax.grad(loss(base), argnums=(0, 1))(P, q)
    g1 = jax.grad(loss(base.replace(accel=True)), argnums=(0, 1))(P, q)
    np.testing.assert_allclose(np.array(g0[0]), np.array(g1[0]), atol=1e-7)
    np.testing.assert_allclose(np.array(g0[1]), np.array(g1[1]), atol=1e-7)


def test_accel_rejects_pallas_backend(rng, spd):
    P = jnp.asarray(np.asarray(spd(rng, 4, 8), np.float32))
    q = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    cfg = dq.QP_DEFAULTS.replace(backend="pallas", accel=True)
    with pytest.raises(ValueError, match="accel"):
        dq.solve_qp(P, q, config=cfg)


def test_accel_capped_returns_plain_iterate(rng):
    """A max_iter-capped accelerated solve must return the PLAIN iterate,
    not the momentum-extrapolated restart point (which can sit outside
    the constraint set)."""
    b, nc = 16, 4
    P, q, l_n, mu = _qcqp_problems(rng, b=b, nc=nc)
    cfg = dq.QCQP_DEFAULTS.replace(
        eps=1e-12, max_iter=7, backend="xla", stall_tol=0.0,
        alpha_relax=1.0, adaptive_rho=False, accel=True,
    )
    l, st = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)
    assert not bool(np.any(np.array(st.converged)))
    # plain iterates are prox outputs: feasible for the cone constraints
    pts = np.array(l).reshape(b, nc, 2)
    nrm = np.sqrt((pts ** 2).sum(-1))
    radii = np.array(l_n) * np.array(mu)
    assert np.all(nrm <= radii * (1 + 1e-5))


def test_accel_warns_when_stacked_on_adaptive_schedule(rng, spd):
    """accel + (adaptive_rho or alpha_relax != 1) is measured-harmful
    (DESIGN.md section 8); the API warns (not raises - the combination
    must stay measurable) once per call site."""
    import warnings

    P = jnp.asarray(np.asarray(spd(rng, 4, 6), np.float64))
    q = jnp.asarray(rng.standard_normal((4, 6)))
    bad = dq.QP_DEFAULTS.replace(accel=True, backend="xla")  # adaptive_rho on
    with pytest.warns(UserWarning, match="measured-harmful"):
        dq.solve_qp(P, q, config=bad, max_iter=50)
    good = bad.replace(adaptive_rho=False, alpha_relax=1.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dq.solve_qp(P, q, config=good, max_iter=50)
