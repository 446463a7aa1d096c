"""Public on-device dual recovery / derivative surface (diffqcqp_tpu.duals).

The reference exposes multipliers and raw KKT-derivative solves to users
(pybindings.cpp:24-71); these tests pin the TPU framework's equivalent:

  * f64 agreement between the closed-form working-precision recovery and
    verify.py's independent least-squares (refine_solve) recovery;
  * the *_derivatives surfaces assemble to exactly the gradients the
    custom_vjp solvers return (the reference recipe qcqp.py:45-52,
    :167-181);
  * f32 robustness of the scale-aware activity floors (a rounded binding
    slot keeps its multiplier);
  * layout pass-through (unbatched in -> unbatched out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu import verify


def _qcqp_problem(rng, b, nc, dtype=np.float64):
    n = 2 * nc
    s = rng.standard_normal((b, n, n)).astype(dtype) / np.sqrt(n)
    P = jnp.asarray(s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=dtype))
    q = jnp.asarray((rng.standard_normal((b, n)) * 1.0).astype(dtype))
    l_n = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(dtype))
    mu = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(dtype))
    return P, q, l_n, mu


# --------------------------------------------------------------------------
# f64 agreement with verify.py's independent LS recovery
# --------------------------------------------------------------------------

def test_qp_duals_match_verify(rng, spd):
    b, n = 12, 8
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)))
    l = dq.solve_qp(P, q, eps=1e-11)
    gamma = dq.recover_qp_duals(P, q, l)
    ref = verify.check_qp(P, q, l)
    assert bool(np.any(np.array(gamma) > 1e-3)), "no active slot - vacuous"
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=1e-7)
    assert np.all(np.array(gamma) >= 0.0)  # standard convention


def test_box_duals_match_verify(rng, spd):
    b, n = 12, 8
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.3)
    hi = jnp.asarray(rng.random((b, n)) * 0.3)
    l = dq.solve_box_qp(P, q, lo, hi, eps=1e-11)
    d = dq.recover_box_qp_duals(P, q, lo, hi, l)
    ref = verify.check_box_qp(P, q, lo, hi, l)
    got = np.concatenate([np.array(d.gamma_lo), np.array(d.gamma_hi)], axis=-1)
    assert bool(np.any(got > 1e-3)), "no active slot - vacuous"
    np.testing.assert_allclose(got, np.array(ref.gamma), atol=1e-7)


def test_signed_box_duals_match_verify(rng, spd):
    b, n = 12, 8
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.5 - 0.2)
    hi = jnp.asarray(rng.random((b, n)) * 0.5 + 0.2)
    v = jnp.asarray(rng.standard_normal((b, n)))
    l = dq.solve_signed_box_qp(P, q, lo, hi, v, eps=1e-11)
    d = dq.recover_signed_box_qp_duals(P, q, lo, hi, v, l)
    ref = verify.check_signed_box_qp(P, q, lo, hi, v, l)
    got = np.concatenate(
        [np.array(d.gamma_lo), np.array(d.gamma_hi), np.array(d.gamma_sign)],
        axis=-1,
    )
    assert bool(np.any(got > 1e-3)), "no active slot - vacuous"
    np.testing.assert_allclose(got, np.array(ref.gamma), atol=1e-7)


def test_qcqp_duals_match_verify(rng):
    b, nc = 12, 4
    P, q, l_n, mu = _qcqp_problem(rng, b, nc)
    l = dq.solve_qcqp(P, q, l_n, mu, eps=1e-11)
    gamma = dq.recover_qcqp_duals(P, q, l_n, mu, l)
    ref = verify.check_qcqp(P, q, l_n, mu, l)
    # both sides use the squared-slack convention c = ||l_(i)||^2 - r_i^2
    # (Jacobian column 2 l_(i), Solver.cpp:590-591) - direct comparison.
    assert bool(np.any(np.array(gamma) > 1e-3)), "no active contact - vacuous"
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=1e-6)
    assert np.all(np.array(gamma) >= 0.0)


# --------------------------------------------------------------------------
# derivative surfaces == the solver's custom_vjp gradients
# --------------------------------------------------------------------------

def test_qp_derivatives_assemble_to_solver_grads(rng, spd):
    b, n = 8, 6
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)))
    g = jnp.asarray(rng.standard_normal((b, n)))
    l, vjp_fn = jax.vjp(lambda q_: dq.solve_qp(P, q_, eps=1e-11), q)
    (grad_q,) = vjp_fn(g)
    dl = dq.qp_derivatives(P, q, l, g)
    np.testing.assert_allclose(np.array(grad_q), -np.array(dl), atol=1e-9)


def test_box_derivatives_assemble_to_solver_grads(rng, spd):
    b, n = 8, 6
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.3)
    hi = jnp.asarray(rng.random((b, n)) * 0.3)
    g = jnp.asarray(rng.standard_normal((b, n)))
    l, vjp_fn = jax.vjp(
        lambda lo_, hi_: dq.solve_box_qp(P, q, lo_, hi_, eps=1e-11), lo, hi
    )
    grad_lo, grad_hi = vjp_fn(g)
    d = dq.box_qp_derivatives(P, q, lo, hi, l, g)
    np.testing.assert_allclose(
        np.array(grad_lo), -np.array(d.gamma_lo) * np.array(d.dgamma_lo),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.array(grad_hi), np.array(d.gamma_hi) * np.array(d.dgamma_hi),
        atol=1e-9,
    )


def test_qcqp_derivatives_assemble_to_solver_grads(rng):
    b, nc = 8, 3
    P, q, l_n, mu = _qcqp_problem(rng, b, nc)
    g = jnp.asarray(rng.standard_normal((b, 2 * nc)))
    l, vjp_fn = jax.vjp(
        lambda ln_, mu_: dq.solve_qcqp(P, q, ln_, mu_, eps=1e-11), l_n, mu
    )
    grad_ln, grad_mu = vjp_fn(g)
    d = dq.qcqp_derivatives(P, q, l_n, mu, l, g)
    np.testing.assert_allclose(
        np.array(grad_ln), np.array(d.e2) * np.array(d.dgamma), atol=1e-9
    )
    np.testing.assert_allclose(
        np.array(grad_mu), np.array(d.e1) * np.array(d.dgamma), atol=1e-9
    )
    # grad_q parity too (solver differentiates q via -dl)
    _, vjp_q = jax.vjp(lambda q_: dq.solve_qcqp(P, q_, l_n, mu, eps=1e-11), q)
    (grad_q,) = vjp_q(g)
    np.testing.assert_allclose(np.array(grad_q), -np.array(d.dl), atol=1e-9)


def test_signed_box_derivatives_run_and_mask(rng, spd):
    b, n = 6, 6
    P = jnp.asarray(spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.5 - 0.2)
    hi = jnp.asarray(rng.random((b, n)) * 0.5 + 0.2)
    v = jnp.asarray(rng.standard_normal((b, n)))
    g = jnp.asarray(rng.standard_normal((b, n)))
    l = dq.solve_signed_box_qp(P, q, lo, hi, v, eps=1e-11)
    d = dq.signed_box_qp_derivatives(P, q, lo, hi, v, l, g)
    # dgamma vanishes wherever gamma does (inactive slots decouple)
    for dg, gam in [
        (d.dgamma_lo, d.gamma_lo),
        (d.dgamma_hi, d.gamma_hi),
        (d.dgamma_sign, d.gamma_sign),
    ]:
        assert np.all(np.array(dg)[np.array(gam) == 0.0] == 0.0)
    assert np.all(np.isfinite(np.array(d.dl)))


# --------------------------------------------------------------------------
# f32 robustness + layouts
# --------------------------------------------------------------------------

def test_f32_rounded_solution_keeps_multipliers(rng):
    """A binding contact of an f32 solution sits O(eps_f32 * r) off the
    boundary; the scale-aware floor must keep its multiplier while
    act_floor=0 (reference absolute-eps semantics) loses it."""
    b, nc = 8, 3
    P, q, l_n, mu = _qcqp_problem(rng, b, nc, dtype=np.float64)
    l = dq.solve_qcqp(P, q, l_n, mu, eps=1e-11)
    g64 = np.array(dq.recover_qcqp_duals(P, q, l_n, mu, l))
    binding = g64 > 1e-3
    assert binding.any(), "no binding contact - vacuous"
    # f32-quantise the solution (exactly what a TPU solve hands back)
    l32 = jnp.asarray(np.array(l, np.float32))
    P32, q32 = jnp.asarray(np.array(P, np.float32)), jnp.asarray(np.array(q, np.float32))
    ln32, mu32 = jnp.asarray(np.array(l_n, np.float32)), jnp.asarray(np.array(mu, np.float32))
    g32 = np.array(dq.recover_qcqp_duals(P32, q32, ln32, mu32, l32))
    np.testing.assert_allclose(g32[binding], g64[binding], rtol=2e-3)
    g32_abs = np.array(
        dq.recover_qcqp_duals(P32, q32, ln32, mu32, l32, act_floor=0.0)
    )
    # absolute-eps gates lose at least one rounded binding contact
    assert (g32_abs[binding] == 0.0).any()


def test_unbatched_layout_roundtrip(rng, spd):
    n = 6
    P = jnp.asarray(spd(rng, 1, n)[0])
    q = jnp.asarray(rng.standard_normal(n))
    l = dq.solve_qp(P, q, eps=1e-11)
    gamma = dq.recover_qp_duals(P, q, l)
    assert gamma.shape == (n,)
    dl = dq.qp_derivatives(P, q, l, jnp.ones(n))
    assert dl.shape == (n,)


def test_diagonal_P_duals(rng):
    b, n = 6, 5
    P = jnp.asarray(rng.random((b, n)) + 0.5)       # diagonal batch
    q = jnp.asarray(rng.standard_normal((b, n)))
    l = dq.solve_qp(P, q, eps=1e-11)
    gamma = dq.recover_qp_duals(P, q, l)
    ref = verify.check_qp(P, q, l)
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=1e-7)
