"""Fused Schur-complement QCQP backward kernel: interpret-mode parity with
the generic fixed-shape KKT adjoint (diff/kkt.py::qcqp_vjp, backend='xla'),
including inactive contacts, degenerate radii and coordinate padding."""

import numpy as np
import pytest

import jax.numpy as jnp

import diffqcqp_tpu as dq
import diffqcqp_tpu.diff.kkt as K
from diffqcqp_tpu.config import QCQP_DEFAULTS
from diffqcqp_tpu.kernels.qcqp_bwd_pallas import qcqp_kkt_bwd_pallas

CFG = QCQP_DEFAULTS.replace(eps=1e-8, backend="xla")


def _problem(rng, b, nc, zero_radius_frac=0.0):
    n = 2 * nc
    S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
    P = jnp.asarray((S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n)).astype(np.float32))
    q = jnp.asarray((rng.standard_normal((b, n)) * 0.5).astype(np.float32))
    l_n = (rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32)
    if zero_radius_frac:
        mask = rng.random((b, nc)) < zero_radius_frac
        l_n = np.where(mask, 0.0, l_n)
    mu = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))
    return P, q, jnp.asarray(l_n), mu


@pytest.mark.parametrize("nc,zero_frac", [(3, 0.0), (4, 0.3), (5, 0.0)])
def test_schur_matches_generic(rng, nc, zero_frac):
    b = 12
    P, q, l_n, mu = _problem(rng, b, nc, zero_frac)
    radius = l_n * mu
    l = dq.solve_qcqp(P, q, l_n, mu, eps=1e-9, max_iter=5000)
    g = jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))

    ref = K.qcqp_vjp(P, q, radius, l, g, CFG)

    duals = K.qcqp_dual(P, q, radius, l, CFG)
    s, active = K.qcqp_strict_active(l, radius, duals.gamma, CFG)
    dgam, dl = qcqp_kkt_bwd_pallas(
        P, l, g, duals.gamma, s, active, interpret=True
    )
    np.testing.assert_allclose(np.array(dl), np.array(ref.dl), atol=5e-5)
    np.testing.assert_allclose(np.array(dgam), np.array(ref.dgamma), atol=2e-4)


@pytest.mark.parametrize("nc,zero_frac", [(3, 0.0), (4, 0.3)])
def test_fused_dual_plus_schur_matches_generic(rng, nc, zero_frac):
    """The fully-fused variant (dual recovery in-kernel) must agree with the
    generic path on (dl, dgamma, gamma)."""
    from diffqcqp_tpu.kernels.qcqp_bwd_pallas import qcqp_kkt_bwd_fused

    b = 12
    P, q, l_n, mu = _problem(rng, b, nc, zero_frac)
    radius = l_n * mu
    l = dq.solve_qcqp(P, q, l_n, mu, eps=1e-9, max_iter=5000)
    g = jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))

    ref = K.qcqp_vjp(P, q, radius, l, g, CFG)
    dgam, dl, gamma = qcqp_kkt_bwd_fused(
        P, q, l, g, radius,
        eps=CFG.eps, act_eps=CFG.act_eps,
        stall_ulps=8.0 * float(jnp.finfo(jnp.float32).eps),
        interpret=True,
    )
    np.testing.assert_allclose(np.array(dl), np.array(ref.dl), atol=5e-5)
    np.testing.assert_allclose(np.array(dgam), np.array(ref.dgamma), atol=2e-4)
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=1e-4)
