"""Fused coordinate-constraint backward kernel (QP/box/signed box):
interpret-mode parity with the generic fixed-shape KKT adjoints
(diff/kkt.py, backend='xla'), including tight boxes, inactive problems and
coordinate padding. Mirrors tests/test_qcqp_bwd_kernel.py for the QCQP."""

import numpy as np
import pytest

import jax.numpy as jnp

import diffqcqp_tpu as dq
import diffqcqp_tpu.diff.kkt as K
from diffqcqp_tpu.kernels.coord_bwd_pallas import (
    KIND_BOX,
    KIND_QP,
    KIND_SIGNED_BOX,
    coord_kkt_bwd_fused,
)

CFG = dq.SolverConfig(eps=1e-8, backend="xla")


def _problem(rng, b, n):
    S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
    P = jnp.asarray((S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n)).astype(np.float32))
    q = jnp.asarray((rng.standard_normal((b, n)) * 0.8).astype(np.float32))
    return P, q


@pytest.mark.parametrize("n", [6, 8, 11])
def test_qp_kernel_matches_generic(rng, n):
    b = 12
    P, q = _problem(rng, b, n)
    l = dq.solve_qp(P, q, config=CFG.replace(max_iter=5000))
    g = jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))
    ref = K.qp_vjp(P, q, l, g, CFG)
    (dl,) = coord_kkt_bwd_fused(
        P, q, l, g, None, None, None, KIND_QP,
        eps=CFG.eps, act_eps=CFG.act_eps, interpret=True,
    )
    np.testing.assert_allclose(np.array(dl), np.array(ref), atol=5e-5)


@pytest.mark.parametrize("n,tight", [(6, False), (8, True), (11, False)])
def test_box_kernel_matches_generic(rng, n, tight):
    b = 12
    P, q = _problem(rng, b, n)
    spread = 0.05 if tight else 0.4
    lo = jnp.asarray(-(rng.random((b, n)) * spread + 0.02).astype(np.float32))
    hi = jnp.asarray((rng.random((b, n)) * spread + 0.02).astype(np.float32))
    l = dq.solve_box_qp(P, q, lo, hi, config=CFG.replace(max_iter=5000))
    g = jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))
    ref = K.box_vjp(P, q, lo, hi, l, g, CFG)
    dl, dgamma, gamma = coord_kkt_bwd_fused(
        P, q, l, g, lo, hi, None, KIND_BOX,
        eps=CFG.eps, act_eps=CFG.act_eps, interpret=True,
    )
    np.testing.assert_allclose(np.array(dl), np.array(ref.dl), atol=5e-5)
    np.testing.assert_allclose(
        np.array(dgamma), np.array(ref.dgamma), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=5e-5)


@pytest.mark.parametrize("n", [6, 8])
def test_signed_box_kernel_matches_generic(rng, n):
    b = 12
    P, q = _problem(rng, b, n)
    lo = jnp.asarray(-(rng.random((b, n)) * 0.4 + 0.05).astype(np.float32))
    hi = jnp.asarray((rng.random((b, n)) * 0.4 + 0.05).astype(np.float32))
    v = rng.standard_normal((b, n)).astype(np.float32)
    v[:, 0] = 0.0                       # exercise the zero-sign (no-op) slot
    v = jnp.asarray(v)
    l = dq.solve_signed_box_qp(P, q, lo, hi, v, config=CFG.replace(max_iter=5000))
    g = jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))
    ref = K.signed_box_vjp(P, q, lo, hi, v, l, g, CFG)
    dl, dgamma, gamma = coord_kkt_bwd_fused(
        P, q, l, g, lo, hi, jnp.sign(v), KIND_SIGNED_BOX,
        eps=CFG.eps, act_eps=CFG.act_eps, interpret=True,
    )
    np.testing.assert_allclose(np.array(dl), np.array(ref.dl), atol=5e-5)
    np.testing.assert_allclose(
        np.array(dgamma), np.array(ref.dgamma), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(np.array(gamma), np.array(ref.gamma), atol=5e-5)


def test_end_to_end_gradients_via_backend_flag(rng):
    """backend='pallas' routes the box backward through the fused kernel
    (interpret off-TPU); end-to-end gradients must match backend='xla'."""
    b, n = 8, 6
    P, q = _problem(rng, b, n)
    lo = jnp.asarray(-(rng.random((b, n)) * 0.3 + 0.05).astype(np.float32))
    hi = jnp.asarray((rng.random((b, n)) * 0.3 + 0.05).astype(np.float32))

    import jax

    def loss(P, q, lo, hi, cfg):
        return jnp.sum(dq.solve_box_qp(P, q, lo, hi, config=cfg) ** 2)

    cfg_x = CFG.replace(max_iter=5000)
    cfg_p = cfg_x.replace(backend="pallas")
    g_x = jax.grad(loss, argnums=(0, 1, 2, 3))(P, q, lo, hi, cfg_x)
    g_p = jax.grad(loss, argnums=(0, 1, 2, 3))(P, q, lo, hi, cfg_p)
    for a, b_ in zip(g_p, g_x):
        np.testing.assert_allclose(np.array(a), np.array(b_), atol=5e-4)
