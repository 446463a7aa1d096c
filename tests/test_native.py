"""Cross-validation of the JAX solvers against the native host solver.

The native library (native/host_solver.cpp) implements the same ADMM recipe
in double precision with the reference's operating characteristics (Cholesky
factorisation + explicit inverse, per-problem scalar loop). Agreement between
two implementations that share no code is strong evidence both implement the
documented math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.diff import kkt

hs = pytest.importorskip("diffqcqp_tpu.native.host_solver")
if not hs.available():
    pytest.skip("native host solver not built (make -C native)", allow_module_level=True)

CFG = dq.SolverConfig(eps=1e-10, max_iter=10000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-10, max_iter=30000)


@pytest.fixture(scope="module")
def problems():
    rng = np.random.default_rng(42)
    b, n = 6, 8
    S = rng.standard_normal((b, n, n))
    P = S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n)
    q = rng.standard_normal((b, n))
    return P, q


def test_qp_forward_parity(problems):
    P, q = problems
    l_jax = np.array(dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG))
    res = hs.solve_qp_batch(P, q, eps=1e-10, max_iter=10000)
    assert res.converged.all()
    np.testing.assert_allclose(l_jax, res.l, atol=1e-7)


def test_box_forward_parity(problems):
    P, q = problems
    rng = np.random.default_rng(1)
    lo = -(rng.random(q.shape) + 0.2)
    hi = rng.random(q.shape) + 0.2
    l_jax = np.array(
        dq.solve_box_qp(jnp.array(P), jnp.array(q), jnp.array(lo), jnp.array(hi), config=CFG)
    )
    res = hs.solve_box_qp_batch(P, q, lo, hi, eps=1e-10, max_iter=10000)
    np.testing.assert_allclose(l_jax, res.l, atol=1e-7)


def test_signed_box_forward_parity(problems):
    P, q = problems
    rng = np.random.default_rng(2)
    lo = -(rng.random(q.shape) + 0.2)
    hi = rng.random(q.shape) + 0.2
    v = rng.standard_normal(q.shape)
    l_jax = np.array(
        dq.solve_signed_box_qp(
            jnp.array(P), jnp.array(q), jnp.array(lo), jnp.array(hi), jnp.array(v), config=CFG
        )
    )
    res = hs.solve_signed_box_qp_batch(P, q, lo, hi, v, eps=1e-10, max_iter=10000)
    np.testing.assert_allclose(l_jax, res.l, atol=1e-7)


def test_qcqp_forward_parity(problems):
    P, q = problems
    rng = np.random.default_rng(3)
    b, n = q.shape
    nc = n // 2
    l_n = rng.random((b, nc)) * 0.5 + 0.05
    mu = rng.random((b, nc)) * 0.5 + 0.05
    l_jax = np.array(
        dq.solve_qcqp(jnp.array(P), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=QCFG)
    )
    res = hs.solve_qcqp_batch(P, q, l_n, mu, eps=1e-10, max_iter=30000)
    assert res.converged.all()
    np.testing.assert_allclose(l_jax, res.l, atol=1e-6)


def test_qp_backward_parity(problems):
    P, q = problems
    l = np.array(dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG))
    rng = np.random.default_rng(4)
    g = rng.standard_normal(q.shape)
    dl_jax = np.array(kkt.qp_vjp(jnp.array(P), jnp.array(q), jnp.array(l), jnp.array(g), CFG))
    dl_nat = hs.qp_backward_batch(P, q, l, g, eps=1e-10)
    np.testing.assert_allclose(dl_jax, dl_nat, atol=1e-7)


def test_qcqp_backward_parity(problems):
    P, q = problems
    rng = np.random.default_rng(5)
    b, n = q.shape
    nc = n // 2
    l_n = rng.random((b, nc)) * 0.5 + 0.05
    mu = rng.random((b, nc)) * 0.5 + 0.05
    radius = l_n * mu
    l = np.array(
        dq.solve_qcqp(jnp.array(P), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=QCFG)
    )
    g = rng.standard_normal(q.shape)
    r = kkt.qcqp_vjp(jnp.array(P), jnp.array(q), jnp.array(radius), jnp.array(l), jnp.array(g), QCFG)
    dgamma_nat, dl_nat, gamma_nat = hs.qcqp_backward_batch(P, q, radius, l, g, eps=1e-10)
    np.testing.assert_allclose(np.array(r.gamma), gamma_nat, atol=1e-6)
    np.testing.assert_allclose(np.array(r.dl), dl_nat, atol=1e-6)
    np.testing.assert_allclose(np.array(r.dgamma), dgamma_nat, atol=1e-6)
