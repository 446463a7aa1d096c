"""Analytic gradients vs central finite differences.

This is the reference's accuracy oracle (test_script.py:23-43 for QP;
Solver.cpp:830-887 for box/QCQP) turned into assertions. Solves run at
eps=1e-12 in float64 so the FD noise floor stays well below the tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq

CFG = dq.SolverConfig(eps=1e-12, max_iter=50000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-12, max_iter=50000)
FD_EPS = 1e-6


def central_diff(f, args, idx, tol, seed=0):
    """Assert grad(f)(args)[idx] matches central differences entry-wise."""
    grads = jax.grad(f, argnums=idx)(*args)
    for k, ai in enumerate(idx):
        a = args[ai]
        g_num = np.zeros(a.shape)
        flat = np.ndindex(*a.shape)
        for ix in flat:
            d = jnp.zeros_like(a).at[ix].set(FD_EPS)
            plus = list(args)
            plus[ai] = a + d
            minus = list(args)
            minus[ai] = a - d
            g_num[ix] = (float(f(*plus)) - float(f(*minus))) / (2 * FD_EPS)
        np.testing.assert_allclose(
            np.array(grads[k]), g_num, atol=tol, rtol=tol,
            err_msg=f"grad mismatch for arg {ai}",
        )


@pytest.fixture(scope="module")
def qp_problem():
    rng = np.random.default_rng(5)
    n = 2
    S = rng.random((1, n, n)) + 0.01
    P = jnp.array(S @ np.swapaxes(S, 1, 2))
    q = jnp.array(-rng.random((1, n)) - 0.1)
    return P, q


def test_qp_grads(qp_problem):
    P, q = qp_problem

    def f(P, q):
        l = dq.solve_qp(P, q, config=CFG)
        return l[0, 1]

    central_diff(f, [P, q], (0, 1), tol=1e-5)


def test_qp_grads_with_active_constraint():
    # q > 0 in one coordinate forces an active constraint
    P = jnp.array([[[1.0, 0.2], [0.2, 0.5]]])
    q = jnp.array([[0.3, -0.9]])

    def f(P, q):
        return jnp.sum(dq.solve_qp(P, q, config=CFG) ** 2)

    central_diff(f, [P, q], (0, 1), tol=1e-5)


def test_qp_diag_grads():
    d = jnp.array([[0.7, 1.3, 2.0]])
    q = jnp.array([[-0.5, 0.4, -1.0]])

    def f(d, q):
        return jnp.sum(dq.solve_qp(d, q, config=CFG) * jnp.array([1.0, -2.0, 0.5]))

    central_diff(f, [d, q], (0, 1), tol=1e-5)


def test_box_qp_grads():
    rng = np.random.default_rng(7)
    n = 3
    S = rng.random((1, n, n)) + 0.1
    P = jnp.array(S @ np.swapaxes(S, 1, 2) + 0.2 * np.eye(n))
    q = jnp.array(rng.standard_normal((1, n)))
    lo = jnp.array([[-0.5, -0.1, -0.8]])
    hi = jnp.array([[0.2, 0.6, 0.05]])

    def f(P, q, lo, hi):
        l = dq.solve_box_qp(P, q, lo, hi, config=CFG)
        return jnp.sum(l * jnp.array([1.0, -1.5, 2.0]))

    central_diff(f, [P, q, lo, hi], (0, 1, 2, 3), tol=2e-5)


def test_signed_box_qp_grads():
    rng = np.random.default_rng(11)
    n = 3
    S = rng.random((1, n, n)) + 0.1
    P = jnp.array(S @ np.swapaxes(S, 1, 2) + 0.2 * np.eye(n))
    q = jnp.array(rng.standard_normal((1, n)) * 0.7)
    lo = jnp.full((1, n), -1.0)
    hi = jnp.full((1, n), 1.0)
    v = jnp.array([[1.0, -1.0, 1.0]])

    def f(P, q, lo, hi):
        l = dq.solve_signed_box_qp(P, q, lo, hi, v, config=CFG)
        return jnp.sum(l * jnp.array([1.0, 2.0, -0.5]))

    central_diff(f, [P, q, lo, hi], (0, 1), tol=2e-5)


def test_qcqp_grads_active_cone():
    """Active friction cone: gradients flow into P, q, l_n and mu."""
    P = jnp.array([[[1.2, 0.1, 0.0, 0.0],
                    [0.1, 0.9, 0.0, 0.1],
                    [0.0, 0.0, 1.5, 0.2],
                    [0.0, 0.1, 0.2, 1.1]]])
    q = jnp.array([[-1.0, -0.8, -1.4, -0.6]])   # pushes hard into the cones
    l_n = jnp.array([[0.3, 0.25]])
    mu = jnp.array([[0.6, 0.8]])

    def f(P, q, l_n, mu):
        l = dq.solve_qcqp(P, q, l_n, mu, config=QCFG)
        return jnp.sum(l * jnp.array([1.0, -0.5, 0.3, 2.0]))

    # QCQP's relative stopping rule limits FD accuracy; verify cones active
    l = dq.solve_qcqp(P, q, l_n, mu, config=QCFG)
    norms = np.linalg.norm(np.array(l).reshape(1, 2, 2), axis=-1)
    assert np.all(norms > np.array(l_n * mu) - 1e-6), "test requires active cones"
    central_diff(f, [P, q, l_n, mu], (0, 1, 2, 3), tol=5e-5)


def test_qcqp_grads_inactive_cone():
    """Inactive cone: solution = unconstrained minimum; grad_l_n = grad_mu = 0."""
    P = jnp.array([[[2.0, 0.1], [0.1, 1.5]]])
    q = jnp.array([[-0.1, -0.05]])
    l_n = jnp.array([[10.0]])
    mu = jnp.array([[1.0]])

    def f(P, q, l_n, mu):
        l = dq.solve_qcqp(P, q, l_n, mu, config=QCFG)
        return jnp.sum(l * jnp.array([1.0, -0.5]))

    g_ln, g_mu = jax.grad(f, argnums=(2, 3))(P, q, l_n, mu)
    np.testing.assert_allclose(np.array(g_ln), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.array(g_mu), 0.0, atol=1e-12)
    central_diff(f, [P, q, l_n, mu], (0, 1), tol=1e-5)


def test_warm_start_gradient_is_zero(qp_problem):
    P, q = qp_problem
    ws = jnp.full(q.shape, 0.1)
    g = jax.grad(lambda w: jnp.sum(dq.solve_qp(P, q, w, config=CFG)))(ws)
    np.testing.assert_allclose(np.array(g), 0.0, atol=1e-15)
