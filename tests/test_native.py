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
    # The native side replicates the reference's regularised-normal-equations
    # Richardson (Solver.cpp:15-44), whose contraction factor
    # mu_ir/(sigma_min^2 + mu_ir) leaves ~1e-3..1e-1 error in the
    # worst-conditioned directions of these saddle-structured adjoint systems
    # after its 10-iteration budget. The JAX side solves the unsquared system
    # exactly by LU (validated against finite differences in test_grads.py).
    # Decisive check: plug both answers into the differentiated-KKT system
    # S^T x = [0; g] - the LU residual must be at machine level and no worse
    # than the reference recipe's.
    b, n = q.shape
    nc = n // 2
    gamma = np.array(r.gamma)
    S = np.zeros((b, nc + n, nc + n))
    pts = l.reshape(b, nc, 2)
    s = (pts**2).sum(-1) - radius**2
    act = (s > -1e-10) & (radius > 1e-10) & (gamma > 1e-10)
    for i in range(b):
        for c in range(nc):
            if act[i, c]:
                S[i, c, c] = s[i, c]
                S[i, c, nc + 2 * c] = gamma[i, c] * 2 * l[i, 2 * c]
                S[i, c, nc + 2 * c + 1] = gamma[i, c] * 2 * l[i, 2 * c + 1]
                S[i, nc + 2 * c, c] = 2 * l[i, 2 * c]
                S[i, nc + 2 * c + 1, c] = 2 * l[i, 2 * c + 1]
            else:
                S[i, c, c] = 1.0
        S[i, nc:, nc:] = P[i]
        for c in range(nc):
            S[i, nc + 2 * c, nc + 2 * c] += 2 * gamma[i, c]
            S[i, nc + 2 * c + 1, nc + 2 * c + 1] += 2 * gamma[i, c]
    rhs = np.concatenate([np.zeros((b, nc)), g], axis=1)

    def residual(dgamma, dl):
        x = np.concatenate([dgamma, dl], axis=1)
        return np.abs(np.einsum("bji,bj->bi", S, x) - rhs).max()

    res_lu = residual(np.array(r.dgamma), np.array(r.dl))
    res_nat = residual(dgamma_nat, dl_nat)
    assert res_lu < 1e-8, f"LU residual too large: {res_lu}"
    assert res_lu <= res_nat + 1e-8, (res_lu, res_nat)


def test_native_test_executable_passes():
    """Build and run the assert-based native harness (the reference's
    `diffsolver` equivalent, native/main.cpp) as part of CI."""
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    subprocess.run(["make", "-s", "diffsolver_test"], cwd=native_dir, check=True)
    out = subprocess.run(
        ["./diffsolver_test"], cwd=native_dir, check=True,
        capture_output=True, text=True,
    )
    assert "ALL OK" in out.stdout
