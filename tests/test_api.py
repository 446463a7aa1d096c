"""API-surface tests: shape handling, dtypes, stats plumbing."""

import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq

CFG = dq.SolverConfig(eps=1e-10, max_iter=2000)


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(3)
    b, n = 3, 4
    S = rng.standard_normal((b, n, n))
    P = S @ np.swapaxes(S, 1, 2) + 0.1 * np.eye(n)
    q = rng.standard_normal((b, n))
    return P, q


def test_column_vector_layout(prob):
    """(B, N, 1) column vectors, the reference's torch layout (qcqp.py:28)."""
    P, q = prob
    l_flat = dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG)
    l_col = dq.solve_qp(jnp.array(P), jnp.array(q)[..., None], config=CFG)
    assert l_col.shape == q.shape + (1,)
    np.testing.assert_allclose(np.array(l_col)[..., 0], np.array(l_flat), atol=1e-12)


def test_unbatched(prob):
    P, q = prob
    l_b = dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG)
    l_u = dq.solve_qp(jnp.array(P[0]), jnp.array(q[0]), config=CFG)
    assert l_u.shape == (q.shape[1],)
    np.testing.assert_allclose(np.array(l_u), np.array(l_b)[0], atol=1e-12)


def test_unbatched_stats(prob):
    P, q = prob
    _, stats = dq.solve_qp_with_stats(jnp.array(P[0]), jnp.array(q[0]), config=CFG)
    assert stats.iterations.shape == ()
    assert bool(stats.converged)


def test_shared_P_broadcast(prob):
    P, q = prob
    l = dq.solve_qp(jnp.array(P[0]), jnp.array(q), config=CFG)
    assert l.shape == q.shape
    for i in range(q.shape[0]):
        l_i = dq.solve_qp(jnp.array(P[0]), jnp.array(q[i]), config=CFG)
        np.testing.assert_allclose(np.array(l)[i], np.array(l_i), atol=1e-12)


def test_diag_matches_dense(prob):
    _, q = prob
    rng = np.random.default_rng(4)
    d = rng.random(q.shape) + 0.1
    l_diag = dq.solve_qp(jnp.array(d), jnp.array(q), config=CFG)
    dense = np.eye(q.shape[1]) * d[:, None, :]
    l_dense = dq.solve_qp(jnp.array(dense), jnp.array(q), config=CFG)
    np.testing.assert_allclose(np.array(l_diag), np.array(l_dense), atol=1e-8)


def test_float32_runs(prob):
    P, q = prob
    cfg = dq.SolverConfig(eps=1e-6, max_iter=2000)
    l = dq.solve_qp(jnp.array(P, jnp.float32), jnp.array(q, jnp.float32), config=cfg)
    assert l.dtype == jnp.float32
    l64 = dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG)
    np.testing.assert_allclose(np.array(l), np.array(l64), atol=1e-4)


def test_adaptive_rho_off_still_converges(prob):
    P, q = prob
    cfg = CFG.replace(adaptive_rho=False, max_iter=20000)
    l, stats = dq.solve_qp_with_stats(jnp.array(P), jnp.array(q), config=cfg)
    assert bool(np.all(stats.converged))
    l_on = dq.solve_qp(jnp.array(P), jnp.array(q), config=CFG)
    np.testing.assert_allclose(np.array(l), np.array(l_on), atol=1e-7)


def test_kwargs_override_defaults(prob):
    P, q = prob
    _, s1 = dq.solve_qp_with_stats(jnp.array(P), jnp.array(q), max_iter=7)
    assert int(s1.iterations.max()) == 7


def test_mismatched_shapes_raise(prob):
    P, q = prob
    with pytest.raises(ValueError):
        dq.solve_qp(jnp.array(P[:, :2, :2]), jnp.array(q), config=CFG)
