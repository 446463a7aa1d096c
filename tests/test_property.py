"""Property-based tests (hypothesis): solver invariants over random
problem families the fixed-seed tests cannot enumerate.

Invariants checked per draw:
  * solutions are finite and primal-feasible (exact, the projection is the
    last operation of the iteration);
  * converged problems satisfy the KKT conditions (verify.py oracle);
  * the solution improves or matches the objective of the projected
    unconstrained minimiser (a cheap global sanity bound);
  * batch order invariance: permuting the batch permutes the solution.

Shapes are kept tiny (interpret-free CPU path) and examples few - the goal
is structural coverage (degenerate radii, tight boxes, huge scale spreads),
not statistical volume.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu import verify

CFG = dq.SolverConfig(eps=1e-10, max_iter=20000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=50000)

COMMON = dict(deadline=None, max_examples=15, derandomize=True)


def _problem(seed, b, n, scale_pow):
    rng = np.random.default_rng(seed)
    S = rng.standard_normal((b, n, n))
    scales = np.exp(rng.uniform(-scale_pow, scale_pow, (b, 1, 1)))
    P = (S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n)) * scales
    q = rng.standard_normal((b, n)) * scales[:, :, 0]
    return jnp.asarray(P), jnp.asarray(q)


def _objective(P, q, l):
    Pl = jnp.sum(P * l[:, None, :], axis=-1)
    return 0.5 * jnp.sum(l * Pl, axis=-1) + jnp.sum(q * l, axis=-1)


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**20),
    n=st.integers(2, 10),
    scale_pow=st.floats(0.0, 2.0),
)
def test_qp_invariants(seed, n, scale_pow):
    b = 4
    P, q = _problem(seed, b, n, scale_pow)
    l, stats = dq.solve_qp_with_stats(P, q, config=CFG)
    assert bool(jnp.all(jnp.isfinite(l)))
    assert bool(jnp.all(l >= 0.0))                      # exact feasibility
    conv = np.array(stats.converged)
    if conv.any():
        r = verify.check_qp(P, q, l)
        scale = 1.0 + np.abs(np.array(q)).max(axis=-1)
        assert np.all(
            np.array(r.stationarity)[conv] < 1e-6 * scale[conv]
        ), np.array(r.stationarity)[conv]
    # objective no worse than the projected unconstrained guess max(0, -P^-1 q)
    guess = jnp.maximum(jnp.linalg.solve(P, -q[..., None])[..., 0], 0.0)
    assert bool(
        jnp.all(_objective(P, q, l) <= _objective(P, q, guess) + 1e-7)
    )


@settings(**COMMON)
@given(seed=st.integers(0, 2**20), n=st.integers(2, 8))
def test_box_invariants(seed, n):
    b = 4
    P, q = _problem(seed, b, n, 1.0)
    rng = np.random.default_rng(seed + 1)
    lo = jnp.asarray(-(rng.random((b, n)) * 0.5 + 1e-3))
    hi = jnp.asarray(rng.random((b, n)) * 0.5 + 1e-3)
    l, stats = dq.solve_box_qp_with_stats(P, q, lo, hi, config=CFG)
    assert bool(jnp.all(jnp.isfinite(l)))
    assert bool(jnp.all((l >= lo) & (l <= hi)))
    conv = np.array(stats.converged)
    if conv.any():
        r = verify.check_box_qp(P, q, lo, hi, l)
        scale = 1.0 + np.abs(np.array(q)).max(axis=-1)
        assert np.all(np.array(r.stationarity)[conv] < 1e-6 * scale[conv])


@settings(**COMMON)
@given(
    seed=st.integers(0, 2**20),
    nc=st.integers(1, 5),
    zero_frac=st.floats(0.0, 0.6),
)
def test_qcqp_invariants(seed, nc, zero_frac):
    b = 4
    n = 2 * nc
    P, q = _problem(seed, b, n, 0.5)
    rng = np.random.default_rng(seed + 2)
    l_n = rng.random((b, nc)) * 0.5 + 0.01
    l_n = np.where(rng.random((b, nc)) < zero_frac, 0.0, l_n)  # degenerate cones
    mu = rng.random((b, nc)) * 0.9 + 0.05
    l, stats = dq.solve_qcqp_with_stats(
        P, q, jnp.asarray(l_n), jnp.asarray(mu), config=QCFG
    )
    assert bool(jnp.all(jnp.isfinite(l)))
    radius = np.asarray(l_n) * np.asarray(mu)
    pts = np.array(l).reshape(b, nc, 2)
    assert np.all(np.linalg.norm(pts, axis=-1) <= radius + 1e-8)
    # zero-radius cones force exactly zero forces
    assert np.all(np.abs(pts[radius == 0.0]) == 0.0)


@settings(**COMMON)
@given(seed=st.integers(0, 2**20))
def test_batch_order_invariance(seed):
    b, n = 6, 6
    P, q = _problem(seed, b, n, 1.0)
    perm = np.random.default_rng(seed).permutation(b)
    l = dq.solve_qp(P, q, config=CFG)
    l_perm = dq.solve_qp(P[perm], q[perm], config=CFG)
    np.testing.assert_allclose(
        np.array(l_perm), np.array(l)[perm], atol=1e-12
    )
