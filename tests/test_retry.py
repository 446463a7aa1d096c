"""Batch-level retry (utils/retry.py): capped problems converge on resumed
rounds; already-converged results stay frozen."""

import numpy as np

import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu.utils.retry import solve_resumed

from .conftest import random_spd


def test_resume_converges_capped_problems(rng):
    b, n = 8, 10
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    # starve the first round so some problems cap out
    cfg = dq.SolverConfig(eps=1e-10, max_iter=4)
    l1, st1 = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg)
    assert not bool(np.all(np.array(st1.converged)))

    l, st = solve_resumed(
        dq.solve_qp_with_stats, jnp.asarray(P), jnp.asarray(q),
        config=cfg, rounds=4, growth=8,
    )
    assert bool(np.all(np.array(st.converged)))
    l_ref = dq.solve_qp(jnp.asarray(P), jnp.asarray(q), eps=1e-10, max_iter=5000)
    np.testing.assert_allclose(np.array(l), np.array(l_ref), atol=1e-8)
    # totals exceed the starved budget only for problems that needed more
    assert int(np.max(np.array(st.iterations))) > 4


def test_resume_keeps_converged_frozen(rng):
    b, n = 6, 8
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    cfg = dq.SolverConfig(eps=1e-10, max_iter=2000)
    l1, st1 = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg)
    assert bool(np.all(np.array(st1.converged)))
    l, st = solve_resumed(
        dq.solve_qp_with_stats, jnp.asarray(P), jnp.asarray(q),
        config=cfg, rounds=2,
    )
    np.testing.assert_allclose(np.array(l), np.array(l1), atol=0)
    np.testing.assert_array_equal(np.array(st.iterations), np.array(st1.iterations))
