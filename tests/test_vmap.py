"""Transform composability: the solvers vmap (nested batching) and their
custom_vjp differentiates under vmap - table stakes for embedding the solver
inside larger JAX models (e.g. per-timestep solves vmapped over scenes)."""

import numpy as np

import jax
import jax.numpy as jnp

import diffqcqp_tpu as dq

from .conftest import random_spd


def test_vmap_over_problem_groups(rng):
    g, b, n = 3, 4, 6
    P = np.stack([random_spd(rng, b, n) for _ in range(g)])   # (G, B, N, N)
    q = rng.standard_normal((g, b, n))

    solve = lambda P, q: dq.solve_qp(P, q, eps=1e-10, max_iter=3000)
    l_vmap = jax.vmap(solve)(jnp.asarray(P), jnp.asarray(q))
    l_flat = solve(jnp.asarray(P.reshape(-1, n, n)), jnp.asarray(q.reshape(-1, n)))
    np.testing.assert_allclose(
        np.array(l_vmap).reshape(-1, n), np.array(l_flat), atol=1e-9
    )


def test_grad_under_vmap(rng):
    g, b, n = 2, 3, 5
    P = np.stack([random_spd(rng, b, n) for _ in range(g)])
    q = -np.abs(rng.standard_normal((g, b, n))) - 0.1

    def per_group_loss(P, q):
        return jnp.sum(dq.solve_qp(P, q, eps=1e-11, max_iter=5000) ** 2)

    grads = jax.vmap(jax.grad(per_group_loss, argnums=1))(
        jnp.asarray(P), jnp.asarray(q)
    )
    flat_grad = jax.grad(
        lambda q: per_group_loss(jnp.asarray(P.reshape(-1, n, n)), q)
    )(jnp.asarray(q.reshape(-1, n)))
    np.testing.assert_allclose(
        np.array(grads).reshape(-1, n), np.array(flat_grad), atol=1e-8
    )
