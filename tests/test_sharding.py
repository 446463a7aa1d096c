"""Multi-device batch sharding on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.parallel.sharding import (
    make_batch_mesh,
    shard_batch,
    solve_qcqp_sharded,
    solve_qp_sharded,
)

CFG = dq.SolverConfig(eps=1e-10, max_iter=5000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-8, max_iter=20000)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_batch_mesh()


def test_sharded_qp_matches_single_device(rng, spd, mesh):
    b, n = 16, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_ref, s_ref = dq.solve_qp_with_stats(P, q, config=CFG)
    l_sh, s_sh = solve_qp_sharded(
        shard_batch(P, mesh), shard_batch(q, mesh), mesh=mesh, config=CFG
    )
    np.testing.assert_allclose(np.array(l_sh), np.array(l_ref), atol=1e-9)
    assert bool(np.all(np.array(s_sh.converged)))
    # every shard ran until the globally slowest problem finished, so the
    # output sharding must still be the batch sharding (no implicit gather)
    assert len(l_sh.sharding.device_set) == 8


def test_sharded_qcqp_matches_single_device(rng, spd, mesh):
    b, nc = 16, 4
    n = 2 * nc
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    l_ref, _ = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=QCFG)
    l_sh, s_sh = solve_qcqp_sharded(
        shard_batch(P, mesh),
        shard_batch(q, mesh),
        shard_batch(l_n, mesh),
        shard_batch(mu, mesh),
        mesh=mesh,
        config=QCFG,
    )
    np.testing.assert_allclose(np.array(l_sh), np.array(l_ref), atol=1e-7)
    assert bool(np.all(np.array(s_sh.converged)))


def test_sharded_gradients_match(rng, spd, mesh):
    b, n = 8, 6
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))

    def loss_single(P, q):
        return jnp.sum(dq.solve_qp(P, q, config=CFG) ** 2)

    def loss_sharded(P, q):
        l, _ = solve_qp_sharded(P, q, mesh=mesh, config=CFG)
        return jnp.sum(l**2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(P, q)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1))(
        shard_batch(P, mesh), shard_batch(q, mesh)
    )
    np.testing.assert_allclose(np.array(g_sh[0]), np.array(g_ref[0]), atol=1e-8)
    np.testing.assert_allclose(np.array(g_sh[1]), np.array(g_ref[1]), atol=1e-8)
