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
    solve_signed_box_qp_sharded,
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


def test_sharded_signed_box_matches_single_device(rng, spd, mesh):
    b, n = 16, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    lo = jnp.array(-(rng.random((b, n)) * 0.4 + 0.05))
    hi = jnp.array(rng.random((b, n)) * 0.4 + 0.05)
    v = jnp.array(rng.standard_normal((b, n)))
    l_ref = dq.solve_signed_box_qp(P, q, lo, hi, v, config=CFG)
    l_sh, s_sh = solve_signed_box_qp_sharded(
        *(shard_batch(x, mesh) for x in (P, q, lo, hi, v)),
        mesh=mesh, config=CFG,
    )
    np.testing.assert_allclose(np.array(l_sh), np.array(l_ref), atol=1e-9)
    assert bool(np.all(np.array(s_sh.converged)))


def test_lockstep_qp_matches_single_device(rng, spd, mesh):
    """lockstep=True threads cfg.axis_name into the engine's lax.pmin
    done-flag reduction - the one collective in the whole design
    (SURVEY.md 2.3). Solutions must match the single-device solve exactly
    and every shard must converge."""
    b, n = 16, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_ref, s_ref = dq.solve_qp_with_stats(P, q, config=CFG)
    l_sh, s_sh = solve_qp_sharded(
        shard_batch(P, mesh), shard_batch(q, mesh), mesh=mesh, config=CFG,
        lockstep=True,
    )
    np.testing.assert_allclose(np.array(l_sh), np.array(l_ref), atol=1e-9)
    assert bool(np.all(np.array(s_sh.converged)))


def test_lockstep_uneven_convergence(rng, spd, mesh):
    """One shard's problems need ~10x the iterations (ill-conditioned P on
    shard 0): the pmin termination must keep ALL shards looping until the
    globally slowest problem finishes, and per-problem iteration counts must
    match the unsharded solve (frozen problems do not drift)."""
    b, n = 16, 8
    P = np.array(spd(rng, b, n))
    # make shard 0's problems much harder: huge condition spread
    scale = np.exp(np.linspace(-3.0, 3.0, n))
    P[:2] = P[:2] * scale[None, :, None] * scale[None, None, :]
    q = rng.standard_normal((b, n))
    P, q = jnp.array(P), jnp.array(q)
    cfg = CFG.replace(max_iter=50000)
    l_ref, s_ref = dq.solve_qp_with_stats(P, q, config=cfg)
    it_ref = np.array(s_ref.iterations)
    assert it_ref[:2].max() > 3 * it_ref[2:].max(), "setup: shard 0 not slower"
    l_sh, s_sh = solve_qp_sharded(
        shard_batch(P, mesh), shard_batch(q, mesh), mesh=mesh, config=cfg,
        lockstep=True,
    )
    np.testing.assert_allclose(np.array(l_sh), np.array(l_ref), atol=1e-8)
    assert bool(np.all(np.array(s_sh.converged)))
    np.testing.assert_array_equal(np.array(s_sh.iterations), it_ref)


def test_lockstep_gradients_match(rng, spd, mesh):
    b, n = 8, 6
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))

    def loss_single(P, q):
        return jnp.sum(dq.solve_qp(P, q, config=CFG) ** 2)

    def loss_lockstep(P, q):
        l, _ = solve_qp_sharded(P, q, mesh=mesh, config=CFG, lockstep=True)
        return jnp.sum(l**2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(P, q)
    g_sh = jax.grad(loss_lockstep, argnums=(0, 1))(
        shard_batch(P, mesh), shard_batch(q, mesh)
    )
    np.testing.assert_allclose(np.array(g_sh[0]), np.array(g_ref[0]), atol=1e-8)
    np.testing.assert_allclose(np.array(g_sh[1]), np.array(g_ref[1]), atol=1e-8)


def test_lockstep_qcqp_matches_single_device(rng, spd, mesh):
    b, nc = 16, 4
    n = 2 * nc
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    l_ref, _ = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=QCFG)
    l_sh, s_sh = solve_qcqp_sharded(
        shard_batch(P, mesh), shard_batch(q, mesh), shard_batch(l_n, mesh),
        shard_batch(mu, mesh), mesh=mesh, config=QCFG, lockstep=True,
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
