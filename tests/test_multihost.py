"""Multi-host helpers on the single-process virtual 8-device mesh (the
standard JAX stand-in for a distributed backend, SURVEY.md section 4):
process-local data assembly + global mesh + sharded solve compose."""

import numpy as np

import jax
import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu.parallel.multihost import (
    global_batch_mesh,
    shard_host_local_batch,
)
from diffqcqp_tpu.parallel.sharding import solve_qp_sharded

from .conftest import random_spd


def test_global_mesh_spans_all_devices():
    mesh = global_batch_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_shard_host_local_and_solve(rng):
    n_dev = len(jax.devices())
    b, n = 4 * n_dev, 6
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    mesh = global_batch_mesh()

    Pg = shard_host_local_batch(P, mesh)
    qg = shard_host_local_batch(q, mesh)
    assert Pg.shape == (b, n, n)  # process_count == 1: global == local
    assert len(Pg.sharding.device_set) == n_dev

    l_sharded, stats = solve_qp_sharded(Pg, qg, mesh=mesh, config=dq.SolverConfig(eps=1e-10, max_iter=3000))
    l_single = dq.solve_qp(jnp.asarray(P), jnp.asarray(q), eps=1e-10, max_iter=3000)
    np.testing.assert_allclose(np.array(l_sharded), np.array(l_single), atol=1e-9)
    assert bool(np.all(np.array(stats.converged)))
