"""Worker for tests/test_multihost.py::test_two_process_distributed.

Launched twice (process_id 0/1) by the test; each process owns 2 virtual
CPU devices, joins a real jax.distributed runtime (gloo collectives on
localhost), assembles its half of a global batch with
shard_host_local_batch, runs the sharded differentiable QCQP solve, and
process 0 saves the allgathered solution + gradient for the parent test to
compare against the single-process reference.

Usage: python _mp_worker.py <port> <process_id> <outdir>
"""

import os
import sys

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from diffqcqp_tpu.parallel.multihost import (
    global_batch_mesh,
    initialize_distributed,
    shard_host_local_batch,
)

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu.parallel.sharding import solve_qcqp_sharded

# identical deterministic problem in both workers and the parent test
B, nc = 16, 2
n = 2 * nc
rng = np.random.default_rng(7)
s = rng.standard_normal((B, n, n)) / np.sqrt(n)
P = s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n)
q = rng.standard_normal((B, n)) * 0.5
l_n = rng.random((B, nc)) * 0.5 + 0.05
mu = rng.random((B, nc)) * 0.5 + 0.05

lo, hi = pid * (B // 2), (pid + 1) * (B // 2)   # this host's slice
mesh = global_batch_mesh()
Pg, qg, lng, mug = (
    shard_host_local_batch(x[lo:hi], mesh) for x in (P, q, l_n, mu)
)
cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=5000)

for lockstep in (False, True):
    l, stats = jax.jit(
        lambda *a: solve_qcqp_sharded(*a, mesh=mesh, config=cfg,
                                      lockstep=lockstep)
    )(Pg, qg, lng, mug)

    def loss(P_, q_, ln_, mu_):
        # every global array must be an ARGUMENT: a closed-over sharded
        # array becomes a jaxpr constant, which cannot be materialised
        # across non-addressable devices
        l_, _ = solve_qcqp_sharded(
            P_, q_, ln_, mu_, mesh=mesh, config=cfg, lockstep=lockstep
        )
        return jnp.sum(l_ * l_)

    g = jax.jit(jax.grad(loss, argnums=1))(Pg, qg, lng, mug)

    from jax.experimental import multihost_utils

    l_full = np.asarray(multihost_utils.process_allgather(l, tiled=True))
    g_full = np.asarray(multihost_utils.process_allgather(g, tiled=True))
    conv = np.asarray(
        multihost_utils.process_allgather(stats.converged, tiled=True)
    )
    if pid == 0:
        tag = "lockstep" if lockstep else "free"
        np.save(os.path.join(outdir, f"l_{tag}.npy"), l_full)
        np.save(os.path.join(outdir, f"g_{tag}.npy"), g_full)
        np.save(os.path.join(outdir, f"conv_{tag}.npy"), conv)

print(f"worker {pid} done", flush=True)
