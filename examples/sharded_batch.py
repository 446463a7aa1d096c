"""Batch sharding over a device mesh (BASELINE.md config 5 in miniature).

Shards a QCQP batch over every available device, solves collective-free
(each shard's loop terminates independently), then again in lockstep mode
(one lax.pmin done-flag, globally synchronous iterations), and checks both
against the single-device solve.

Run anywhere:
    python examples/sharded_batch.py                     # real devices
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/sharded_batch.py   # virtual mesh
(under the axon TPU plugin JAX_PLATFORMS is ignored; this script pins the
CPU backend itself when the env var is set, mirroring tests/conftest.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu.parallel import (
    make_batch_mesh,
    shard_batch,
    solve_qcqp_sharded,
)

n_dev = len(jax.devices())
mesh = make_batch_mesh()
print(f"devices: {n_dev} x {jax.devices()[0].platform}")

nc = 4
n = 2 * nc
b = 128 * n_dev
rng = np.random.default_rng(0)
S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
q = jnp.asarray((rng.standard_normal((b, n)) * 0.5).astype(np.float32))
l_n = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))
mu = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))

cfg = dq.QCQP_DEFAULTS.replace(eps=1e-7, max_iter=1000)

# single-device oracle
l_ref, _ = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)

args = tuple(shard_batch(x, mesh) for x in (P, q, l_n, mu))
for lockstep in (False, True):
    l, stats = solve_qcqp_sharded(*args, mesh=mesh, config=cfg, lockstep=lockstep)
    it = np.array(stats.iterations).reshape(n_dev, -1)
    err = float(jnp.max(jnp.abs(l - l_ref)))
    mode = "lockstep (pmin)" if lockstep else "collective-free"
    print(
        f"{mode:16s} converged={float(np.mean(np.array(stats.converged))):.3f}"
        f"  max|l - l_single|={err:.2e}"
        f"  per-shard mean iters={[round(float(x), 1) for x in it.mean(axis=1)]}"
    )
    assert err < 1e-5
print("ok")
