"""Multi-host (DCN-spanning) deployment helpers.

The solver's scaling model (BASELINE.md config 5): the problem batch is
embarrassingly parallel, so multi-host runs are the single-host program over
a bigger mesh - same `solve_*_sharded` functions, global axis spanning all
hosts' devices. These helpers wrap the three JAX multi-process steps:

  1. `jax.distributed.initialize()` on every host (coordinator discovery via
     the standard env vars or explicit arguments),
  2. a global 1-D batch mesh over every device of every host,
  3. building a globally-sharded batch from per-host local problem data
     (`jax.make_array_from_process_local_data`).

There is nothing else to coordinate: by default the solvers run zero
collectives (each shard finishes independently); `lockstep=True` threads the
one optional `lax.pmin` through the loop condition, which XLA lowers onto
ICI within a slice and DCN across hosts.

Single-host meshes work through these same functions (initialize() is then
unnecessary), which is how tests cover them on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .sharding import BATCH_AXIS, make_batch_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process JAX runtime (call once per host, before any
    other JAX API). No-op if already initialized or running single-process
    with no coordinator configured.

    Errors are suppressed ONLY when no coordinator was requested (neither
    arguments nor the standard env vars set): swallowing a failure from an
    explicitly-configured launch (bad coordinator address, port clash) would
    silently degrade every host to an independent single-process run, each
    quietly solving a different batch than intended."""
    import os

    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or any(
            os.environ.get(v)
            for v in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID",
            )
        )
    )
    if jax.distributed.is_initialized():
        # idempotent: a second call (e.g. library + launcher both initialize)
        # is a no-op. Probed directly rather than classified from an error
        # message, which JAX versions are free to reword.
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # single-process without coordinator config


def global_batch_mesh(axis_name: str = BATCH_AXIS):
    """1-D mesh over every device of every host (global batch axis)."""
    return make_batch_mesh(jax.devices(), axis_name=axis_name)


def shard_host_local_batch(x_local, mesh, axis_name: str = BATCH_AXIS):
    """Assemble a globally-sharded array from this host's slice of the batch.

    ``x_local`` is the per-host shard, shape (B_local, ...); hosts
    collectively hold the global batch in process order. Returns a jax.Array
    with global shape (B_local * num_processes, ...), leading axis sharded
    over the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_local = np.asarray(x_local)
    global_shape = (
        x_local.shape[0] * jax.process_count(),
    ) + x_local.shape[1:]
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, x_local, global_shape)
