"""Multi-chip / multi-host batch sharding.

The batch of QP/QCQP problems is embarrassingly parallel (SURVEY.md section
2.3): we shard it over a 1-D device mesh with ``shard_map`` and, by default,
run ZERO collectives - each shard's solver loop terminates on its own, which
also keeps the fused pallas fast path per shard. An optional ``lockstep``
mode threads ``cfg.axis_name`` through instead, making the while-loop's
done-flag a ``lax.pmin`` across the mesh so every shard executes the same
number of loop steps (globally synchronous iterations - the one collective
this algorithm can ever need).

This replaces the reference's "parallelism" - a sequential Python loop over
the batch crossing the Python<->C++ boundary per item (qcqp.py:29-31).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import api
from ..config import SolverConfig

BATCH_AXIS = "batch"


def make_batch_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, batch axis only."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _specs(mesh: Mesh, axis: str, n_args: int):
    return tuple(P(axis) for _ in range(n_args))


def _sharded(
    solve_with_stats, n_in: int, mesh: Mesh, axis: str, cfg: SolverConfig,
    lockstep: bool = False,
):
    """Wrap a *_with_stats solver into a shard_map over the batch axis.

    By default each shard terminates its own solve loop independently - the
    batch is embarrassingly parallel and the solver body contains no other
    collective, so nothing requires the shards to agree on an iteration
    count, and each shard keeps the fused pallas fast path. ``lockstep=True``
    instead threads ``cfg.axis_name`` through, making the while-loop
    condition a ``lax.pmin`` across the mesh (globally synchronous
    iterations; forces the XLA engine) - useful when iteration counts must
    match across shards, e.g. for deterministic multi-host profiling.
    """
    if lockstep:
        cfg = cfg.replace(axis_name=axis)

    def local(*args):
        return solve_with_stats(*args, config=cfg)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=_specs(mesh, axis, n_in),
        out_specs=(
            P(axis),
            api.SolveStats(*([P(axis)] * len(api.SolveStats._fields))),
        ),
        check_vma=False,
    )


def solve_qp_sharded(
    P_mat,
    q,
    warm_start=None,
    *,
    mesh: Optional[Mesh] = None,
    config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS,
    lockstep: bool = False,
):
    """Batch-sharded non-negative QP solve. The leading batch dimension must
    be divisible by the mesh size. Returns (l, SolveStats)."""
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.SolverConfig()
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_qp_with_stats, 3, mesh, axis_name, cfg, lockstep)
    return fn(P_mat, q, ws)


def solve_box_qp_sharded(
    P_mat, q, l_min, l_max, warm_start=None, *,
    mesh: Optional[Mesh] = None, config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS, lockstep: bool = False,
):
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.SolverConfig()
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_box_qp_with_stats, 5, mesh, axis_name, cfg, lockstep)
    return fn(P_mat, q, l_min, l_max, ws)


def solve_signed_box_qp_sharded(
    P_mat, q, l_min, l_max, v, warm_start=None, *,
    mesh: Optional[Mesh] = None, config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS, lockstep: bool = False,
):
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.SolverConfig()
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(
        api.solve_signed_box_qp_with_stats, 6, mesh, axis_name, cfg, lockstep
    )
    return fn(P_mat, q, l_min, l_max, v, ws)


def solve_qcqp_sharded(
    P_mat, q, l_n, mu, warm_start=None, *,
    mesh: Optional[Mesh] = None, config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS, lockstep: bool = False,
):
    """Batch-sharded friction-cone QCQP solve (BASELINE.json config 5)."""
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.QCQP_DEFAULTS
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_qcqp_with_stats, 5, mesh, axis_name, cfg, lockstep)
    return fn(P_mat, q, l_n, mu, ws)


def shard_batch(x, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
