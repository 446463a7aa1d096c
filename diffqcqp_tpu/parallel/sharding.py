"""Multi-chip / multi-host batch sharding.

The batch of QP/QCQP problems is embarrassingly parallel; the ONLY collective
the algorithm needs is agreement on the stopping iteration of the fixed-point
loop (SURVEY.md section 2.3). We shard the problem batch over a 1-D device
mesh with ``shard_map``; inside each shard the solver runs the normal batched
engine with ``cfg.axis_name`` set, which makes the while-loop's done-flag a
``lax.pmin`` across the mesh so every shard executes the same number of loop
steps (no shard can exit early and deadlock the collective).

This replaces the reference's "parallelism" - a sequential Python loop over
the batch crossing the Python<->C++ boundary per item (qcqp.py:29-31).
"""

from __future__ import annotations

from functools import partial
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


def _sharded(solve_with_stats, n_in: int, mesh: Mesh, axis: str, cfg: SolverConfig):
    """Wrap a *_with_stats solver into a shard_map over the batch axis."""
    cfg = cfg.replace(axis_name=axis)

    def local(*args):
        return solve_with_stats(*args, config=cfg)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=_specs(mesh, axis, n_in),
        out_specs=(P(axis), api.SolveStats(P(axis), P(axis), P(axis), P(axis))),
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
):
    """Batch-sharded non-negative QP solve. The leading batch dimension must
    be divisible by the mesh size. Returns (l, SolveStats)."""
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.SolverConfig()
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_qp_with_stats, 3, mesh, axis_name, cfg)
    return fn(P_mat, q, ws)


def solve_box_qp_sharded(
    P_mat, q, l_min, l_max, warm_start=None, *,
    mesh: Optional[Mesh] = None, config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS,
):
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.SolverConfig()
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_box_qp_with_stats, 5, mesh, axis_name, cfg)
    return fn(P_mat, q, l_min, l_max, ws)


def solve_qcqp_sharded(
    P_mat, q, l_n, mu, warm_start=None, *,
    mesh: Optional[Mesh] = None, config: Optional[SolverConfig] = None,
    axis_name: str = BATCH_AXIS,
):
    """Batch-sharded friction-cone QCQP solve (BASELINE.json config 5)."""
    mesh = mesh if mesh is not None else make_batch_mesh(axis_name=axis_name)
    cfg = config if config is not None else api.QCQP_DEFAULTS
    import jax.numpy as jnp

    ws = jnp.zeros_like(q) if warm_start is None else warm_start
    fn = _sharded(api.solve_qcqp_with_stats, 5, mesh, axis_name, cfg)
    return fn(P_mat, q, l_n, mu, ws)


def shard_batch(x, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
