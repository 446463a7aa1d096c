"""Differentiable rigid-contact simulation - the reference's motivating use.

The reference backs "Differentiable simulation for physical system
identification" (Le Lidec et al., 2020; README.md:3, :68-83): inside each
simulation step, normal contact forces come from a non-negative QP and
friction forces from a friction-cone QCQP, and gradients flow through both
solves into physical parameters (masses, friction coefficients).

This module is a batched, jit-compatible TPU implementation of that loop for
a minimal but faithful system: B independent point masses sliding on a
horizontal plane under gravity and external pushes.

Per step (explicit velocity-level time stepping, dt fixed):

  1. free velocity   v* = v + dt * (f_ext / m + g_vec)
  2. normal force    one 1-D non-negative QP per contact:
                        min 1/2 G l_n^2 + l_n * (v*_z / dt_eff)
                     via solve_qp on the batched diagonal-P fast path -
                     complementarity l_n >= 0 perpendicular to separation.
  3. friction force  one 2-contact-coordinate QCQP per body:
                        min 1/2 l^T G_t l + l^T v*_xy  s.t. ||l|| <= mu l_n
                     via solve_qcqp (the maximum dissipation principle).
  4. integrate       v' = v* + (l_t / m, l_z / m); x' = x + dt v'.

``simulate`` rolls the step with lax.scan; ``system_id_step`` wraps it in a
value_and_grad Adam update recovering (mass, mu) from observed trajectories -
the end-to-end differentiable-physics training loop of the paper, batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..api import solve_qcqp_with_stats, solve_qp_with_stats
from ..config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig

QP_CFG = QP_DEFAULTS.replace(eps=1e-7, max_iter=200)
QCQP_CFG = QCQP_DEFAULTS.replace(eps=1e-7, max_iter=200)


class ContactState(NamedTuple):
    x: Array      # (B, 3) position (z is height above the plane)
    v: Array      # (B, 3) velocity


class ContactParams(NamedTuple):
    mass: Array   # (B,) strictly positive
    mu: Array     # (B,) friction coefficient in (0, 1]


def _step(
    params: ContactParams,
    state: ContactState,
    f_ext: Array,                 # (B, 3) external force this step
    dt: float,
    qp_cfg: SolverConfig,
    qcqp_cfg: SolverConfig,
    impulses: tuple[Array, Array] | None = None,   # previous (l_n, l_t)
):
    """One stepping step; returns the new state, this step's impulses
    (l_n (B,), l_t (B, 2)) so the rollout can warm-start the next solve with
    them - the reference's intended warm-start pattern (README.md:42: the
    previous timestep's forces seed the next solve; dead code there,
    Solver.cpp:70 vs :80, live here) - and the two solves' per-step mean
    iteration counts (scalar f32 each; the stats are computed by the engine
    regardless, so carrying them is free)."""
    m = params.mass
    g = jnp.array([0.0, 0.0, -9.81], state.v.dtype)

    v_free = state.v + dt * (f_ext / m[:, None] + g)

    # contact activity: near the plane and approaching it
    touching = (state.x[:, 2] <= 1e-3) & (v_free[:, 2] <= 0.0)

    ws_n = ws_t = None
    if impulses is not None:
        prev_n, prev_t = impulses
        ws_n = jnp.stack([prev_n, jnp.zeros_like(prev_n)], axis=-1)
        ws_t = prev_t
        # primal-only warm starts measurably do NOT cut ADMM iterations
        # (the solver still rediscovers the dual u); derive u0 = -(P ws + q)
        # too (SolverConfig.warm_start_dual).
        qp_cfg = qp_cfg.replace(warm_start_dual=True)
        qcqp_cfg = qcqp_cfg.replace(warm_start_dual=True)

    # --- normal impulse: diagonal-P non-negative QP, P = 1/m (the Delassus
    # operator of a single point contact), q = v*_z (so l_n cancels the
    # normal velocity when the contact is active). A dummy second coordinate
    # (q=1 => l=0) avoids the (B,1)-vs-(N,1) vector-layout ambiguity.
    P_n = jnp.broadcast_to((1.0 / m)[:, None], (m.shape[0], 2))
    q_z = jnp.where(touching, v_free[:, 2], 1.0)        # inactive => q>0 => l=0
    q_n = jnp.stack([q_z, jnp.ones_like(q_z)], axis=-1)
    l_n_full, st_n = solve_qp_with_stats(P_n, q_n, ws_n, config=qp_cfg)
    l_n = l_n_full[:, 0]                                 # (B,)

    # --- friction impulse: one 2-D cone per body, radius mu * l_n.
    # P again the Delassus 1/m per tangential coordinate, q = v*_xy.
    P_t = jnp.broadcast_to((1.0 / m)[:, None], (m.shape[0], 2))
    q_t = v_free[:, :2]
    # the minimiser of 1/2 l^2/m + l . v is l = -m v (clipped to the cone):
    # the returned impulse already opposes the tangential motion and sticks
    # the contact when inside the cone.
    l_t, st_t = solve_qcqp_with_stats(
        P_t, q_t, l_n[:, None], params.mu[:, None], ws_t, config=qcqp_cfg
    )                                               # (B, 2)

    dv = jnp.concatenate([l_t, l_n[:, None]], axis=-1) / m[:, None]
    v_new = v_free + dv
    x_new = state.x + dt * v_new
    x_new = x_new.at[:, 2].set(jnp.maximum(x_new[:, 2], 0.0))
    iters = (
        jnp.mean(st_n.iterations.astype(jnp.float32)),
        jnp.mean(st_t.iterations.astype(jnp.float32)),
    )
    return ContactState(x=x_new, v=v_new), (l_n, l_t), iters


def simulate(
    params: ContactParams,
    state0: ContactState,
    f_ext: Array,                  # (T, B, 3)
    dt: float = 0.01,
    qp_cfg: SolverConfig = QP_CFG,
    qcqp_cfg: SolverConfig = QCQP_CFG,
    warm_start: bool = True,
    return_stats: bool = False,
):
    """Roll T steps; returns (final_state, trajectory-of-states), plus -
    when ``return_stats`` - a dict of per-step batch-mean solver iteration
    counts {'qp_iters': (T,), 'qcqp_iters': (T,)} (free to carry: the
    engine computes SolveStats regardless). The warm-start economics of
    the rollout are benchmarked in benchmarks/run_benchmarks.py config 11.

    warm_start=True carries each step's contact impulses through the scan
    and seeds the next step's QP/QCQP solves with them, primal AND dual
    (cfg.warm_start_dual synthesises u0 = -(P ws + q); primal-only warm
    starts measurably save nothing). README.md:42's physics pattern:
    consecutive timesteps solve nearly identical problems, so the previous
    forces start near the new fixed point - an unchanged problem re-solves
    in 1 iteration, slowly-drifting sequences save iterations in proportion
    to log(drift/eps) (measurements: tests/test_contact_sim.py). Solutions
    are eps-converged either way; trajectories agree with warm_start=False
    (the reference trajectory) to solver tolerance."""
    B = state0.x.shape[0]
    dtype = state0.x.dtype
    imp0 = (jnp.zeros((B,), dtype), jnp.zeros((B, 2), dtype))

    def body(carry, f):
        state, imp = carry
        nxt, imp_new, iters = _step(
            params, state, f, dt, qp_cfg, qcqp_cfg,
            impulses=imp if warm_start else None,
        )
        return (nxt, imp_new), (nxt, iters)

    (final, _), (traj, iters) = jax.lax.scan(body, (state0, imp0), f_ext)
    if return_stats:
        return final, traj, {"qp_iters": iters[0], "qcqp_iters": iters[1]}
    return final, traj


def trajectory_loss(
    params: ContactParams,
    state0: ContactState,
    f_ext: Array,
    target_x: Array,               # (T, B, 3) observed positions
    dt: float = 0.01,
) -> Array:
    """MSE between simulated and observed positions - gradients flow through
    every QP/QCQP solve of every step via the implicit KKT adjoints."""
    _, traj = simulate(params, state0, f_ext, dt)
    return jnp.mean((traj.x - target_x) ** 2)


def make_system_id_step(optimizer, state0, f_ext, target_x, dt: float = 0.01):
    """One jitted Adam step over (log-mass, logit-mu) raw parameters."""

    def raw_to_params(raw):
        return ContactParams(
            mass=jnp.exp(raw["log_mass"]), mu=jax.nn.sigmoid(raw["logit_mu"])
        )

    @jax.jit
    def step(raw, opt_state):
        def loss_fn(raw):
            return trajectory_loss(raw_to_params(raw), state0, f_ext, target_x, dt)

        loss, grads = jax.value_and_grad(loss_fn)(raw)
        updates, opt_state = optimizer.update(grads, opt_state)
        raw = jax.tree.map(lambda p, u: p + u, raw, updates)
        return raw, opt_state, loss

    return step, raw_to_params
