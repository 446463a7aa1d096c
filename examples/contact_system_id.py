"""Differentiable-physics system identification (the reference's paper
use-case): recover per-body mass and friction coefficient from observed
sliding trajectories, by gradient descent THROUGH the QP/QCQP contact
solves of every simulation step.

Run: python examples/contact_system_id.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
import optax

from diffqcqp_tpu.models.contact_sim import (
    ContactParams,
    ContactState,
    make_system_id_step,
    simulate,
    trajectory_loss,
)

B, T, DT = 16, 60, 0.01
rng = np.random.default_rng(0)

true = ContactParams(
    mass=jnp.asarray(rng.uniform(0.7, 1.4, B)),
    mu=jnp.asarray(rng.uniform(0.15, 0.8, B)),
)
state0 = ContactState(
    x=jnp.zeros((B, 3)),
    v=jnp.asarray(np.c_[rng.uniform(0.5, 2.0, B), rng.uniform(-1, 1, B), np.zeros(B)]),
)
f_ext = jnp.asarray(rng.normal(0, 0.3, (T, B, 3)).clip(-1, 1))

_, traj = simulate(true, state0, f_ext, dt=DT)
target = traj.x
print(f"observed {T} steps of {B} bodies")

raw = {"log_mass": jnp.zeros(B), "logit_mu": jnp.zeros(B)}
opt = optax.adam(5e-2)
step, raw_to_params = make_system_id_step(opt, state0, f_ext, target, DT)
opt_state = opt.init(raw)

for k in range(201):
    raw, opt_state, loss = step(raw, opt_state)
    if k % 50 == 0:
        est = raw_to_params(raw)
        mu_err = float(jnp.median(jnp.abs(est.mu - true.mu)))
        m_err = float(jnp.median(jnp.abs(est.mass - true.mass)))
        print(f"step {k:4d}  loss {float(loss):.3e}  "
              f"median |mu err| {mu_err:.3f}  median |mass err| {m_err:.3f}")

est = raw_to_params(raw)
print("true mu   :", np.round(np.array(true.mu[:6]), 3))
print("learned mu:", np.round(np.array(est.mu[:6]), 3))
