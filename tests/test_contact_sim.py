"""Differentiable contact simulation (models/contact_sim.py): physics sanity
plus end-to-end system identification through the QP/QCQP solves - the
reference's motivating application (README.md:68-83)."""

import numpy as np
import pytest

optax = pytest.importorskip("optax")

import jax.numpy as jnp  # noqa: E402

from diffqcqp_tpu.models.contact_sim import (  # noqa: E402
    ContactParams,
    ContactState,
    make_system_id_step,
    simulate,
    trajectory_loss,
)


def _rest_state(b, dtype=jnp.float64):
    x = jnp.zeros((b, 3), dtype)
    v = jnp.zeros((b, 3), dtype)
    return ContactState(x=x, v=v)


def test_resting_body_stays_put():
    b, t = 4, 50
    params = ContactParams(mass=jnp.ones(b), mu=jnp.full(b, 0.5))
    f = jnp.zeros((t, b, 3))
    final, traj = simulate(params, _rest_state(b), f)
    np.testing.assert_allclose(np.array(final.x), 0.0, atol=1e-6)
    assert float(jnp.max(jnp.abs(traj.v[:, :, 2]))) < 1e-6


def test_sliding_body_decelerates_and_stops():
    """A body shoved sideways must decelerate at ~mu*g and stop (friction
    within the cone cancels tangential velocity once slow enough)."""
    b, t, dt = 2, 120, 0.01
    params = ContactParams(mass=jnp.ones(b), mu=jnp.asarray([0.3, 0.8]))
    s0 = ContactState(
        x=jnp.zeros((b, 3)), v=jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    )
    f = jnp.zeros((t, b, 3))
    final, traj = simulate(params, s0, f, dt=dt)
    speeds = np.array(jnp.linalg.norm(traj.v[:, :, :2], axis=-1))
    # monotone non-increasing speed, both stop
    assert np.all(np.diff(speeds, axis=0) <= 1e-6)
    assert np.all(speeds[-1] < 1e-4)
    # higher friction stops sooner: first index where speed < 1e-3
    stop = (speeds < 1e-3).argmax(axis=0)
    assert stop[1] < stop[0]
    # mu=0.3 deceleration ~ mu*g: v(t) ~ 1 - mu*g*t until stop
    k = 30
    expected = 1.0 - 0.3 * 9.81 * k * dt
    assert abs(speeds[k - 1, 0] - expected) < 0.05


def test_system_id_recovers_friction():
    """Recover mu (and mass) from observed trajectories by Adam through the
    differentiable solver stack."""
    b, t, dt = 8, 40, 0.01
    rng = np.random.default_rng(0)
    true = ContactParams(
        mass=jnp.asarray(rng.uniform(0.8, 1.2, b)),
        mu=jnp.asarray(rng.uniform(0.2, 0.7, b)),
    )
    s0 = ContactState(
        x=jnp.zeros((b, 3)),
        v=jnp.asarray(np.c_[rng.uniform(0.5, 1.5, b), rng.uniform(-0.5, 0.5, b), np.zeros(b)]),
    )
    f_ext = jnp.asarray(rng.normal(0, 0.3, (t, b, 3)).clip(-1, 1))
    _, traj = simulate(true, s0, f_ext, dt=dt)
    target = traj.x

    raw = {
        "log_mass": jnp.zeros(b),                      # mass init 1.0
        "logit_mu": jnp.zeros(b),                      # mu init 0.5
    }
    opt = optax.adam(0.05)
    step, raw_to_params = make_system_id_step(opt, s0, f_ext, target, dt)
    opt_state = opt.init(raw)
    l0 = float(trajectory_loss(raw_to_params(raw), s0, f_ext, target, dt))
    loss = None
    for _ in range(60):
        raw, opt_state, loss = step(raw, opt_state)
    assert float(loss) < 0.2 * l0, (l0, float(loss))
    mu_err = np.abs(np.array(raw_to_params(raw).mu) - np.array(true.mu))
    assert float(np.median(mu_err)) < float(np.median(np.abs(0.5 - np.array(true.mu))))
