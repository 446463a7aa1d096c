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
    # tolerance is ~10x the solver eps (1e-7): warm-started steps certify
    # the same residual eps but at the un-adapted rho0, so per-step solution
    # noise sits at the few-1e-6 level rather than cold start's ~1e-7
    np.testing.assert_allclose(np.array(final.x), 0.0, atol=1e-5)
    assert float(jnp.max(jnp.abs(traj.v[:, :, 2]))) < 1e-5


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
    # monotone non-increasing speed, both stop (1e-5 = ~10x solver eps;
    # see the resting test's tolerance note)
    assert np.all(np.diff(speeds, axis=0) <= 1e-5)
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


def test_warm_start_rollout_matches_cold_trajectory():
    """warm_start=True (default) carries impulses through the scan; the
    eps-converged solutions - and hence the trajectory - must match the
    cold-start (reference-trajectory) rollout to solver tolerance."""
    b, t, dt = 4, 60, 0.01
    rng = np.random.default_rng(7)
    params = ContactParams(
        mass=jnp.asarray(rng.uniform(0.8, 1.2, b)),
        mu=jnp.asarray(rng.uniform(0.2, 0.7, b)),
    )
    s0 = ContactState(
        x=jnp.zeros((b, 3)),
        v=jnp.asarray(np.c_[rng.uniform(0.5, 1.5, b),
                            rng.uniform(-0.5, 0.5, b), np.zeros(b)]),
    )
    f = jnp.asarray(rng.normal(0, 0.3, (t, b, 3)).clip(-1, 1))
    _, traj_warm = simulate(params, s0, f, dt=dt, warm_start=True)
    _, traj_cold = simulate(params, s0, f, dt=dt, warm_start=False)
    np.testing.assert_allclose(
        np.array(traj_warm.x), np.array(traj_cold.x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(traj_warm.v), np.array(traj_cold.v), atol=1e-5
    )


def test_warm_start_cuts_iterations_on_drifting_problems():
    """The physics pattern warm-starting exists for (README.md:42):
    consecutive timesteps solve nearly identical QCQPs. Measured facts this
    test pins down (calibrated on this exact sequence):

      * primal-only warm starts save NOTHING (the solver rediscovers the
        dual u from scratch either way) - the reason warm_start_dual exists;
      * with warm_start_dual (u0 = -(P ws + q)), the chained sequence
        saves ~30% of total iterations at eps=1e-9 (savings scale with
        log(drift/eps): smaller steps or looser eps save much more);
      * re-solving an UNCHANGED problem from its own solution converges
        immediately (the synthesised (l2, u) pair is an exact fixed point).
    """
    import diffqcqp_tpu as dq

    rng = np.random.default_rng(11)
    b, nc, steps = 16, 4, 20
    n = 2 * nc
    s = rng.standard_normal((b, n, n)) / np.sqrt(n)
    P = jnp.asarray(s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n))
    q0 = rng.standard_normal((b, n))
    drift = rng.standard_normal((steps, b, n)) * 0.002  # fine timestep drift
    l_n = jnp.asarray(rng.random((b, nc)) * 0.5 + 0.1)
    mu = jnp.asarray(rng.random((b, nc)) * 0.5 + 0.2)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=5000)
    wcfg = cfg.replace(warm_start_dual=True)

    cold = warm = prim = 0
    ws = ws_p = None
    for k in range(steps):
        q = jnp.asarray(q0 + drift[: k + 1].sum(0))
        _, s_cold = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)
        l_w, s_warm = dq.solve_qcqp_with_stats(
            P, q, l_n, mu, warm_start=ws, config=cfg if ws is None else wcfg
        )
        l_p, s_prim = dq.solve_qcqp_with_stats(
            P, q, l_n, mu, warm_start=ws_p, config=cfg
        )
        assert bool(s_cold.converged.all()) and bool(s_warm.converged.all())
        cold += int(s_cold.iterations.sum())
        warm += int(s_warm.iterations.sum())
        prim += int(s_prim.iterations.sum())
        ws, ws_p = l_w, l_p
    assert warm < 0.8 * cold, (warm, cold)
    assert prim > 0.95 * cold, (prim, cold)   # primal-only: no help
    # unchanged problem, dual-warm from own solution: immediate convergence
    _, s_re = dq.solve_qcqp_with_stats(P, q, l_n, mu, warm_start=ws, config=wcfg)
    assert int(s_re.iterations.max()) <= 5
