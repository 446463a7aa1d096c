"""Per-iteration trace helper (debug.py): identical trajectory to the
production engine, and histories that actually describe the solve."""

import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from diffqcqp_tpu import debug

CFG = dq.SolverConfig(eps=1e-10, max_iter=2000, backend="xla")


def test_trace_matches_production_solve(rng, spd):
    b, n = 8, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    tr = debug.trace_qp(P, q, iters=400, config=CFG)
    l_ref, st = dq.solve_qp_with_stats(P, q, config=CFG.replace(max_iter=400))
    np.testing.assert_allclose(np.array(tr.l2), np.array(l_ref), atol=0)
    np.testing.assert_array_equal(
        np.array(tr.iterations), np.array(st.iterations)
    )
    assert bool(np.all(np.array(tr.converged)))


def test_trace_histories_describe_convergence(rng, spd):
    b, n = 6, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    K = 300
    tr = debug.trace_qp(P, q, iters=K, config=CFG)
    rd = np.array(tr.res_dual)
    act = np.array(tr.active)
    its = np.array(tr.iterations)
    for i in range(b):
        k = its[i] - 1
        # the dual residual at each problem's final active step certifies eps
        assert rd[k, i] < CFG.eps or not tr.converged[i]
        # active flags count the iterations exactly
        assert act[:, i].sum() == its[i]
    # rho history: positive throughout, frozen after convergence
    rho = np.array(tr.rho)
    assert np.all(rho > 0)
    for i in range(b):
        k = its[i]
        assert np.all(rho[k:, i] == rho[k, i] if k < K else True)


def test_trace_qcqp_feasibility_over_time(rng, spd):
    b, nc = 4, 3
    n = 2 * nc
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    qcfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, backend="xla")
    tr = debug.trace_qcqp(P, q, l_n, mu, iters=2000, config=qcfg)
    assert bool(np.all(np.array(tr.converged)))
    # the residual trajectory is (eventually) decreasing to tolerance
    rd = np.array(tr.res_dual)
    assert np.all(rd[-1] <= 1e-9)


def test_trace_matches_production_with_equilibrate(rng, spd):
    """The trace must describe the solve production actually runs,
    including the Ruiz-equilibrated path (same iteration counts)."""
    b, n = 4, 8
    P = np.array(spd(rng, b, n))
    scales = np.exp(np.linspace(-2, 2, n))
    P = P * scales[None, :, None] * scales[None, None, :]
    q = rng.standard_normal((b, n)) * scales[None, :]
    cfg = CFG.replace(equilibrate=True, max_iter=500)
    tr = debug.trace_qp(jnp.array(P), jnp.array(q), iters=500, config=cfg)
    l_ref, st = dq.solve_qp_with_stats(jnp.array(P), jnp.array(q), config=cfg)
    np.testing.assert_array_equal(
        np.array(tr.iterations), np.array(st.iterations)
    )
    np.testing.assert_allclose(np.array(tr.l2), np.array(l_ref), atol=0)


def test_trace_signed_box(rng, spd):
    b, n = 4, 6
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    lo = jnp.array(-(rng.random((b, n)) * 0.4 + 0.05))
    hi = jnp.array(rng.random((b, n)) * 0.4 + 0.05)
    v = jnp.array(rng.standard_normal((b, n)))
    tr = debug.trace_signed_box_qp(P, q, lo, hi, v, iters=500, config=CFG)
    l_ref, st = dq.solve_signed_box_qp_with_stats(
        P, q, lo, hi, v, config=CFG.replace(max_iter=500)
    )
    np.testing.assert_allclose(np.array(tr.l2), np.array(l_ref), atol=0)
    np.testing.assert_array_equal(
        np.array(tr.iterations), np.array(st.iterations)
    )
