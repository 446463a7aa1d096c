"""Ruiz equilibration (ops/equilibrate.py + cfg.equilibrate): the
reference's own pathological benchmark generator (exp-diag P, huge condition
spread, test_script.py:144-149) becomes tractable, solutions and gradients
match the unequilibrated solver on benign problems, and constraint sets map
correctly (disk stays a disk)."""

import numpy as np

import jax
import jax.numpy as jnp

import diffqcqp_tpu as dq
from diffqcqp_tpu.ops.equilibrate import isotropize, ruiz_diag, scale_problem

from .conftest import random_spd


def test_ruiz_normalizes_rows(rng):
    b, n = 6, 10
    d4 = np.exp(rng.uniform(-6, 6, (b, n)))
    P = np.eye(n) * d4[:, None, :]
    P = P + 0.01 * random_spd(rng, b, n)
    d = ruiz_diag(jnp.asarray(P))
    Pe, _ = scale_problem(jnp.asarray(P), jnp.zeros((b, n)), d)
    norms = np.array(jnp.max(jnp.abs(Pe), axis=-1))
    assert np.all(norms < 1.5) and np.all(norms > 0.4)


def test_equilibrated_qp_matches_plain(rng):
    b, n = 8, 10
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    l0 = dq.solve_qp(jnp.asarray(P), jnp.asarray(q), eps=1e-11, max_iter=5000)
    cfg = dq.SolverConfig(eps=1e-11, max_iter=5000, equilibrate=True)
    l1, st = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg)
    assert bool(np.all(np.array(st.converged)))
    np.testing.assert_allclose(np.array(l1), np.array(l0), atol=1e-8)


def test_equilibration_solves_exp_diag_pathology(rng):
    """Condition ~e^24: the raw absolute-eps solver caps out; the
    equilibrated one converges and satisfies the KKT system."""
    b, n = 4, 8
    d = np.exp(rng.uniform(-3, 3, (b, n)))
    P = np.eye(n) * (d**4)[:, None, :] + 1e-6 * np.eye(n)
    q = rng.standard_normal((b, n)) * d**2
    cfg_raw = dq.SolverConfig(eps=1e-9, max_iter=3000)
    _, st_raw = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg_raw)
    cfg_eq = cfg_raw.replace(equilibrate=True)
    l, st = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg_eq)
    assert bool(np.all(np.array(st.converged)))
    assert int(np.max(np.array(st.iterations))) <= int(np.max(np.array(st_raw.iterations)))
    # KKT of the ORIGINAL problem: l >= 0; on free set P l + q ~ 0 relative
    ln = np.array(l)
    plq = np.einsum("bij,bj->bi", P, ln) + q
    free = ln > 1e-9
    scale = np.abs(np.einsum("bij,bj->bi", P, ln)) + np.abs(q) + 1e-12
    rel = np.abs(plq) / scale
    assert float(np.max(np.where(free, rel, 0.0))) < 1e-5
    assert float(np.min(ln)) >= -1e-12


def test_equilibrated_qcqp_feasible_and_matching(rng):
    b, nc = 6, 4
    n = 2 * nc
    P = random_spd(rng, b, n)
    # anisotropic coordinate scaling to force a non-trivial isotropize
    sc = np.exp(rng.uniform(-1.5, 1.5, (b, n)))
    P = P * sc[:, :, None] * sc[:, None, :]
    q = rng.standard_normal((b, n)) * sc
    l_n = rng.random((b, nc)) * 0.5 + 0.1
    mu = rng.random((b, nc)) * 0.5 + 0.1
    args = tuple(map(jnp.asarray, (P, q, l_n, mu)))
    l0 = dq.solve_qcqp(*args, eps=1e-11, max_iter=20000)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-11, max_iter=20000, equilibrate=True)
    l1, st = dq.solve_qcqp_with_stats(*args, config=cfg)
    assert bool(np.all(np.array(st.converged)))
    np.testing.assert_allclose(np.array(l1), np.array(l0), atol=1e-7)
    pts = np.array(l1).reshape(b, nc, 2)
    assert np.all(np.linalg.norm(pts, axis=-1) <= l_n * mu + 1e-9)


def test_equilibrated_gradients_match(rng):
    """Gradients differentiate the ORIGINAL problem regardless of scaling."""
    b, n = 4, 6
    P = random_spd(rng, b, n)
    q = -np.abs(rng.standard_normal((b, n))) - 0.1
    cfg = dq.SolverConfig(eps=1e-12, max_iter=20000, equilibrate=True)

    def f_eq(q):
        return jnp.sum(dq.solve_qp(jnp.asarray(P), q, config=cfg) ** 2)

    def f_plain(q):
        return jnp.sum(
            dq.solve_qp(jnp.asarray(P), q, eps=1e-12, max_iter=20000) ** 2
        )

    qj = jnp.asarray(q)
    g_eq = jax.grad(f_eq)(qj)
    g_plain = jax.grad(f_plain)(qj)
    np.testing.assert_allclose(np.array(g_eq), np.array(g_plain), atol=1e-8)
