"""Full-Jacobian API (diff/jacobian.py) vs jax.jacrev of the public solvers.

jacrev drives the custom_vjp backward once per output coordinate (n
re-assembled, re-factorised KKT solves); the jacobian module assembles the
same system once and multi-RHS-solves it. Agreement must therefore be exact
up to linear-solver roundoff - same masks, same blocks, same chain rule.
Runs in float64 on CPU (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffqcqp_tpu as dq
from diffqcqp_tpu.diff.jacobian import (
    box_qp_jacobian,
    qcqp_jacobian,
    qp_jacobian,
    signed_box_qp_jacobian,
)

from .conftest import random_spd

CFG = dq.SolverConfig(eps=1e-11, max_iter=20000)
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-11, max_iter=20000)
TOL = dict(atol=1e-7, rtol=1e-6)


def _per_item_jacrev(solve, argnums, *args):
    """vmap of per-problem jacrev over the batch: rows [i, j] = dl_i/darg_j."""

    def single(*a):
        return jax.jacrev(solve, argnums=argnums)(*a)

    return jax.vmap(single)(*args)


@pytest.fixture()
def qp_batch(rng):
    b, n = 4, 6
    P = jnp.asarray(random_spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)))  # mixed active/inactive
    return P, q


def test_qp_jacobian_vs_jacrev(qp_batch):
    P, q = qp_batch
    jac = qp_jacobian(P, q, config=CFG, include_dP=True)
    ref_P, ref_q = _per_item_jacrev(
        lambda P_, q_: dq.solve_qp(P_, q_, config=CFG), (0, 1), P, q
    )
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(ref_q), **TOL)
    np.testing.assert_allclose(np.array(jac.dl_dP), np.array(ref_P), **TOL)


def test_qp_jacobian_accepts_precomputed_solution(qp_batch):
    P, q = qp_batch
    l = dq.solve_qp(P, q, config=CFG)
    jac = qp_jacobian(P, q, l=l, config=CFG)
    ref = qp_jacobian(P, q, config=CFG)
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(ref.dl_dq))
    assert jac.dl_dP is None


def test_qp_jacobian_unbatched_layout(rng):
    P = jnp.asarray(random_spd(rng, 1, 5)[0])
    q = jnp.asarray(rng.standard_normal(5))
    jac = qp_jacobian(P, q, config=CFG)
    assert jac.dl_dq.shape == (5, 5)
    ref = jax.jacrev(lambda q_: dq.solve_qp(P, q_, config=CFG))(q)
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(ref), **TOL)


def test_qp_jacobian_diagonal_P(rng):
    b, n = 3, 8
    P = jnp.asarray(rng.random((b, n)) + 0.5)
    q = jnp.asarray(rng.standard_normal((b, n)))
    jac = qp_jacobian(P, q, config=CFG)
    ref = _per_item_jacrev(
        lambda P_, q_: dq.solve_qp(P_, q_, config=CFG), (1,), P, q
    )[0]
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(ref), **TOL)


def test_box_jacobian_vs_jacrev(rng):
    b, n = 4, 6
    P = jnp.asarray(random_spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.3)
    hi = jnp.asarray(rng.random((b, n)) * 0.3)
    jac = box_qp_jacobian(P, q, lo, hi, config=CFG, include_dP=True)
    refs = _per_item_jacrev(
        lambda P_, q_, lo_, hi_: dq.solve_box_qp(P_, q_, lo_, hi_, config=CFG),
        (0, 1, 2, 3),
        P, q, lo, hi,
    )
    np.testing.assert_allclose(np.array(jac.dl_dP), np.array(refs[0]), **TOL)
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(refs[1]), **TOL)
    np.testing.assert_allclose(
        np.array(jac.dl_dl_min), np.array(refs[2]), **TOL
    )
    np.testing.assert_allclose(
        np.array(jac.dl_dl_max), np.array(refs[3]), **TOL
    )


def test_signed_box_jacobian_vs_jacrev(rng):
    b, n = 4, 6
    P = jnp.asarray(random_spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)
    lo = jnp.asarray(-rng.random((b, n)) * 0.5 - 0.2)
    hi = jnp.asarray(rng.random((b, n)) * 0.5 + 0.2)
    v = jnp.asarray(rng.standard_normal((b, n)))
    jac = signed_box_qp_jacobian(P, q, lo, hi, v, config=CFG)
    refs = _per_item_jacrev(
        lambda P_, q_, lo_, hi_, v_: dq.solve_signed_box_qp(
            P_, q_, lo_, hi_, v_, config=CFG
        ),
        (1, 2, 3),
        P, q, lo, hi, v,
    )
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(refs[0]), **TOL)
    np.testing.assert_allclose(
        np.array(jac.dl_dl_min), np.array(refs[1]), **TOL
    )
    np.testing.assert_allclose(
        np.array(jac.dl_dl_max), np.array(refs[2]), **TOL
    )


def test_qcqp_jacobian_vs_jacrev(rng):
    b, nc = 4, 3
    n = 2 * nc
    P = jnp.asarray(random_spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 2.0)  # push onto the cones
    l_n = jnp.asarray(rng.random((b, nc)) * 0.4 + 0.05)
    mu = jnp.asarray(rng.random((b, nc)) * 0.5 + 0.2)
    jac = qcqp_jacobian(P, q, l_n, mu, config=QCFG, include_dP=True)
    refs = _per_item_jacrev(
        lambda P_, q_, ln_, mu_: dq.solve_qcqp(P_, q_, ln_, mu_, config=QCFG),
        (0, 1, 2, 3),
        P, q, l_n, mu,
    )
    # at least one cone must actually bind or the radius blocks are all-zero
    assert float(jnp.max(jnp.abs(jac.dl_dl_n))) > 0.0
    np.testing.assert_allclose(np.array(jac.dl_dP), np.array(refs[0]), **TOL)
    np.testing.assert_allclose(np.array(jac.dl_dq), np.array(refs[1]), **TOL)
    np.testing.assert_allclose(np.array(jac.dl_dl_n), np.array(refs[2]), **TOL)
    np.testing.assert_allclose(np.array(jac.dl_dmu), np.array(refs[3]), **TOL)


def test_qcqp_jacobian_inactive_cones(rng):
    """Roomy cones: nothing binds, dl_dq = -P^{-1}, radius blocks vanish."""
    b, nc = 2, 2
    n = 2 * nc
    P = jnp.asarray(random_spd(rng, b, n))
    q = jnp.asarray(rng.standard_normal((b, n)) * 1e-3)
    l_n = jnp.full((b, nc), 10.0)
    mu = jnp.full((b, nc), 1.0)
    jac = qcqp_jacobian(P, q, l_n, mu, config=QCFG)
    np.testing.assert_allclose(
        np.array(jac.dl_dq), -np.linalg.inv(np.array(P)), **TOL
    )
    assert float(jnp.max(jnp.abs(jac.dl_dl_n))) == 0.0
    assert float(jnp.max(jnp.abs(jac.dl_dmu))) == 0.0


def test_jacobian_jit_compatible(qp_batch):
    P, q = qp_batch
    l = dq.solve_qp(P, q, config=CFG)
    f = jax.jit(lambda P_, q_, l_: qp_jacobian(P_, q_, l=l_, config=CFG))
    jac = f(P, q, l)
    ref = qp_jacobian(P, q, l=l, config=CFG)
    np.testing.assert_allclose(
        np.array(jac.dl_dq), np.array(ref.dl_dq), **TOL
    )
