"""Diagonal-P closed-form backwards: parity with the dense generic path.

Diagonal P (the representation the reference supports in its unbatched
wrapper, qcqp_no_batch.py:44-47) decouples every KKT adjoint into
elementwise closed forms (diff/kkt.py diagonal branches) - these tests pin
them against the dense path evaluated on diag(P), end-to-end through
jax.grad, for all four problem classes.
"""

import jax
import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq

CFG = dq.SolverConfig(eps=1e-10, max_iter=5000, backend="xla")
QCFG = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=20000, backend="xla")


def _dense(Pd):
    return Pd[..., None] * jnp.eye(Pd.shape[-1], dtype=Pd.dtype)


def _cmp(g_diag, g_dense, atol=1e-8):
    for a, b in zip(g_diag, g_dense):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=atol)


def test_qp_diag_grads_match_dense(rng):
    b, n = 10, 8
    Pd = jnp.asarray(rng.random((b, n)) + 0.3)
    q = jnp.asarray(rng.standard_normal((b, n)))

    def loss_diag(Pd, q):
        return jnp.sum(dq.solve_qp(Pd, q, config=CFG) ** 2)

    def loss_dense(Pd, q):
        return jnp.sum(dq.solve_qp(_dense(Pd), q, config=CFG) ** 2)

    gd = jax.grad(loss_diag, argnums=(0, 1))(Pd, q)
    # the dense loss differentiates THROUGH the diag embedding, so its
    # grad wrt Pd is already diagonal-shaped
    gf = jax.grad(loss_dense, argnums=(0, 1))(Pd, q)
    np.testing.assert_allclose(np.array(gd[0]), np.array(gf[0]), atol=1e-8)
    np.testing.assert_allclose(np.array(gd[1]), np.array(gf[1]), atol=1e-8)


def test_box_diag_grads_match_dense(rng):
    b, n = 10, 8
    Pd = jnp.asarray(rng.random((b, n)) + 0.3)
    q = jnp.asarray(rng.standard_normal((b, n)))
    lo = jnp.asarray(-(rng.random((b, n)) * 0.4 + 0.05))
    hi = jnp.asarray(rng.random((b, n)) * 0.4 + 0.05)

    def loss(P, q, lo, hi):
        return jnp.sum(dq.solve_box_qp(P, q, lo, hi, config=CFG) ** 2)

    gd = jax.grad(loss, argnums=(1, 2, 3))(Pd, q, lo, hi)
    gf = jax.grad(loss, argnums=(1, 2, 3))(_dense(Pd), q, lo, hi)
    _cmp(gd, gf)


def test_signed_box_diag_grads_match_dense(rng):
    b, n = 10, 8
    Pd = jnp.asarray(rng.random((b, n)) + 0.3)
    q = jnp.asarray(rng.standard_normal((b, n)))
    lo = jnp.asarray(-(rng.random((b, n)) * 0.4 + 0.05))
    hi = jnp.asarray(rng.random((b, n)) * 0.4 + 0.05)
    v = jnp.asarray(rng.standard_normal((b, n)))

    def loss(P, q, lo, hi):
        return jnp.sum(
            dq.solve_signed_box_qp(P, q, lo, hi, v, config=CFG) ** 2
        )

    gd = jax.grad(loss, argnums=(1, 2, 3))(Pd, q, lo, hi)
    gf = jax.grad(loss, argnums=(1, 2, 3))(_dense(Pd), q, lo, hi)
    _cmp(gd, gf)


def test_qcqp_diag_grads_match_dense(rng):
    b, nc = 8, 4
    n = 2 * nc
    Pd = jnp.asarray(rng.random((b, n)) + 0.3)
    q = jnp.asarray(rng.standard_normal((b, n)) * 0.5)
    l_n = jnp.asarray(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.asarray(rng.random((b, nc)) * 0.5 + 0.05)

    def loss(P, q, l_n, mu):
        return jnp.sum(dq.solve_qcqp(P, q, l_n, mu, config=QCFG) ** 2)

    gd = jax.grad(loss, argnums=(1, 2, 3))(Pd, q, l_n, mu)
    gf = jax.grad(loss, argnums=(1, 2, 3))(_dense(Pd), q, l_n, mu)
    _cmp(gd, gf, atol=1e-7)


def test_qp_diag_fd(rng):
    """Closed-form diagonal adjoint vs central finite differences."""
    b, n = 4, 6
    Pd = jnp.asarray(rng.random((b, n)) + 0.3)
    q = jnp.asarray(rng.standard_normal((b, n)))

    def loss(Pd, q):
        return jnp.sum(dq.solve_qp(Pd, q, config=CFG) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(Pd, q)
    eps = 1e-6
    for argnum, x in ((0, Pd), (1, q)):
        i, j = 1, 2
        args_up = [Pd, q]; args_up[argnum] = x.at[i, j].add(eps)
        args_dn = [Pd, q]; args_dn[argnum] = x.at[i, j].add(-eps)
        fd = (float(loss(*args_up)) - float(loss(*args_dn))) / (2 * eps)
        np.testing.assert_allclose(float(g[argnum][i, j]), fd, atol=1e-5)
