"""Large-N engine paths (VERDICT r2 item 2: kill the eigh setup cliff).

Covers: the batched-Cholesky explicit-inverse engine mode
(SolverConfig.linsolve='chol', auto-selected for dense N > 48), the SPD
Cholesky backward solve of the QP class, and the Schur-complement XLA
backward of the QCQP class (auto-selected when nc + n > 88) - each against
the established spectral/LU paths on identical problems.
"""

import jax
import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from diffqcqp_tpu.diff import kkt


def _dense_problem(rng, spd, b, n):
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    return P, q


def test_chol_engine_matches_spectral_qp(rng, spd):
    b, n = 8, 96
    P, q = _dense_problem(rng, spd, b, n)
    cfg = dq.SolverConfig(eps=1e-10, max_iter=5000)
    l_s, st_s = dq.solve_qp_with_stats(
        P, q, config=cfg.replace(linsolve="spectral")
    )
    l_c, st_c = dq.solve_qp_with_stats(P, q, config=cfg.replace(linsolve="chol"))
    assert bool(np.all(np.asarray(st_c.converged)))
    np.testing.assert_allclose(np.asarray(l_c), np.asarray(l_s), atol=5e-9)
    # auto at N=96 picks chol; same answers either way
    l_a, _ = dq.solve_qp_with_stats(P, q, config=cfg)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_c), atol=0)


def test_chol_engine_matches_spectral_qcqp(rng, spd):
    b, nc = 6, 48
    n = 2 * nc
    P, q = _dense_problem(rng, spd, b, n)
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=20000)
    l_s, _ = dq.solve_qcqp_with_stats(
        P, q, l_n, mu, config=cfg.replace(linsolve="spectral")
    )
    l_c, st_c = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)
    assert bool(np.all(np.asarray(st_c.converged)))
    np.testing.assert_allclose(np.asarray(l_c), np.asarray(l_s), atol=1e-7)


def test_large_n_qp_gradient_fd(rng, spd):
    """N=96 QP backward (SPD-Cholesky solve path): full-loss FD check."""
    b, n = 4, 96
    P, q = _dense_problem(rng, spd, b, n)
    cfg = dq.SolverConfig(eps=1e-10, max_iter=5000)

    def loss(q):
        return jnp.sum(dq.solve_qp(P, q, config=cfg) ** 2)

    g = np.asarray(jax.grad(loss)(q))
    i = np.unravel_index(int(np.argmax(np.abs(g))), g.shape)
    h = 1e-6
    qn = np.asarray(q)
    up, dn = qn.copy(), qn.copy()
    up[i] += h
    dn[i] -= h
    fd = (float(loss(jnp.asarray(up))) - float(loss(jnp.asarray(dn)))) / (2 * h)
    assert abs(fd - g[i]) / max(abs(fd), 1e-12) < 1e-6


def test_newton_schulz_inverse_f32(rng, spd):
    """The f32 engine/backward inverse path: NS reaches f32 working
    precision from both inits (spectral-shifted and 1/lmax)."""
    from diffqcqp_tpu.diff.kkt import _spd_inverse_f32
    from diffqcqp_tpu.ops.linalg import ns_inverse_shifted

    b, n = 6, 96
    P64 = np.asarray(spd(rng, b, n))
    P = jnp.asarray(P64.astype(np.float32))
    shift = jnp.full((b,), 0.5, jnp.float32)
    inv = np.asarray(ns_inverse_shifted(P, shift), np.float64)
    M = P64 + 0.5 * np.eye(n)
    resid = np.max(np.abs(np.einsum("bij,bjk->bik", M, inv) - np.eye(n)))
    assert resid < 5e-5

    inv2 = np.asarray(_spd_inverse_f32(jnp.asarray(M.astype(np.float32))),
                      np.float64)
    resid2 = np.max(np.abs(np.einsum("bij,bjk->bik", M, inv2) - np.eye(n)))
    assert resid2 < 5e-5


def test_ns_adaptive_accuracy(rng, spd):
    """The measured NS stopping rule (newton_schulz_inverse_adaptive):
    must reach the f32 floor on both an easy and an ill-conditioned
    shift - the accuracy contract that must survive the step-count
    optimisation (well-conditioned batches stop after few steps)."""
    from diffqcqp_tpu.ops.linalg import ns_inverse_shifted

    b, n = 6, 64
    P64 = np.asarray(spd(rng, b, n))
    P = jnp.asarray(P64.astype(np.float32))
    for sh in (1.0, 1e-4):   # easy / ill-conditioned shift
        shift = jnp.full((b,), sh, jnp.float32)
        inv = np.asarray(ns_inverse_shifted(P, shift), np.float64)
        M = P64 + sh * np.eye(n)
        resid = np.max(np.abs(np.einsum("bij,bjk->bik", M, inv) - np.eye(n)))
        assert resid < 5e-5, (sh, resid)


def test_f32_chol_engine_matches_nnls(rng, spd):
    """The f32 production path at N=96 (NS inverse engine + NS backward)
    against the EXACT scipy NNLS oracle."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "benchmarks"
    ))
    from external_oracle import nnls_solve_batch

    b, n = 16, 96
    P = np.asarray(spd(rng, b, n)).astype(np.float32)
    q = rng.standard_normal((b, n)).astype(np.float32)
    cfg = dq.SolverConfig(eps=1e-7, max_iter=400, rho_update_period=24)
    l, st = dq.solve_qp_with_stats(jnp.asarray(P), jnp.asarray(q), config=cfg)
    assert bool(np.all(np.asarray(st.converged)))
    exact = nnls_solve_batch(P, q)
    assert np.max(np.abs(np.asarray(l, np.float64) - exact)) < 1e-4


def test_qcqp_schur_matches_lu(rng, spd):
    """The Schur-complement backward (used when nc + n > 88) reproduces the
    direct-LU saddle solve on identical problems - compared on a SMALL
    system where both paths are callable."""
    b, nc = 10, 6
    n = 2 * nc
    P, q = _dense_problem(rng, spd, b, n)
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=20000)
    radius = l_n * mu
    l = dq.solve_qcqp(P, q, l_n, mu, config=cfg)
    g = jnp.array(rng.standard_normal((b, n)))

    lu = kkt.qcqp_vjp(P, q, radius, l, g, cfg)        # nc + n = 18 -> LU
    duals = kkt.qcqp_dual(P, q, radius, l, cfg)
    s, active = kkt.qcqp_strict_active(l, radius, duals.gamma, cfg)
    schur = kkt._qcqp_schur_vjp(
        P, l, g, s, active.astype(l.dtype), duals.gamma, nc, n
    )
    np.testing.assert_allclose(
        np.asarray(schur.dl), np.asarray(lu.dl), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(schur.dgamma), np.asarray(lu.dgamma), atol=1e-8
    )


def test_large_n_qcqp_gradient_fd(rng, spd):
    """nc + n > 88 (the auto-Schur regime): full-loss FD check at N=60."""
    b, nc = 3, 30
    n = 2 * nc
    P, q = _dense_problem(rng, spd, b, n)
    l_n = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    mu = jnp.array(rng.random((b, nc)) * 0.5 + 0.05)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=20000)

    def loss(q):
        return jnp.sum(dq.solve_qcqp(P, q, l_n, mu, config=cfg) ** 2)

    g = np.asarray(jax.grad(loss)(q))
    i = np.unravel_index(int(np.argmax(np.abs(g))), g.shape)
    h = 1e-6
    qn = np.asarray(q)
    up, dn = qn.copy(), qn.copy()
    up[i] += h
    dn[i] -= h
    fd = (float(loss(jnp.asarray(up))) - float(loss(jnp.asarray(dn)))) / (2 * h)
    assert abs(fd - g[i]) / max(abs(fd), 1e-12) < 1e-5


def test_ns_adaptive_is_differentiable(rng, spd):
    """The adaptive NS inverse carries the exact implicit derivative
    d(M^{-1}) = -M^{-1} dM M^{-1} as a custom VJP (a lax.while_loop is not
    reverse-differentiable through); FD-checked on the exported helper in
    f64, where the dtype-aware tol must also reach the f64 floor."""
    from diffqcqp_tpu.ops.linalg import ns_inverse_shifted

    b, n = 3, 16
    P = jnp.asarray(np.asarray(spd(rng, b, n)))
    shift = jnp.asarray(rng.random(b) + 0.5)
    w = jnp.asarray(rng.standard_normal((b, n, n)))

    def loss(P):
        return jnp.sum(ns_inverse_shifted(P, shift) * w)

    g = jax.grad(loss)(P)
    d = jnp.asarray(rng.standard_normal(P.shape))
    d = 0.5 * (d + jnp.swapaxes(d, -1, -2))   # stay in the SPD manifold
    h = 1e-6
    fd = (loss(P + h * d) - loss(P - h * d)) / (2 * h)
    an = jnp.sum(g * d)
    assert abs(float(fd - an)) / max(abs(float(fd)), 1e-30) < 1e-7


def test_ns_adaptive_vmap_composability(rng, spd):
    """The adaptive NS inverse composes with vmap and vmap-of-grad: the
    measured-stopping while_loop batches (each vmapped group runs to its
    own worst residual) and the custom VJP batches with it."""
    from diffqcqp_tpu.ops.linalg import ns_inverse_shifted

    G, b, n = 3, 4, 12
    S = (rng.standard_normal((G, b, n, n)) / np.sqrt(n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 1, 3, 2) + 0.5 * np.eye(n, dtype=np.float32))
    shift = jnp.asarray((rng.random((G, b)) + 0.5).astype(np.float32))
    X = jax.vmap(ns_inverse_shifted)(P, shift)
    M = np.asarray(P, np.float64) + np.asarray(shift, np.float64)[
        ..., None, None
    ] * np.eye(n)
    R = np.eye(n) - np.einsum("gbij,gbjk->gbik", M, np.asarray(X, np.float64))
    assert float(np.abs(R).max()) < 5e-5

    w = jnp.asarray(rng.standard_normal((G, b, n, n)).astype(np.float32))

    def loss(P, shift, w):
        return jnp.sum(ns_inverse_shifted(P, shift) * w)

    g = jax.vmap(jax.grad(loss))(P, shift, w)
    assert bool(jnp.isfinite(g).all()) and g.shape == P.shape
