"""Forward-solve correctness for the friction-cone QCQP."""

import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from tests import np_reference as ref

CFG = dq.QCQP_DEFAULTS.replace(eps=1e-10, max_iter=20000)


def test_qcqp_isotropic_closed_form(rng):
    """With P = p*I per contact, the cone-constrained minimiser is the disk
    projection of the unconstrained minimiser."""
    b, nc = 8, 4
    n = 2 * nc
    p = rng.random((b, n)) * 0.0 + (rng.random((b, 1)) + 0.5)  # same p per problem
    q = rng.standard_normal((b, n))
    l_n = rng.random((b, nc)) * 0.5 + 0.05
    mu = rng.random((b, nc)) * 0.5 + 0.05
    l = np.array(
        dq.solve_qcqp(jnp.array(p), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=CFG)
    )
    unc = (-q / p).reshape(b, nc, 2)
    radius = (l_n * mu)[:, :, None]
    nrm = np.linalg.norm(unc, axis=-1, keepdims=True)
    scale = np.where(nrm > radius, radius / np.maximum(nrm, 1e-30), 1.0)
    expected = (unc * scale).reshape(b, n)
    np.testing.assert_allclose(l, expected, atol=1e-5)


def test_qcqp_matches_reference_recipe(rng, spd):
    b, nc = 4, 4
    n = 2 * nc
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    l_n = rng.random((b, nc))
    mu = rng.random((b, nc))
    cfg = CFG.replace(lmax_method="power", rho_sync=False)
    l = np.array(
        dq.solve_qcqp(jnp.array(P), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=cfg)
    )
    for i in range(b):
        l_ref, _, _, _ = ref.solve_qcqp(
            P[i], q[i], l_n[i], mu[i], eps=1e-10, max_iter=20000
        )
        np.testing.assert_allclose(l[i], l_ref, atol=1e-5)


def test_qcqp_feasibility_and_kkt(rng, spd):
    b, nc = 8, 4
    n = 2 * nc
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n)) * 2
    l_n = rng.random((b, nc)) * 0.3 + 0.01
    mu = rng.random((b, nc)) * 0.5 + 0.1
    l, stats = dq.solve_qcqp_with_stats(
        jnp.array(P), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=CFG
    )
    assert bool(np.all(stats.converged))
    l = np.array(l)
    radius = l_n * mu
    norms = np.linalg.norm(l.reshape(b, nc, 2), axis=-1)
    assert np.all(norms <= radius + 1e-6)
    # stationarity: Pl + q + 2 gamma_i l_(i) = 0 with gamma >= 0 at active
    Plq = np.einsum("bij,bj->bi", P, l) + q
    pts = l.reshape(b, nc, 2)
    g = Plq.reshape(b, nc, 2)
    active = norms > radius - 1e-6
    # on inactive cones the gradient must vanish
    assert np.abs(np.where(~active[..., None], g, 0.0)).max() < 1e-5
    # on active cones with nonzero radius, g must be antiparallel to l_(i)
    nz = active & (radius > 1e-6) & (norms > 1e-9)
    cross = g[..., 0] * pts[..., 1] - g[..., 1] * pts[..., 0]
    inner = np.sum(g * pts, axis=-1)
    assert np.abs(np.where(nz, cross, 0.0)).max() < 1e-4
    assert np.where(nz, inner, 0.0).max() < 1e-8  # gamma >= 0


def test_qcqp_degenerate_zero_radius(rng, spd):
    """l_n = 0 forces the contact forces to zero (degenerate cone,
    Solver.cpp:597 guard)."""
    b, nc = 4, 2
    n = 2 * nc
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    l_n = np.zeros((b, nc))
    mu = rng.random((b, nc))
    l = np.array(
        dq.solve_qcqp(jnp.array(P), jnp.array(q), jnp.array(l_n), jnp.array(mu), config=CFG)
    )
    np.testing.assert_allclose(l, 0.0, atol=1e-8)


def test_qcqp_dual_recovery_never_negative(rng, spd):
    """Dual-feasibility projection (diff/kkt.py::qcqp_dual): gamma >= 0
    even when the point is NOT a KKT point and the raw least-squares
    estimate -C^T(Pl+q)/(4||l||^2) comes out negative. Unclamped, a
    negative gamma makes D = P + 2*blockdiag(gamma) indefinite and NaNs
    the SPD adjoint paths (Cholesky f64 / Newton-Schulz f32)."""
    from diffqcqp_tpu.config import QCQP_DEFAULTS
    from diffqcqp_tpu.diff.kkt import qcqp_dual, qcqp_vjp

    # nc = 30 -> m = nc + n = 90 > 88: the SPD Schur-complement path,
    # where an indefinite D would NaN the batched Cholesky (the m <= 88
    # LU path is sign-agnostic and merely degrades)
    b, nc = 4, 30
    n = 2 * nc
    P = spd(rng, b, n)
    # adversarial primal: l exactly ON the cone boundary (active) but with
    # l . (Pl + q) > 0, so num = -2 l.(Pl+q) < 0 for every contact
    l = rng.standard_normal((b, n))
    radius = np.linalg.norm(l.reshape(b, nc, 2), axis=-1)  # slack = 0
    q = 0.5 * l - np.einsum("bij,bj->bi", P, l)            # Pl + q = l/2
    cfg = QCQP_DEFAULTS
    duals = qcqp_dual(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(radius), jnp.asarray(l), cfg
    )
    assert bool(jnp.all(duals.active))          # boundary points are active
    assert float(jnp.min(duals.gamma)) >= 0.0   # projection, not -1/4
    # the adjoint built on these duals stays finite
    g = rng.standard_normal((b, n))
    out = qcqp_vjp(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(radius), jnp.asarray(l),
        jnp.asarray(g), cfg, duals=duals
    )
    assert bool(jnp.isfinite(out.dl).all() & jnp.isfinite(out.dgamma).all())
