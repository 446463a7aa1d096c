"""Forward-solve correctness for box and signed-box QPs."""

import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from tests import np_reference as ref

CFG = dq.SolverConfig(eps=1e-10, max_iter=5000)


def test_box_diagonal_closed_form(rng):
    b, n = 16, 8
    d = rng.random((b, n)) + 0.1
    q = rng.standard_normal((b, n))
    lo = -rng.random((b, n)) - 0.2
    hi = rng.random((b, n)) + 0.2
    l = np.array(
        dq.solve_box_qp(jnp.array(d), jnp.array(q), jnp.array(lo), jnp.array(hi), config=CFG)
    )
    expected = np.clip(-q / d, lo, hi)
    np.testing.assert_allclose(l, expected, atol=1e-7)


def test_box_matches_reference_recipe(rng, spd):
    b, n = 4, 6
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    lo = -(rng.random((b, n)) * 0.5 + 1.0)
    hi = rng.random((b, n)) * 0.5 + 1.0
    # rho_sync=False reproduces the reference's exact per-problem staggered
    # rho schedule (Solver.cpp:93), so the trajectories - not just the fixed
    # points - coincide and the comparison is tight.
    cfg = CFG.replace(lmax_method="power", power_iters=10, rho_sync=False)
    l = np.array(
        dq.solve_box_qp(jnp.array(P), jnp.array(q), jnp.array(lo), jnp.array(hi), config=cfg)
    )
    for i in range(b):
        l_ref, _, _, _ = ref.solve_box_qp(P[i], q[i], lo[i], hi[i], eps=1e-10, max_iter=5000)
        np.testing.assert_allclose(l[i], l_ref, atol=1e-7)


def test_box_kkt(rng, spd):
    b, n = 8, 10
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n)) * 2
    lo = -(rng.random((b, n)) * 0.5 + 0.3)
    hi = rng.random((b, n)) * 0.5 + 0.3
    l, stats = dq.solve_box_qp_with_stats(
        jnp.array(P), jnp.array(q), jnp.array(lo), jnp.array(hi), config=CFG
    )
    assert bool(np.all(stats.converged))
    l = np.array(l)
    assert np.all(l >= lo - 1e-9) and np.all(l <= hi + 1e-9)
    Plq = np.einsum("bij,bj->bi", P, l) + q
    interior = (l > lo + 1e-7) & (l < hi - 1e-7)
    assert np.abs(np.where(interior, Plq, 0.0)).max() < 1e-6
    # at lower bound the gradient must push down (Plq >= 0), at upper up.
    at_lo = l <= lo + 1e-7
    at_hi = l >= hi - 1e-7
    assert np.where(at_lo & ~at_hi, Plq, 0.0).min() > -1e-6
    assert np.where(at_hi & ~at_lo, Plq, 0.0).max() < 1e-6


def test_signed_box_diagonal_closed_form(rng):
    b, n = 16, 8
    d = rng.random((b, n)) + 0.1
    q = rng.standard_normal((b, n))
    lo = np.full((b, n), -1.0)
    hi = np.full((b, n), 1.0)
    v = rng.standard_normal((b, n))
    l = np.array(
        dq.solve_signed_box_qp(
            jnp.array(d), jnp.array(q), jnp.array(lo), jnp.array(hi), jnp.array(v), config=CFG
        )
    )
    # coordinate-separable: minimise .5 d x^2 + q x over [lo, hi] with
    # sign(v) x <= 0
    unc = -q / d
    vs = np.sign(v)
    lo_eff = np.where(vs > 0, lo, np.where(vs < 0, 0.0, 0.0))
    hi_eff = np.where(vs > 0, 0.0, np.where(vs < 0, hi, 0.0))
    expected = np.clip(unc, lo_eff, hi_eff)
    np.testing.assert_allclose(l, expected, atol=1e-7)


def test_signed_box_matches_reference_recipe(rng, spd):
    b, n = 4, 6
    P = spd(rng, b, n)
    q = rng.standard_normal((b, n))
    lo = -(rng.random((b, n)) * 0.5 + 1.0)
    hi = rng.random((b, n)) * 0.5 + 1.0
    v = rng.standard_normal((b, n))
    cfg = CFG.replace(lmax_method="power", power_iters=10, rho_sync=False)
    l = np.array(
        dq.solve_signed_box_qp(
            jnp.array(P), jnp.array(q), jnp.array(lo), jnp.array(hi), jnp.array(v), config=cfg
        )
    )
    for i in range(b):
        l_ref, _, _, _ = ref.solve_signed_box_qp(
            P[i], q[i], lo[i], hi[i], v[i], eps=1e-10, max_iter=5000
        )
        np.testing.assert_allclose(l[i], l_ref, atol=1e-7)


def test_primal_check_fixes_corner_false_convergence(rng, spd):
    """The reference's dual-only QP stopping rule (Solver.cpp:88) falsely
    certifies convergence when iterates park at a box corner: the prox
    output l2 repeats exactly (res_dual == 0) while the primal split
    ||l - l2|| is still O(1). cfg.primal_check (default on) closes it;
    primal_check=False reproduces the reference behaviour, demonstrated
    here on instances the exact BVLS oracle flagged (test_oracle.py has
    the oracle-side agreement checks)."""
    from diffqcqp_tpu import verify

    b, n = 16, 10
    P = np.asarray(spd(rng, b, n), np.float64)
    q = rng.standard_normal((b, n))
    lo = -(rng.random((b, n)) * 0.5 + 0.05)
    hi = rng.random((b, n)) * 0.5 + 0.05
    # the corner-parking regime: narrow one-sided boxes ([lo, 0] / [0, hi]
    # per coordinate, as the signed-box class induces) with one pinned
    # coordinate - wide symmetric boxes behave like the nonneg QP and
    # rarely trigger the mode
    s = np.sign(rng.standard_normal((b, n)))
    s[:, 0] = 0.0
    lo = np.where(s > 0, lo, np.where(s < 0, np.maximum(lo, 0.0), 0.0))
    hi = np.where(s > 0, np.minimum(hi, 0.0), np.where(s < 0, hi, 0.0))
    ref_cfg = CFG.replace(primal_check=False)
    l_ref, st_ref = dq.solve_box_qp_with_stats(P, q, lo, hi, config=ref_cfg)
    l_fix, st_fix = dq.solve_box_qp_with_stats(P, q, lo, hi, config=CFG)
    obj_ref = np.einsum("bi,bij,bj->b", np.array(l_ref), P, np.array(l_ref)) / 2 + np.einsum(
        "bi,bi->b", q, np.array(l_ref)
    )
    obj_fix = np.einsum("bi,bij,bj->b", np.array(l_fix), P, np.array(l_fix)) / 2 + np.einsum(
        "bi,bi->b", q, np.array(l_fix)
    )
    # reference mode claims convergence yet lands measurably above the
    # optimum on at least one instance of this batch
    assert bool(np.asarray(st_ref.converged).all())
    assert float(np.max(obj_ref - obj_fix)) > 1e-4
    # the fixed default is eps-certified AND stationary
    assert bool(np.asarray(st_fix.converged).all())
    res = verify.check_box_qp(P, q, lo, hi, np.array(l_fix))
    assert float(np.max(np.asarray(res.stationarity))) < 1e-6
    assert float(np.max(obj_fix - obj_ref)) < 1e-9  # never worse
