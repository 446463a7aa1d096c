"""Unit tests for the proximal projection operators (ops/prox.py)."""

import jax.numpy as jnp
import numpy as np

from diffqcqp_tpu.ops import prox_box, prox_disk, prox_nonneg, prox_signed_box


def test_prox_nonneg():
    x = jnp.array([[-1.0, 0.0, 2.5], [3.0, -0.1, 0.0]])
    out = prox_nonneg(x)
    np.testing.assert_array_equal(out, [[0.0, 0.0, 2.5], [3.0, 0.0, 0.0]])


def test_prox_box():
    x = jnp.array([[-2.0, 0.5, 3.0]])
    lo = jnp.array([[-1.0, 0.0, 0.0]])
    hi = jnp.array([[1.0, 1.0, 2.0]])
    np.testing.assert_array_equal(prox_box(x, lo, hi), [[-1.0, 0.5, 2.0]])


def test_prox_box_upper_wins_when_bounds_cross():
    # clamp-to-min then clamp-to-max, matching Solver.cpp:219-220 ordering
    x = jnp.array([[0.0]])
    lo = jnp.array([[2.0]])
    hi = jnp.array([[1.0]])
    np.testing.assert_array_equal(prox_box(x, lo, hi), [[1.0]])


def test_prox_signed_box():
    x = jnp.array([[0.5, -0.5, 0.5, -0.5]])
    lo = jnp.full((1, 4), -1.0)
    hi = jnp.full((1, 4), 1.0)
    v = jnp.array([[1.0, 1.0, -2.0, -3.0]])
    vs = jnp.sign(v)
    out = prox_signed_box(x, lo, hi, vs)
    # v>0 -> l<=0: 0.5->0, -0.5 stays; v<0 -> l>=0: 0.5 stays, -0.5->0
    np.testing.assert_array_equal(out, [[0.0, -0.5, 0.5, 0.0]])


def test_prox_signed_box_zero_sign_passes_through():
    # sign(0) = 0 makes the constraint vacuous for that coordinate... the
    # composition v*min(v*l, 0) with v=0 zeroes the coordinate, matching
    # the reference's formula (Solver.cpp:398).
    x = jnp.array([[0.7]])
    lo, hi = jnp.array([[-1.0]]), jnp.array([[1.0]])
    out = prox_signed_box(x, lo, hi, jnp.sign(jnp.array([[0.0]])))
    np.testing.assert_array_equal(out, [[0.0]])


def test_prox_disk_matches_per_contact_loop(rng):
    b, nc = 5, 4
    x = rng.standard_normal((b, 2 * nc))
    r = rng.random((b, nc))
    out = np.array(prox_disk(jnp.array(x), jnp.array(r)))
    expected = x.copy()
    for bi in range(b):
        for i in range(nc):
            seg = x[bi, 2 * i : 2 * i + 2]
            nrm = np.linalg.norm(seg)
            if nrm > r[bi, i]:
                expected[bi, 2 * i : 2 * i + 2] = seg * r[bi, i] / nrm
    np.testing.assert_allclose(out, expected, rtol=1e-13, atol=1e-14)


def test_prox_disk_zero_radius_and_zero_vector():
    x = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    r = jnp.array([[0.0, 0.0]])
    out = np.array(prox_disk(x, r))
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.0, 0.0]], atol=1e-15)
