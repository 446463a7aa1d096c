"""Ruiz equilibration: diagonal rescaling of badly-conditioned problems.

The reference has no preconditioning - its own benchmark protocol generates
P with condition numbers up to ~e^40 (test_script.py:144-149 squares an
exp(U(-10,10)) diagonal twice), where a fixed-precision ADMM at absolute
eps either crawls or stalls. Ruiz equilibration (the OSQP recipe: repeatedly
divide each row/col by the sqrt of its inf-norm) computes a positive
diagonal D with P_eq = D P D having near-unit row norms; solving the
rescaled problem and mapping back converges in a few dozen iterations where
the raw problem needs thousands (or, in float32, never certifies).

Substitution l = D l_eq maps the constraint sets cleanly:

  non-negative:  l_eq >= 0                        (D > 0)
  box:           D^-1 l_min <= l_eq <= D^-1 l_max
  signed box:    sign(v) unchanged
  friction cone: per-contact ISOTROPIC scale d_i = sqrt(d_2i * d_2i+1)
                 (both coordinates of a contact must share one scale or the
                 disk would become an ellipse); radius_eq = radius / d_i.

The KKT differentiation (diff/kkt.py) always sees the ORIGINAL problem and
the mapped-back solution, so gradients are exact regardless of scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def ruiz_diag(P: Array, iters: int = 10) -> Array:
    """Equilibration diagonal d (B, N) > 0 such that diag(d) P diag(d) has
    ~unit inf-norm rows. P (B, N, N) dense or (B, N) diagonal.

    Zero-row guard: rows whose inf-norm sits at/below sqrt(dtype tiny)
    (~1e-19 in f32, ~1.5e-154 in f64 - i.e. actual zeros or denormal
    noise, NOT merely small rows) keep their current scale (the
    identity-row convention): dividing by a clamped-to-tiny norm would
    grow d without bound, overflow to inf, and NaN-poison the solve, while
    the unequilibrated engine handles the same degenerate P via its
    L >= mu_prox guard. The threshold is deliberately ABSOLUTE: a relative
    one (round 2 used 1e-12 * the problem's largest row) silently refuses
    to rescale legitimate rows whenever the dynamic range exceeds it - and
    the reference's own benchmark generator (test_script.py:144-149,
    exp-diag squared twice) spans ~e^80, which is exactly the regime
    equilibration exists for. 1/sqrt(norm) of any above-threshold value is
    finite in the working dtype (max d ~ 1/sqrt(thr) = tiny^-0.25)."""
    if P.ndim == 2:
        a = jnp.abs(P)
        thr = jnp.sqrt(jnp.finfo(P.dtype).tiny)
        return jnp.where(a > thr, 1.0 / jnp.sqrt(jnp.maximum(a, thr)), 1.0)

    thr = jnp.sqrt(jnp.finfo(P.dtype).tiny)

    def body(_, d):
        Pd = P * d[:, :, None] * d[:, None, :]
        norms = jnp.max(jnp.abs(Pd), axis=-1)
        return jnp.where(
            norms > thr, d / jnp.sqrt(jnp.maximum(norms, thr)), d
        )

    d0 = jnp.ones(P.shape[:2], P.dtype)
    return jax.lax.fori_loop(0, iters, body, d0)


def scale_problem(P: Array, q: Array, d: Array) -> tuple[Array, Array]:
    """(P, q) -> (D P D, D q)."""
    if P.ndim == 2:
        return P * d * d, q * d
    return P * d[:, :, None] * d[:, None, :], q * d


def contact_scale(d: Array) -> Array:
    """Per-contact isotropic scale (B, nc) = geomean of the two coordinate
    scales; d (B, 2nc)."""
    B, n = d.shape
    pairs = d.reshape(B, n // 2, 2)
    return jnp.sqrt(pairs[..., 0] * pairs[..., 1])


def isotropize(d: Array) -> Array:
    """Replace each contact's two coordinate scales by their geomean so the
    disk constraint stays a disk; d (B, 2nc) -> (B, 2nc)."""
    B, n = d.shape
    c = contact_scale(d)
    return jnp.repeat(c, 2, axis=-1)
