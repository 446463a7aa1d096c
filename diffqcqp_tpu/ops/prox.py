"""Batched proximal projection operators.

The reference's four solvers are one ADMM algorithm differing only in the
projection applied at step (3) of the iteration:

  * non-negative orthant clamp        (Solver.cpp:82)
  * box clamp                         (Solver.cpp:219-220)
  * signed box clamp                  (Solver.cpp:396-398)
  * per-contact disk projection       (Solver.cpp:505-519, prox_circle)

Each operator here is a pure function over a batch ``x: (..., N)``; the
per-contact disk projection vectorises the reference's per-contact loop by
reshaping to ``(..., nc, 2)`` and rescaling rows whose norm exceeds the radius.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def prox_nonneg(x: Array) -> Array:
    """Project onto the non-negative orthant: max(x, 0)."""
    return jnp.maximum(x, 0.0)


def prox_box(x: Array, l_min: Array, l_max: Array) -> Array:
    """Project onto the box [l_min, l_max] (two-sided clamp).

    Mirrors the reference's cwiseMax-then-cwiseMin ordering
    (Solver.cpp:219-220), which matters when l_min > l_max: the upper clamp
    wins.
    """
    return jnp.minimum(jnp.maximum(x, l_min), l_max)


def prox_signed_box(x: Array, l_min: Array, l_max: Array, v_sign: Array) -> Array:
    """Box clamp composed with the sign constraint sign(v) * l <= 0.

    ``v_sign`` must already be the element-wise sign of v (the reference takes
    the sign once before the loop, Solver.cpp:391). The composition is
    clamp -> l = v * min(v * l, 0) (Solver.cpp:396-398).
    """
    y = prox_box(x, l_min, l_max)
    return v_sign * jnp.minimum(v_sign * y, 0.0)


def prox_disk(x: Array, radius: Array, eps: float = 1e-30) -> Array:
    """Per-contact projection onto disks of the given radii.

    ``x`` has shape (..., 2*nc); contact i owns coordinates (2i, 2i+1).
    ``radius`` has shape (..., nc). A contact vector whose 2-norm exceeds its
    radius is rescaled onto the circle; otherwise left untouched
    (Solver.cpp:505-519). A zero-norm vector is never rescaled (norm 0 can
    only exceed a negative radius; in that degenerate case the reference
    would divide by zero - we return 0 instead).
    """
    shape = x.shape
    nc = shape[-1] // 2
    pts = x.reshape(shape[:-1] + (nc, 2))
    norm = jnp.linalg.norm(pts, axis=-1)
    safe_norm = jnp.maximum(norm, eps)
    scale = jnp.where(norm > radius, radius / safe_norm, 1.0)
    return (pts * scale[..., None]).reshape(shape)
