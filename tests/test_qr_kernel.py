"""Householder-QR solve kernel: interpret-mode parity vs LAPACK.

Small sizes only - interpret mode executes the unrolled kernel serially and
is O(m^2) traced ops; the m=36/96 benchmark shapes are exercised on real TPU
hardware by bench.py. Padding paths (m not a multiple of 8, batch not a
multiple of the lane tile) are covered here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffqcqp_tpu.kernels.qr_solve_pallas import qr_solve_pallas


@pytest.mark.parametrize("b,m", [(4, 5), (3, 8), (9, 6)])
def test_qr_solve_parity(rng, b, m):
    A = rng.standard_normal((b, m, m)).astype(np.float32)
    A += 2.0 * np.eye(m, dtype=np.float32)
    rhs = rng.standard_normal((b, m)).astype(np.float32)
    x = np.array(qr_solve_pallas(jnp.asarray(A), jnp.asarray(rhs), interpret=True))
    x_ref = np.linalg.solve(A.astype(np.float64), rhs[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(x, x_ref, atol=5e-5, rtol=5e-5)


def test_qr_solve_unsymmetric_saddle(rng):
    """The KKT adjoints are unsymmetric saddle systems - no SPD shortcuts."""
    b, n, nc = 4, 6, 3
    m = n + nc
    P = rng.standard_normal((b, n, n)).astype(np.float32)
    P = P @ P.transpose(0, 2, 1) + 0.5 * np.eye(n, dtype=np.float32)
    S = np.zeros((b, m, m), np.float32)
    S[:, :nc, :nc] = np.eye(nc) * rng.random((b, 1, 1)).astype(np.float32)
    S[:, nc:, nc:] = P
    C = rng.standard_normal((b, n, nc)).astype(np.float32)
    S[:, nc:, :nc] = C
    S[:, :nc, nc:] = 0.3 * C.transpose(0, 2, 1)
    rhs = rng.standard_normal((b, m)).astype(np.float32)
    x = np.array(qr_solve_pallas(jnp.asarray(S), jnp.asarray(rhs), interpret=True))
    x_ref = np.linalg.solve(S.astype(np.float64), rhs[..., None].astype(np.float64))[..., 0]
    err = np.max(np.abs(x - x_ref) / np.maximum(1.0, np.abs(x_ref)))
    assert err < 1e-4, err
