"""External accuracy/throughput anchor: scipy's NNLS as an exact oracle
for the non-negative QP.

The reference cross-checks against OSQP (test_script.py:187-189, imports
bit-rotted). OSQP is not installable in this environment; scipy is, and
scipy.optimize.nnls (Lawson-Hanson active-set) solves the IDENTICAL
problem EXACTLY (to f64 working precision, not to an ADMM tolerance):

    min 1/2 l^T P l + q^T l  s.t. l >= 0
  = min 1/2 ||A l - b||^2    s.t. l >= 0   with  A = chol(P)^T, b = -A^{-T} q

so it is a stronger external referee than another first-order solver -
any disagreement beyond eps is our error, not a tolerance mismatch.
Throughput is also reported (single-thread Python loop over the batch,
structurally the same per-problem regime as the reference's own harness).
"""

from __future__ import annotations

import time

import numpy as np
from scipy.linalg import cholesky, solve_triangular
from scipy.optimize import nnls


def nnls_solve_batch(P: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Exact f64 solutions of the batched non-negative QP via NNLS.

    P (B, N, N) dense SPD or (B, N) diagonal; q (B, N).
    """
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    B, n = q.shape
    out = np.empty_like(q)
    for i in range(B):
        Pi = np.diag(P[i]) if P.ndim == 2 else P[i]
        L = cholesky(Pi, lower=True)
        A = L.T
        b = solve_triangular(L, -q[i], lower=True)
        out[i], _ = nnls(A, b)
    return out


def nnls_check(P, q, l, time_it: bool = True):
    """Returns {'nnls_max_abs_err', 'nnls_problems_per_sec'} comparing a
    batch of solutions l against the exact NNLS oracle."""
    t0 = time.perf_counter()
    exact = nnls_solve_batch(P, q)
    dt = time.perf_counter() - t0
    res = {
        "nnls_max_abs_err": float(
            np.max(np.abs(np.asarray(l, np.float64) - exact))
        )
    }
    if time_it:
        res["nnls_problems_per_sec"] = round(q.shape[0] / dt, 1)
    return res
