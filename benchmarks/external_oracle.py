"""External accuracy/throughput anchors for the benchmark suite.

The reference's referees are qpth/OSQP for the QP and a cvxpylayers SOC
program for the QCQP (test_script.py:48-82, :137-191); none of the three
is installable in this environment. scipy is, and supplies two EXACT (f64
working precision, no solver tolerance of their own) oracles plus one
generic high-accuracy NLP referee:

  * non-negative QP -> scipy.optimize.nnls (Lawson-Hanson active set):
        min 1/2 l^T P l + q^T l  s.t. l >= 0
      = min 1/2 ||A l - b||^2    s.t. l >= 0,  A = chol(P)^T, b = -A^{-T} q
  * box / signed-box QP -> scipy.optimize.lsq_linear method='bvls'
    (Stark-Parker bounded-variable least squares, finite active set):
        min 1/2 l^T P l + q^T l  s.t. lo <= l <= hi
      = min 1/2 ||A l - b||^2    s.t. lo <= l <= hi   (same A, b).
    The signed-box class reduces to a plain box through per-coordinate
    effective bounds (the feasible set is [lo, hi] intersected with the
    half-line sign(v_i) * l_i <= 0; v_i == 0 pins l_i = 0, matching
    ops/prox.py::prox_signed_box), so BVLS referees it exactly too.
  * SINGLE-contact QCQP (the trust-region subproblem): the KKT system
    (P + 2*gamma*I) l = -q, ||l|| <= r, gamma >= 0, complementarity,
    reduces to the 1-D secular equation in the multiplier
        phi(gamma) = sum_i qt_i^2 / (lam_i + 2*gamma)^2 - r^2 = 0
    (qt = V^T q, P = V diag(lam) V^T), strictly decreasing in gamma -
    solved to f64 precision with scipy.optimize.brentq. This referees the
    QCQP class with an ORACLE, not another iterative solver.
  * multi-contact QCQP -> scipy.optimize.minimize(trust-constr) on the
    smooth convex program with tight tolerances; itself cross-validated
    against the secular oracle on single-contact problems in
    tests/test_oracle.py, so its accuracy as a referee is measured, not
    assumed.

Any disagreement beyond the working precision is our error, not a
tolerance mismatch. Throughput of the scipy paths is also reported
(single-thread Python loop over the batch, structurally the same
per-problem regime as the reference's own harness).
"""

from __future__ import annotations

import time

import numpy as np
from scipy.linalg import cholesky, eigh, solve_triangular
from scipy.optimize import (
    NonlinearConstraint, brentq, lsq_linear, minimize, nnls,
)


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


def box_qp_solve_batch(
    P: np.ndarray, q: np.ndarray, lo: np.ndarray, hi: np.ndarray
) -> np.ndarray:
    """Exact f64 solutions of the batched box QP via BVLS.

    Same least-squares reformulation as `nnls_solve_batch` with the
    non-negativity cone replaced by the box [lo, hi]; BVLS (Stark-Parker)
    is a finite active-set method, so the only error is f64 rounding.
    P (B, N, N) dense SPD or (B, N) diagonal; q, lo, hi (B, N).
    """
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    # an infeasible bound pair must fail loudly, not be silently refereed
    # as a pinned coordinate (only lo == hi means "pinned")
    assert np.all(lo <= hi), "box oracle requires lo <= hi coordinate-wise"
    B, n = q.shape
    out = np.empty_like(q)
    for i in range(B):
        Pi = np.diag(P[i]) if P.ndim == 2 else P[i]
        # lsq_linear requires lb < ub strictly; a pinned coordinate
        # (lo == hi, e.g. the signed-box v == 0 slot) is eliminated
        # exactly: fix it and fold P[free, pin] @ x_pin into q.
        pin = ~(lo[i] < hi[i])
        xi = np.empty(n)
        xi[pin] = lo[i][pin]
        free = ~pin
        if free.any():
            Pf = Pi[np.ix_(free, free)]
            qf = q[i][free] + Pi[np.ix_(free, pin)] @ xi[pin]
            L = cholesky(Pf, lower=True)
            A = L.T
            b = solve_triangular(L, -qf, lower=True)
            res = lsq_linear(
                A, b, bounds=(lo[i][free], hi[i][free]),
                method="bvls", tol=1e-14,
            )
            xi[free] = res.x
        out[i] = xi
    return out


def signed_box_bounds(
    lo: np.ndarray, hi: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Effective per-coordinate bounds of the signed-box feasible set.

    [lo, hi] intersected with sign(v_i) * l_i <= 0:
      v_i > 0  -> [lo_i, min(hi_i, 0)]
      v_i < 0  -> [max(lo_i, 0), hi_i]
      v_i == 0 -> {0}  (sign(0) == 0 makes prox_signed_box return 0).
    Requires lo <= 0 <= hi coordinate-wise (else the intersection can be
    empty and the prox composition is no longer the exact projection);
    asserted because a silent mismatch would referee the wrong problem.
    """
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    s = np.sign(np.asarray(v, np.float64))
    assert np.all(lo <= 0.0) and np.all(hi >= 0.0), (
        "signed-box oracle requires lo <= 0 <= hi"
    )
    lo_eff = np.where(s > 0, lo, np.where(s < 0, np.maximum(lo, 0.0), 0.0))
    hi_eff = np.where(s > 0, np.minimum(hi, 0.0), np.where(s < 0, hi, 0.0))
    return lo_eff, hi_eff


def box_check(P, q, lo, hi, l, time_it: bool = True, prefix: str = "bvls"):
    """Returns {'<prefix>_max_abs_err', '<prefix>_problems_per_sec'}
    comparing a batch of box-QP solutions l against the exact BVLS oracle."""
    t0 = time.perf_counter()
    exact = box_qp_solve_batch(P, q, lo, hi)
    dt = time.perf_counter() - t0
    res = {
        f"{prefix}_max_abs_err": float(
            np.max(np.abs(np.asarray(l, np.float64) - exact))
        )
    }
    if time_it:
        res[f"{prefix}_problems_per_sec"] = round(q.shape[0] / dt, 1)
    return res


def secular_single_contact(P: np.ndarray, q: np.ndarray, r: float) -> np.ndarray:
    """Exact f64 solution of ONE single-contact QCQP (trust-region
    subproblem): min 1/2 l'Pl + q'l s.t. ||l||_2 <= r, l in R^2.

    P (2, 2) SPD, q (2,), r >= 0. Interior case if the unconstrained
    solution fits; else brentq on the strictly-decreasing secular equation
    phi(gamma) = ||(P + 2 gamma I)^{-1} q||^2 - r^2 (convex problem, SPD P:
    no hard case - the root is unique and phi is smooth on gamma >= 0).
    """
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    r = float(r)
    if r <= 0.0:
        return np.zeros_like(q)
    lam, V = eigh(P)
    qt = V.T @ q

    def x_of(gamma):
        return -(V @ (qt / (lam + 2.0 * gamma)))

    def phi(gamma):
        return float(np.sum(qt**2 / (lam + 2.0 * gamma) ** 2)) - r * r

    if phi(0.0) <= 0.0:          # unconstrained solution inside the disk
        return x_of(0.0)
    # bracket: ||x(gamma)|| <= ||q|| / (2 gamma) -> phi < 0 beyond ||q||/(2r)
    hi = max(np.linalg.norm(q) / (2.0 * r), 1e-300)
    while phi(hi) > 0.0:         # safety against rounding at the bound
        hi *= 2.0
    gamma = brentq(phi, 0.0, hi, xtol=1e-300, rtol=4 * np.finfo(float).eps,
                   maxiter=200)
    x = x_of(gamma)
    # exact primal feasibility: scale onto the boundary (brentq leaves
    # O(ulp) slack; the direction is exact at the root)
    return x * (r / np.linalg.norm(x))


def secular_qcqp_batch(P: np.ndarray, q: np.ndarray, radii: np.ndarray) -> np.ndarray:
    """Exact f64 solutions of a batch of SINGLE-contact QCQPs.

    P (B, 2, 2), q (B, 2), radii (B,) or (B, 1). For the api.solve_qcqp
    convention pass radii = l_n * mu.
    """
    q = np.asarray(q, np.float64)
    radii = np.asarray(radii, np.float64).reshape(q.shape[0])
    out = np.empty_like(q)
    for i in range(q.shape[0]):
        out[i] = secular_single_contact(P[i], q[i], radii[i])
    return out


def _kkt_residual(P, q, radii, x):
    """Max KKT violation (stationarity w/ LS multipliers on near-boundary
    contacts, feasibility) - used to decide whether a polish improved x."""
    nc = len(radii)
    g = P @ x + q
    pts = x.reshape(nc, 2)
    nrm = np.sqrt(np.sum(pts * pts, axis=1))
    res = 0.0
    for i in range(nc):
        li = pts[i]
        if nrm[i] >= radii[i] * (1.0 - 1e-9) and nrm[i] > 0:
            # project the gradient onto the tangent of the disk boundary
            t = np.array([-li[1], li[0]]) / nrm[i]
            res = max(res, abs(g[2 * i : 2 * i + 2] @ t))
            gam = -(g[2 * i : 2 * i + 2] @ li) / (2.0 * nrm[i] ** 2)
            res = max(res, max(-gam, 0.0) * nrm[i])  # dual feasibility
        else:
            res = max(res, np.max(np.abs(g[2 * i : 2 * i + 2])))
        res = max(res, max(nrm[i] - radii[i], 0.0))
    return res


def _dual_newton_polish(P, q, radii, x, iters=60):
    """Newton on the multi-contact secular system: with the active set read
    off x, solve psi_i(gamma) = ||l_(i)(gamma)||^2 - r_i^2 = 0 where
    l(gamma) = -(P + 2 diag(gamma (x) 1_2))^{-1} q - the n-contact
    generalisation of the single-contact secular equation. Quadratically
    convergent near the solution; the caller keeps the result only if the
    measured KKT residual improves (so a misread active set cannot hurt)."""
    nc = len(radii)
    n = 2 * nc
    pts = x.reshape(nc, 2)
    nrm = np.sqrt(np.sum(pts * pts, axis=1))
    # generous candidate set: trust-constr can leave a binding contact
    # ~1e-6 INSIDE the boundary. Including a truly-inactive contact is
    # harmless - its psi is negative at gamma=0, so Newton's clipped
    # update pins gamma to 0 and l stays the unconstrained solution there.
    act = np.where((nrm >= radii * (1.0 - 1e-3)) & (radii > 0))[0]
    # init gamma from stationarity: gamma_i = -g_(i).l_(i) / (2||l_(i)||^2)
    g = P @ x + q
    gamma = np.zeros(len(act))
    for k, i in enumerate(act):
        gamma[k] = max(
            -(g[2 * i : 2 * i + 2] @ pts[i]) / (2.0 * max(nrm[i] ** 2, 1e-300)),
            0.0,
        )
    l = x
    for _ in range(iters):
        d = np.zeros(n)
        for k, i in enumerate(act):
            d[2 * i : 2 * i + 2] = 2.0 * gamma[k]
        M = P + np.diag(d)
        l = np.linalg.solve(M, -q)
        psi = np.array([
            l[2 * i] ** 2 + l[2 * i + 1] ** 2 - radii[i] ** 2 for i in act
        ])
        # psi is in units of r^2: stop at the f64 floor RELATIVE to that
        # scale (an absolute 1e-30 is unreachable and silently ran the
        # quadratically-convergent loop to its full iteration budget)
        if len(act) == 0 or np.max(np.abs(psi)) < 1e-14 * max(
            float(np.max(radii[list(act)] ** 2)), 1e-300
        ):
            break
        J = np.empty((len(act), len(act)))
        for kj, j in enumerate(act):
            b = np.zeros(n)
            b[2 * j : 2 * j + 2] = 2.0 * l[2 * j : 2 * j + 2]
            v = np.linalg.solve(M, b)          # -dl/dgamma_j
            for ki, i in enumerate(act):
                J[ki, kj] = -2.0 * (
                    l[2 * i : 2 * i + 2] @ v[2 * i : 2 * i + 2]
                )
        try:
            step = np.linalg.solve(J, psi)
        except np.linalg.LinAlgError:
            break
        gamma = np.maximum(gamma - step, 0.0)
    return l


def trust_constr_qcqp(
    P: np.ndarray, q: np.ndarray, radii: np.ndarray, tol: float = 1e-12,
) -> np.ndarray:
    """High-accuracy f64 reference solutions of multi-contact QCQPs via
    scipy trust-constr on min 1/2 l'Pl + q'l s.t. ||l_(i)||^2 <= r_i^2.

    P (B, n, n) SPD, q (B, n), radii (B, nc) with n = 2*nc; contact i owns
    coordinates (2i, 2i+1) (the api.solve_qcqp layout). A generic NLP
    solver, not an oracle - its own accuracy is measured against the
    secular-equation oracle in tests/test_oracle.py (~1e-9 on this problem
    family).
    """
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    radii = np.asarray(radii, np.float64)
    B, n = q.shape
    nc = n // 2
    out = np.empty_like(q)
    for i in range(B):
        ri = radii[i]
        # substitute l = D y with D = diag(per-contact radius): every disk
        # becomes the unit disk. Without this, tiny radii (r ~ 1e-4, so
        # r^2 ~ 1e-8 constraint scale) sit below trust-constr's working
        # tolerances and the referee returns errors of order r itself.
        d = np.repeat(np.maximum(ri, 1e-12), 2)
        Pi = d[:, None] * P[i] * d[None, :]
        qi = d * q[i]

        def fun(y):
            return 0.5 * y @ Pi @ y + qi @ y

        def jac(y):
            return Pi @ y + qi

        def cons_f(y):
            pts = y.reshape(nc, 2)
            return np.sum(pts * pts, axis=1) - 1.0

        def cons_j(y):
            J = np.zeros((nc, n))
            for c in range(nc):
                J[c, 2 * c] = 2.0 * y[2 * c]
                J[c, 2 * c + 1] = 2.0 * y[2 * c + 1]
            return J

        def cons_h(y, v):
            return 2.0 * np.diag(np.repeat(v, 2))

        # warm start: unconstrained minimiser projected into the unit disks
        y0 = np.linalg.solve(Pi + 1e-14 * np.eye(n), -qi)
        pts0 = y0.reshape(nc, 2)
        nrm0 = np.sqrt(np.sum(pts0 * pts0, axis=1))
        y0 = (pts0 * np.minimum(1.0, 0.999 / np.maximum(nrm0, 1e-300))[:, None]
              ).reshape(n)
        res = minimize(
            fun, y0, jac=jac, hess=lambda y, Pi=Pi: Pi, method="trust-constr",
            constraints=[NonlinearConstraint(
                cons_f, -np.inf, 0.0, jac=cons_j, hess=cons_h
            )],
            options={"gtol": tol, "xtol": tol, "maxiter": 2000},
        )
        y = res.x
        # project hard onto the feasible set (trust-constr can sit O(1e-12)
        # outside; the comparison should not count that as our error)
        pts = y.reshape(nc, 2)
        nrm = np.sqrt(np.sum(pts * pts, axis=1))
        scale = np.where(nrm > 1.0, 1.0 / np.maximum(nrm, 1e-300), 1.0)
        x = d * (pts * scale[:, None]).reshape(n)
        # trust-constr plateaus ~1e-7 on this family; the dual-Newton polish
        # (exact multi-contact secular system, active set read off x) takes
        # it to f64 working precision. Iterated: each round re-reads the
        # active set from the current best point (a misread set on round 1
        # - e.g. a contact trust-constr left slightly inside - fixes
        # itself once the others are resolved). A candidate is kept only
        # if the measured KKT residual improves, so the polish can never
        # make the referee worse.
        best = _kkt_residual(P[i], q[i], ri, x)
        for _ in range(4):
            xp = _dual_newton_polish(P[i], q[i], np.maximum(ri, 1e-12), x)
            ptsp = xp.reshape(nc, 2)
            nrmp = np.sqrt(np.sum(ptsp * ptsp, axis=1))
            sp = np.where(nrmp > ri, ri / np.maximum(nrmp, 1e-300), 1.0)
            xp = (ptsp * sp[:, None]).reshape(n)
            r_p = _kkt_residual(P[i], q[i], ri, xp)
            if r_p < best:
                x, best = xp, r_p
            else:
                break
        out[i] = x
    return out


def qcqp_oracle_check(P, q, l_n, mu, l, max_problems: int | None = None):
    """Referee columns for a QCQP batch: exact secular oracle when nc == 1,
    trust-constr otherwise. Returns {'oracle_max_abs_err',
    'oracle_kind', 'oracle_problems_per_sec', 'oracle_problems_checked'}."""
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    radii = np.asarray(l_n, np.float64) * np.asarray(mu, np.float64)
    l = np.asarray(l, np.float64)
    B, n = q.shape
    if max_problems is not None and B > max_problems:
        P, q, radii, l = (x[:max_problems] for x in (P, q, radii, l))
        B = max_problems
    t0 = time.perf_counter()
    if n == 2:
        exact = secular_qcqp_batch(P, q, radii)
        kind = "secular_exact"
        certified = np.ones(B, bool)
    else:
        exact = trust_constr_qcqp(P, q, radii)
        kind = "trust_constr_f64"
        # a generic NLP referee must certify ITSELF: a reference solution
        # only referees problems where its own measured KKT residual is at
        # f64 working precision; uncertified problems are counted, not
        # silently folded into the error column.
        scale = 1.0 + np.max(np.abs(q), axis=-1)
        certified = np.array([
            _kkt_residual(P[i], q[i], radii[i], exact[i]) < 1e-9 * scale[i]
            for i in range(B)
        ])
    dt = time.perf_counter() - t0
    err = np.abs(l - exact)
    out = {
        "oracle_kind": kind,
        "oracle_problems_per_sec": round(B / dt, 1),
        "oracle_problems_checked": B,
        "oracle_certified_frac": float(np.mean(certified)),
    }
    if certified.any():
        out["oracle_max_abs_err"] = float(np.max(err[certified]))
    if not certified.all():
        out["oracle_max_abs_err_uncertified"] = float(np.max(err[~certified]))
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
