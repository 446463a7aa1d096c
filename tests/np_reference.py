"""Pure-NumPy float64 oracle implementing the reference's solver recipe.

This is a from-scratch NumPy implementation of the algorithm described in
SURVEY.md section 3 (the proximal over-relaxed adaptive-rho ADMM of
/root/reference/qcqplib/Solver.cpp) used as an independent per-problem oracle
for the batched JAX engine: same update ordering, same constants, same
power-iteration L estimate, same stopping rules. It is intentionally scalar
(one problem at a time, plain Python loop) so that it stays a direct
transcription of the MATH, not of our vectorised implementation.
"""

from __future__ import annotations

import numpy as np


def power_iteration(P: np.ndarray, iters: int) -> float:
    n = P.shape[0]
    v = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        av = P @ v
        nrm = np.linalg.norm(av)
        if nrm == 0.0:
            return 0.0
        v = av / nrm
    return float(v @ (P @ v))


def _admm(
    P,
    q,
    prox,
    *,
    eps=1e-10,
    mu_prox=1e-7,
    max_iter=1000,
    adaptive_rho=True,
    power_iters=10,
    qcqp_stopping=False,
    eps_rel=1e-4,
    damp_both=True,
    warm_start=None,
):
    n = q.size
    P = np.asarray(P, float)
    if P.ndim == 1:
        P = np.diag(P)
    mu_thresh, alpha = 10.0, 1.5
    L = power_iteration(P, power_iters)
    L = max(L, mu_prox)
    rho = np.sqrt(mu_prox * L) * (L / mu_prox) ** 0.4
    tau_inc = tau_dec = (L / mu_prox) ** 0.15
    l2 = np.zeros(n) if warm_start is None else np.asarray(warm_start, float).copy()
    u = np.zeros(n)
    q_prox = q.copy()
    M = P + (rho + mu_prox) * np.eye(n)
    Minv = np.linalg.inv(M)
    rho_up, cpt = 0, 0
    iters = 0
    res_prim = res_dual = np.inf
    for _ in range(max_iter):
        iters += 1
        l = Minv @ (rho * l2 - u - q_prox)
        q_prox = q - mu_prox * l
        r = alpha * l + (1 - alpha) * l2
        l2_new = prox(r + u / rho)
        u = u + rho * (r - l2_new)
        res_dual = rho * np.max(np.abs(l2_new - l2))
        res_prim = np.max(np.abs(l2_new - r))
        l2 = l2_new
        if qcqp_stopping:
            if res_prim < eps + eps_rel * np.linalg.norm(l) and res_dual < eps:
                break
        else:
            if res_dual < eps:
                break
        if adaptive_rho:
            inc = res_prim > mu_thresh * res_dual
            dec = res_dual > mu_thresh * res_prim
            if inc:
                if cpt % 5 == 0:
                    if rho_up == -1:
                        tau_inc = 1 + 0.8 * (tau_inc - 1)
                        if damp_both:
                            tau_dec = 1 + 0.8 * (tau_dec - 1)
                    M += rho * (tau_inc - 1) * np.eye(n)
                    rho *= tau_inc
                    Minv = np.linalg.inv(M)
                    rho_up = 1
                cpt += 1
            elif dec:
                if cpt % 5 == 0:
                    if rho_up == 1:
                        tau_dec = 1 + 0.8 * (tau_dec - 1)
                        if damp_both:
                            tau_inc = 1 + 0.8 * (tau_inc - 1)
                    M += rho * (1.0 / tau_dec - 1) * np.eye(n)
                    rho /= tau_dec
                    Minv = np.linalg.inv(M)
                    rho_up = -1
                cpt += 1
    return l2, iters, res_prim, res_dual


def solve_qp(P, q, **kw):
    return _admm(P, q, lambda x: np.maximum(x, 0.0), **kw)


def solve_box_qp(P, q, l_min, l_max, **kw):
    return _admm(
        P, q, lambda x: np.minimum(np.maximum(x, l_min), l_max), **kw
    )


def solve_signed_box_qp(P, q, l_min, l_max, v, **kw):
    vs = np.sign(v)

    def prox(x):
        y = np.minimum(np.maximum(x, l_min), l_max)
        return vs * np.minimum(vs * y, 0.0)

    return _admm(P, q, prox, **kw)


def solve_qcqp(P, q, l_n, mu, **kw):
    radius = np.asarray(l_n, float) * np.asarray(mu, float)

    def prox(x):
        y = x.copy()
        for i in range(radius.size):
            seg = y[2 * i : 2 * i + 2]
            nrm = np.linalg.norm(seg)
            if nrm > radius[i]:
                y[2 * i : 2 * i + 2] = seg * radius[i] / nrm
        return y

    kw.setdefault("power_iters", 100)
    kw.setdefault("qcqp_stopping", True)
    kw.setdefault("damp_both", False)
    return _admm(P, q, prox, **kw)
