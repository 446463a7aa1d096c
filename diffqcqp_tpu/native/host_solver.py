"""ctypes bindings for the native host solver (native/host_solver.cpp).

The native library is the framework's CPU runtime component: a
double-precision, OpenMP-batched implementation of the same ADMM recipe,
used as (a) the measured reference-equivalent baseline in bench.py (the
upstream project is single-thread C++ called once per problem; pass
``threads=1`` to reproduce that operating point), and (b) an independent
float64 oracle for the JAX solvers in tests.

Build: ``make -C native`` (pure C++, no dependencies).
"""

from __future__ import annotations

import ctypes
import os
from typing import NamedTuple, Optional

import numpy as np

_LIB_NAME = "libdiffqcqp_host.so"

PROX_NONNEG = 0
PROX_BOX = 1
PROX_SIGNED_BOX = 2
PROX_DISK = 3

_lib = None


def _find_lib() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, _LIB_NAME),
        os.path.join(here, "..", "..", "native", _LIB_NAME),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        f"{_LIB_NAME} not found; build it with `make -C native` "
        f"(searched {candidates})"
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_find_lib())
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.dq_solve_batch.restype = ctypes.c_int
    lib.dq_solve_batch.argtypes = [
        dp, dp, dp, dp, dp, dp, dp,               # P q l_min l_max v_sign radius ws
        ctypes.c_int32, ctypes.c_double, ctypes.c_double,  # prox_kind eps mu_prox
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,    # max_iter adaptive power_iters
        ctypes.c_int32, ctypes.c_int32,                     # qcqp_stopping damp_both
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,    # batch n threads
        dp, ip, ip,                                         # l2 iters converged
    ]
    lib.dq_qp_backward_batch.restype = ctypes.c_int
    lib.dq_qp_backward_batch.argtypes = [
        dp, dp, dp, dp, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, dp,
    ]
    lib.dq_qcqp_backward_batch.restype = ctypes.c_int
    lib.dq_qcqp_backward_batch.argtypes = [
        dp, dp, dp, dp, dp, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, dp, dp, dp,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def _dptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _as_c(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


class HostSolveResult(NamedTuple):
    l: np.ndarray
    iterations: np.ndarray
    converged: np.ndarray


def _solve(P, q, prox_kind, *, l_min=None, l_max=None, v_sign=None,
           radius=None, warm_start=None, eps=1e-10, mu_prox=1e-7,
           max_iter=1000, adaptive_rho=True, power_iters=10,
           qcqp_stopping=False, damp_both=True, threads=0) -> HostSolveResult:
    lib = _load()
    P = _as_c(P)
    q = _as_c(q)
    b, n = q.shape
    assert P.shape == (b, n, n), f"P {P.shape} vs q {q.shape}"
    l2 = np.empty((b, n), np.float64)
    iters = np.empty(b, np.int32)
    conv = np.empty(b, np.int32)
    # convert up front and hold references so the buffers outlive the call
    l_min = _as_c(l_min) if l_min is not None else None
    l_max = _as_c(l_max) if l_max is not None else None
    v_sign = _as_c(v_sign) if v_sign is not None else None
    radius = _as_c(radius) if radius is not None else None
    warm_start = _as_c(warm_start) if warm_start is not None else None
    lib.dq_solve_batch(
        _dptr(P), _dptr(q), _dptr(l_min), _dptr(l_max), _dptr(v_sign),
        _dptr(radius), _dptr(warm_start),
        prox_kind, eps, mu_prox, int(max_iter), int(adaptive_rho),
        int(power_iters), int(qcqp_stopping), int(damp_both),
        b, n, int(threads),
        _dptr(l2),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        conv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return HostSolveResult(l2, iters, conv.astype(bool))


def solve_qp_batch(P, q, warm_start=None, **kw) -> HostSolveResult:
    return _solve(P, q, PROX_NONNEG, warm_start=warm_start, **kw)


def solve_box_qp_batch(P, q, l_min, l_max, warm_start=None, **kw) -> HostSolveResult:
    return _solve(P, q, PROX_BOX, l_min=l_min, l_max=l_max,
                  warm_start=warm_start, **kw)


def solve_signed_box_qp_batch(P, q, l_min, l_max, v, warm_start=None, **kw) -> HostSolveResult:
    return _solve(P, q, PROX_SIGNED_BOX, l_min=l_min, l_max=l_max,
                  v_sign=np.sign(_as_c(v)), warm_start=warm_start, **kw)


def solve_qcqp_batch(P, q, l_n, mu, warm_start=None, *, fwd_bwd=False,
                     grad_l=None, eps=1e-10, mu_prox=1e-7, max_iter=1000,
                     adaptive_rho=True, threads=0, **kw):
    """Forward (and optionally backward) QCQP solve. With fwd_bwd=True the
    derivative system is solved too (the unit bench.py times)."""
    radius = _as_c(l_n) * _as_c(mu)
    res = _solve(
        P, q, PROX_DISK, radius=radius, warm_start=warm_start, eps=eps,
        mu_prox=mu_prox, max_iter=max_iter, adaptive_rho=adaptive_rho,
        power_iters=100, qcqp_stopping=True, damp_both=False,
        threads=threads, **kw,
    )
    if not fwd_bwd:
        return res
    g = _as_c(grad_l) if grad_l is not None else np.ones_like(res.l)
    dgamma, dl, gamma = qcqp_backward_batch(P, q, radius, res.l, g,
                                            eps=eps, threads=threads)
    return res, (dgamma, dl, gamma)


def qp_backward_batch(P, q, l, grad_l, *, eps=1e-10, threads=0) -> np.ndarray:
    lib = _load()
    P, q, l, grad_l = map(_as_c, (P, q, l, grad_l))
    b, n = q.shape
    dl = np.empty((b, n), np.float64)
    lib.dq_qp_backward_batch(
        _dptr(P), _dptr(q), _dptr(l), _dptr(grad_l), eps, b, n,
        int(threads), _dptr(dl),
    )
    return dl


def qcqp_backward_batch(P, q, radius, l, grad_l, *, eps=1e-10, threads=0):
    lib = _load()
    P, q, radius, l, grad_l = map(_as_c, (P, q, radius, l, grad_l))
    b, n = q.shape
    nc = n // 2
    dgamma = np.empty((b, nc), np.float64)
    dl = np.empty((b, n), np.float64)
    gamma = np.empty((b, nc), np.float64)
    lib.dq_qcqp_backward_batch(
        _dptr(P), _dptr(q), _dptr(radius), _dptr(l), _dptr(grad_l), eps,
        b, n, int(threads), _dptr(dgamma), _dptr(dl), _dptr(gamma),
    )
    return dgamma, dl, gamma
