"""Drop-in PyTorch autograd bindings for the TPU solver stack.

The reference's user-facing layer is a set of ``torch.autograd.Function``
subclasses (qcqp.py:22-181): QPFn2, BoxQPFn2, SignedBoxQPFn2, QCQPFn2, each
looping over the batch and calling the C++ solver one problem at a time.
This module provides the same four classes with the SAME ``apply``
signatures and tensor layouts (vectors are (B, N, 1) column tensors there;
(B, N) is also accepted here), but the whole batch is solved in ONE call
into the JAX/TPU engine - forward through api.py's solvers, backward through
the fixed-shape KKT adjoints in diff/kkt.py.

Divergences from the reference (all documented in SURVEY.md section 7):
  * BoxQPFn2.backward WORKS here (the reference's crashes on a nonexistent
    ``Tensor.asDiagonal`` and swaps l_min/l_max when unpacking, qcqp.py:72,
    91, 93); gradients are validated against finite differences.
  * SignedBoxQPFn2.backward differentiates the sign constraint too (the
    reference reuses the plain box derivative, comment "npt implemented",
    qcqp.py:111).
  * grad_P is returned symmetrised, -(dl l^T + l dl^T)/2, rather than the
    one-sided -dl l^T (qcqp.py:49); identical downstream gradients for any
    symmetric parametrisation of P.

Backend: solves run on the default JAX backend (TPU when present). float64
inputs are solved in float64 on the CPU backend (reference precision) and in
float32 on TPU (casting back on return); call ``set_backend('cpu')`` to
force reference-precision CPU solves.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax

from . import api
from .config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig

try:  # torch is an optional dependency of this module only
    import torch
    from torch.autograd import Function
except ImportError as _e:  # pragma: no cover
    torch = None
    Function = object
    _TORCH_IMPORT_ERROR = _e

__all__ = [
    "QPFn2",
    "BoxQPFn2",
    "SignedBoxQPFn2",
    "QCQPFn2",
    "set_backend",
]

_BACKEND: Optional[str] = None  # None = auto (tpu if present else cpu)


def set_backend(name: Optional[str]) -> None:
    """Force the JAX backend used by these bindings: 'tpu', 'cpu', or None
    (auto). float64 tensors keep float64 only on the cpu backend."""
    global _BACKEND
    _BACKEND = name


def _backend() -> str:
    if _BACKEND is not None:
        return _BACKEND
    try:
        jax.devices("tpu")
        return "tpu"
    except RuntimeError:
        return "cpu"


def _x64_ctx(enable: bool):
    # jax.enable_x64 is the public thread-local x64 switch (usable as a
    # context manager) in current JAX; jax.experimental.enable_x64 is gone.
    return jax.enable_x64(True) if enable else _nullcontext()


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


@functools.lru_cache(maxsize=None)
def _jitted(kind: str, cfg: SolverConfig):
    """Jitted forward/backward pairs per problem class and config."""
    if kind == "qp":
        fwd = jax.jit(lambda P, q, ws: api._qp(P, q, ws, cfg)[0])
        bwd = jax.jit(lambda P, q, l, g: api._qp_bwd(cfg, (P, q, l), (g, None)))
    elif kind == "box":
        fwd = jax.jit(lambda P, q, lo, hi, ws: api._box_qp(P, q, lo, hi, ws, cfg)[0])
        bwd = jax.jit(
            lambda P, q, lo, hi, l, g: api._box_qp_bwd(
                cfg, (P, q, lo, hi, l), (g, None)
            )
        )
    elif kind == "signed_box":
        fwd = jax.jit(
            lambda P, q, lo, hi, v, ws: api._signed_box_qp(P, q, lo, hi, v, ws, cfg)[0]
        )
        bwd = jax.jit(
            lambda P, q, lo, hi, v, l, g: api._signed_box_qp_bwd(
                cfg, (P, q, lo, hi, v, l), (g, None)
            )
        )
    elif kind == "qcqp":
        fwd = jax.jit(lambda P, q, l_n, mu, ws: api._qcqp(P, q, l_n, mu, ws, cfg)[0])
        bwd = jax.jit(
            lambda P, q, l_n, mu, l, g: api._qcqp_bwd(
                cfg, (P, q, l_n, mu, l), (g, None)
            )
        )
    else:  # pragma: no cover
        raise ValueError(kind)
    return fwd, bwd


class _Ctx:
    """Conversion context for one apply() call: remembers layout/dtype and
    the chosen JAX device/precision so outputs and grads convert back."""

    def __init__(self, q_tensor):
        if torch is None:  # pragma: no cover
            raise ImportError(
                "diffqcqp_tpu.torch_autograd requires torch"
            ) from _TORCH_IMPORT_ERROR
        self.column = q_tensor.dim() == 3  # reference layout (B, N, 1)
        self.torch_dtype = q_tensor.dtype
        self.backend = _backend()
        self.x64 = self.torch_dtype == torch.float64 and self.backend == "cpu"
        self.np_dtype = np.float64 if self.x64 else np.float32
        self.device = jax.devices(self.backend)[0]

    def vec_in(self, t, width=None):
        """(B, N, 1) or (B, N) torch -> (B, N) committed jax array."""
        a = t.detach().cpu().numpy()
        if a.ndim == 3:
            a = a[..., 0]
        return jax.device_put(np.ascontiguousarray(a, self.np_dtype), self.device)

    def mat_in(self, t):
        a = np.ascontiguousarray(t.detach().cpu().numpy(), self.np_dtype)
        return jax.device_put(a, self.device)

    def vec_out(self, x, like):
        a = np.asarray(x)
        if like.dim() == 3:
            a = a[..., None]
        return torch.from_numpy(np.ascontiguousarray(a)).to(like.dtype)

    def mat_out(self, x, like):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x))).to(like.dtype)


def _cfg(base: SolverConfig, eps, max_iter, mu_prox) -> SolverConfig:
    return base.replace(eps=float(eps), max_iter=int(max_iter), mu_prox=float(mu_prox))


class QPFn2(Function):
    """Non-negative QP, reference signature (qcqp.py:22-52):
    ``QPFn2.apply(P, q, warm_start, eps, max_iter, mu_prox=1e-7)``."""

    @staticmethod
    def forward(ctx, P, q, warm_start, eps, max_iter, mu_prox=1e-7):
        c = _Ctx(q)
        cfg = _cfg(QP_DEFAULTS, eps, max_iter, mu_prox)
        with _x64_ctx(c.x64):
            fwd, _ = _jitted("qp", cfg)
            l = fwd(c.mat_in(P), c.vec_in(q), c.vec_in(warm_start))
        out = c.vec_out(l, q)
        ctx.save_for_backward(P, q, out)
        ctx.dq_cfg, ctx.dq_c = cfg, c
        return out

    @staticmethod
    def backward(ctx, grad_l):
        P, q, l = ctx.saved_tensors
        c, cfg = ctx.dq_c, ctx.dq_cfg
        with _x64_ctx(c.x64):
            _, bwd = _jitted("qp", cfg)
            gP, gq, _ = bwd(c.mat_in(P), c.vec_in(q), c.vec_in(l), c.vec_in(grad_l))
        grad_P = c.mat_out(gP, P) if ctx.needs_input_grad[0] else None
        grad_q = c.vec_out(gq, q) if ctx.needs_input_grad[1] else None
        return grad_P, grad_q, None, None, None, None


class BoxQPFn2(Function):
    """Box QP, reference signature (qcqp.py:54-94):
    ``BoxQPFn2.apply(P, q, l_min, l_max, warm_start, eps, max_iter,
    mu_prox=1e-7)``. Unlike the reference, backward works."""

    @staticmethod
    def forward(ctx, P, q, l_min, l_max, warm_start, eps, max_iter, mu_prox=1e-7):
        c = _Ctx(q)
        cfg = _cfg(QP_DEFAULTS, eps, max_iter, mu_prox)
        with _x64_ctx(c.x64):
            fwd, _ = _jitted("box", cfg)
            l = fwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_min), c.vec_in(l_max),
                c.vec_in(warm_start),
            )
        out = c.vec_out(l, q)
        ctx.save_for_backward(P, q, l_min, l_max, out)
        ctx.dq_cfg, ctx.dq_c = cfg, c
        return out

    @staticmethod
    def backward(ctx, grad_l):
        P, q, l_min, l_max, l = ctx.saved_tensors
        c, cfg = ctx.dq_c, ctx.dq_cfg
        with _x64_ctx(c.x64):
            _, bwd = _jitted("box", cfg)
            gP, gq, glo, ghi, _ = bwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_min), c.vec_in(l_max),
                c.vec_in(l), c.vec_in(grad_l),
            )
        ni = ctx.needs_input_grad
        return (
            c.mat_out(gP, P) if ni[0] else None,
            c.vec_out(gq, q) if ni[1] else None,
            c.vec_out(glo, l_min) if ni[2] else None,
            c.vec_out(ghi, l_max) if ni[3] else None,
            None, None, None, None,
        )


class SignedBoxQPFn2(Function):
    """Signed box QP, reference signature (qcqp.py:97-137):
    ``SignedBoxQPFn2.apply(P, q, l_min, l_max, v, warm_start, eps, max_iter,
    mu_prox=1e-7)``. The sign-constraint dual IS differentiated here."""

    @staticmethod
    def forward(ctx, P, q, l_min, l_max, v, warm_start, eps, max_iter, mu_prox=1e-7):
        c = _Ctx(q)
        cfg = _cfg(QP_DEFAULTS, eps, max_iter, mu_prox)
        with _x64_ctx(c.x64):
            fwd, _ = _jitted("signed_box", cfg)
            l = fwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_min), c.vec_in(l_max),
                c.vec_in(v), c.vec_in(warm_start),
            )
        out = c.vec_out(l, q)
        ctx.save_for_backward(P, q, l_min, l_max, v, out)
        ctx.dq_cfg, ctx.dq_c = cfg, c
        return out

    @staticmethod
    def backward(ctx, grad_l):
        P, q, l_min, l_max, v, l = ctx.saved_tensors
        c, cfg = ctx.dq_c, ctx.dq_cfg
        with _x64_ctx(c.x64):
            _, bwd = _jitted("signed_box", cfg)
            gP, gq, glo, ghi, _, _ = bwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_min), c.vec_in(l_max),
                c.vec_in(v), c.vec_in(l), c.vec_in(grad_l),
            )
        ni = ctx.needs_input_grad
        return (
            c.mat_out(gP, P) if ni[0] else None,
            c.vec_out(gq, q) if ni[1] else None,
            c.vec_out(glo, l_min) if ni[2] else None,
            c.vec_out(ghi, l_max) if ni[3] else None,
            None, None, None, None, None,
        )


class QCQPFn2(Function):
    """Friction-cone QCQP, reference signature (qcqp.py:141-181):
    ``QCQPFn2.apply(P, q, l_n, mu, warm_start, eps, max_iter, mu_prox=1e-7)``.
    l_n, mu are (B, nc, 1) or (B, nc); the radius product mu * l_n is applied
    internally (pybindings.cpp:57)."""

    @staticmethod
    def forward(ctx, P, q, l_n, mu, warm_start, eps, max_iter, mu_prox=1e-7):
        c = _Ctx(q)
        cfg = _cfg(QCQP_DEFAULTS, eps, max_iter, mu_prox)
        with _x64_ctx(c.x64):
            fwd, _ = _jitted("qcqp", cfg)
            l = fwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_n), c.vec_in(mu),
                c.vec_in(warm_start),
            )
        out = c.vec_out(l, q)
        ctx.save_for_backward(P, q, l_n, mu, out)
        ctx.dq_cfg, ctx.dq_c = cfg, c
        return out

    @staticmethod
    def backward(ctx, grad_l):
        P, q, l_n, mu, l = ctx.saved_tensors
        c, cfg = ctx.dq_c, ctx.dq_cfg
        with _x64_ctx(c.x64):
            _, bwd = _jitted("qcqp", cfg)
            gP, gq, gln, gmu, _ = bwd(
                c.mat_in(P), c.vec_in(q), c.vec_in(l_n), c.vec_in(mu),
                c.vec_in(l), c.vec_in(grad_l),
            )
        ni = ctx.needs_input_grad
        return (
            c.mat_out(gP, P) if ni[0] else None,
            c.vec_out(gq, q) if ni[1] else None,
            c.vec_out(gln, l_n) if ni[2] else None,
            c.vec_out(gmu, mu) if ni[3] else None,
            None, None, None, None,
        )
