"""Differentiable system identification through the contact solvers.

This is the framework's flagship "model": the training architecture the
reference was built for (README.md:27-57 and the paper "Differentiable
simulation for physical system identification") - QP/QCQP contact-force
solves embedded in a gradient-descent loop that recovers physical parameters
(inertia-like P, bias q, normal forces l_n, friction coefficients mu) from
observed contact forces.

The reference sketches this with torch.optim.Adam over QPFn2/QCQPFn2 outputs
(README.md:45-57, test_script.py:104-120). Here it is a jitted optax
training step over the batched TPU solvers - BASELINE.json config 4 (batch
4096 mixed QP/QCQP forward+backward inside an Adam system-ID loop).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..api import solve_qcqp, solve_qp
from ..config import QCQP_DEFAULTS, QP_DEFAULTS, SolverConfig


class QPSystemIDParams(NamedTuple):
    """Learnable QP parameters. P is stored via a square-root factor S
    (P = S S^T + reg*I) so it stays PSD during optimisation; the diagonal
    variant stores log-diagonals."""

    S: Array          # (B, N, N) or (B, N) log-diagonal
    q: Array          # (B, N)


class QCQPSystemIDParams(NamedTuple):
    S: Array          # (B, N, N)
    q: Array          # (B, N)
    log_l_n: Array    # (B, nc) - positivity via exp
    logit_mu: Array   # (B, nc) - (0, 1) via sigmoid, like friction coeffs


def qp_params_to_problem(p: QPSystemIDParams, reg: float = 1e-3):
    if p.S.ndim == 2:
        P = jnp.exp(p.S)
    else:
        P = jnp.einsum("bik,bjk->bij", p.S, p.S) + reg * jnp.eye(
            p.S.shape[-1], dtype=p.S.dtype
        )
    return P, p.q


def qcqp_params_to_problem(p: QCQPSystemIDParams, reg: float = 1e-3):
    P = jnp.einsum("bik,bjk->bij", p.S, p.S) + reg * jnp.eye(
        p.S.shape[-1], dtype=p.S.dtype
    )
    return P, p.q, jnp.exp(p.log_l_n), jax.nn.sigmoid(p.logit_mu)


class SystemID:
    """Adam system-identification driver over the differentiable solvers.

    Example (the JAX analogue of README.md:29-56):

        model = SystemID(kind="qp", config=SolverConfig(eps=1e-7))
        params = model.init_qp(jax.random.key(0), batch=10, n=8, diag=True)
        state = model.opt.init(params)
        for _ in range(steps):
            params, state, loss = model.train_step(params, state, target)
    """

    def __init__(
        self,
        kind: str = "qp",
        config: Optional[SolverConfig] = None,
        learning_rate: float = 1e-2,
    ):
        assert kind in ("qp", "qcqp")
        self.kind = kind
        base = QP_DEFAULTS if kind == "qp" else QCQP_DEFAULTS
        self.config = config if config is not None else base.replace(eps=1e-7)
        self.opt = optax.adam(learning_rate)
        self.train_step = jax.jit(self._train_step)

    def init_qp(self, key, batch: int, n: int, diag: bool = False) -> QPSystemIDParams:
        k1, k2 = jax.random.split(key)
        if diag:
            S = jax.random.normal(k1, (batch, n)) * 0.3
        else:
            S = jax.random.normal(k1, (batch, n, n)) * (1.0 / jnp.sqrt(n))
        q = jax.random.normal(k2, (batch, n)) * 0.3
        return QPSystemIDParams(S=S, q=q)

    def init_qcqp(self, key, batch: int, nc: int) -> QCQPSystemIDParams:
        n = 2 * nc
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return QCQPSystemIDParams(
            S=jax.random.normal(k1, (batch, n, n)) * (1.0 / jnp.sqrt(n)),
            q=jax.random.normal(k2, (batch, n)) * 0.3,
            log_l_n=jax.random.normal(k3, (batch, nc)) * 0.1,
            logit_mu=jax.random.normal(k4, (batch, nc)) * 0.1,
        )

    def forward(self, params) -> Array:
        if self.kind == "qp":
            P, q = qp_params_to_problem(params)
            return solve_qp(P, q, config=self.config)
        P, q, l_n, mu = qcqp_params_to_problem(params)
        return solve_qcqp(P, q, l_n, mu, config=self.config)

    def loss(self, params, target: Array) -> Array:
        pred = self.forward(params)
        return jnp.mean((pred - target) ** 2)

    def _train_step(self, params, opt_state, target):
        loss, grads = jax.value_and_grad(self.loss)(params, target)
        updates, opt_state = self.opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
