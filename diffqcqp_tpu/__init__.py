"""diffqcqp_tpu - TPU-native differentiable batched ADMM QP/QCQP solvers.

A ground-up JAX/XLA/Pallas re-design of the capability set of
quentinll/diffqcqp (differentiable proximal ADMM solvers for non-negative
QPs, box QPs, signed-box QPs and friction-cone QCQPs with analytical
derivatives via implicit differentiation of the KKT conditions), built for
large batches on TPU:

  * one generic batched ADMM engine (solvers/admm.py) instead of four copies
  * spectral shifted-solve instead of Cholesky refactorisation, making the
    per-problem adaptive-rho schedule free (ops/linalg.py)
  * fixed-shape masked KKT differentiation wired through jax.custom_vjp
    (diff/kkt.py, api.py)
  * batch sharding over device meshes with a single pmax convergence
    collective (parallel/)
  * fused Pallas iteration kernels for the hot loop (kernels/)
"""

from .api import (
    SolverConfig,
    SolveStats,
    solve_box_qp,
    solve_box_qp_with_stats,
    solve_qcqp,
    solve_qcqp_with_stats,
    solve_qp,
    solve_qp_with_stats,
    solve_signed_box_qp,
    solve_signed_box_qp_with_stats,
    which_backend,
)
from .config import QCQP_DEFAULTS, QP_DEFAULTS
from .diff.jacobian import (
    box_qp_jacobian,
    qcqp_jacobian,
    qp_jacobian,
    signed_box_qp_jacobian,
)
from .duals import (
    box_qp_derivatives,
    qcqp_derivatives,
    qp_derivatives,
    recover_box_qp_duals,
    recover_qcqp_duals,
    recover_qp_duals,
    recover_signed_box_qp_duals,
    signed_box_qp_derivatives,
)
from . import debug, verify
from .utils.autotune import tune_compact_iters
from .utils.cache import enable_compilation_cache

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "SolveStats",
    "QP_DEFAULTS",
    "QCQP_DEFAULTS",
    "solve_qp",
    "which_backend",
    "enable_compilation_cache",
    "solve_box_qp",
    "solve_signed_box_qp",
    "solve_qcqp",
    "solve_qp_with_stats",
    "solve_box_qp_with_stats",
    "solve_signed_box_qp_with_stats",
    "solve_qcqp_with_stats",
    "qp_jacobian",
    "box_qp_jacobian",
    "signed_box_qp_jacobian",
    "qcqp_jacobian",
    "recover_qp_duals",
    "recover_box_qp_duals",
    "recover_signed_box_qp_duals",
    "recover_qcqp_duals",
    "qp_derivatives",
    "box_qp_derivatives",
    "signed_box_qp_derivatives",
    "qcqp_derivatives",
    "tune_compact_iters",
    "__version__",
]
