"""Full-Jacobian sensitivity API: dl/dq and friction-parameter Jacobians.

The reference exposes only VJPs (one cotangent -> parameter gradients,
qcqp.py backward methods). Robotics pipelines often need the FULL
sensitivity matrices instead - contact-force uncertainty propagation
(Sigma_l = J Sigma_theta J^T) or Gauss-Newton system identification - and
``jax.jacrev`` over the solver re-solves the KKT system once per output
coordinate. ``diffqcqp_tpu``'s jacobian API assembles the KKT system ONCE
and solves all n right-hand sides together (diff/jacobian.py).

Run: python examples/sensitivity_jacobian.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq

rng = np.random.default_rng(0)
B, nc = 4, 3          # four 3-contact problems
n = 2 * nc

S = rng.standard_normal((B, n, n)) / np.sqrt(n)
P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.5 * np.eye(n))
q = jnp.asarray(rng.standard_normal((B, n)) * 0.5)
l_n = jnp.asarray(rng.random((B, nc)) * 0.5 + 0.05)   # normal forces
mu = jnp.asarray(rng.random((B, nc)) * 0.5 + 0.05)    # friction coeffs

# ---- QCQP: tangential friction forces + their full sensitivities --------
jac = dq.qcqp_jacobian(P, q, l_n, mu)
print("dl_dq   ", jac.dl_dq.shape)     # (B, n, n)
print("dl_dl_n ", jac.dl_dl_n.shape)   # (B, n, nc)
print("dl_dmu  ", jac.dl_dmu.shape)    # (B, n, nc)

# Uncertainty propagation: friction-coefficient covariance -> force
# covariance, Sigma_l = J_mu Sigma_mu J_mu^T.
sigma_mu = 0.05**2 * jnp.eye(nc)
sigma_l = jnp.einsum("bic,cd,bjd->bij", jac.dl_dmu, sigma_mu, jac.dl_dmu)
print("force std from mu uncertainty:",
      np.asarray(jnp.sqrt(jnp.diagonal(sigma_l, axis1=1, axis2=2))).max())

# ---- consistency: one assembled system == jax.jacrev column by column ---
J_ad = jax.jacrev(lambda q: dq.solve_qcqp(P, q, l_n, mu))(q)
# jacrev over the batched solver yields (B, n, B, n); problems are
# independent, so take the block diagonal -> (B, n, n)
J_ad = jnp.moveaxis(jnp.diagonal(J_ad, axis1=0, axis2=2), -1, 0)
err = float(jnp.max(jnp.abs(J_ad - jac.dl_dq)))
print("max |jacrev - assembled| :", err)
# on TPU/f32 the two sides use DIFFERENT factorizations (jacrev hits the
# fused Pallas backward kernel, the jacobian API the XLA Schur solve), so
# the bound is f32-roundoff-scale, not exact-match-scale
tol = 1e-10 if J_ad.dtype == jnp.float64 else 1e-5
assert err < tol, (err, tol)

# ---- QP: dl/dq of the non-negative QP ------------------------------------
qp_jac = dq.qp_jacobian(P, q)
print("qp dl_dq", qp_jac.dl_dq.shape)
print("ok")
