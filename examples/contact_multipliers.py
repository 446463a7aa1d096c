"""Contact-force multipliers and their sensitivities, on-device.

The verdict scenario the public duals surface exists for: a physics user
mid-simulation wants the friction-cone multipliers gamma (which contacts
are sliding on their cone boundary, and how hard) and the raw KKT
sensitivities (dgamma, dl against a chosen cotangent) - in working
precision, on the solver backend, without detouring through the f64
diagnostic oracle.

Mirrors the reference's exposed surface: dualFromPrimalQCQP /
solveDerivativesQCQP returning (E1, E2, blgamma)
(/root/reference/pybindings.cpp:62-71), batched here.

Run: python examples/contact_multipliers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

import diffqcqp_tpu as dq

# A batch of friction QCQPs like one simulator step's (models/contact_sim
# solves 1-contact problems per body; here 4 contacts per problem).
B, NC = 64, 4
N = 2 * NC
rng = np.random.default_rng(0)
S = (rng.standard_normal((B, N, N)) / np.sqrt(N)).astype(np.float32)
P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(N, dtype=np.float32))
q = jnp.asarray((rng.standard_normal((B, N)) * 0.5).astype(np.float32))
l_n = jnp.asarray((rng.random((B, NC)) * 0.5 + 0.05).astype(np.float32))
mu = jnp.asarray((rng.random((B, NC)) * 0.5 + 0.05).astype(np.float32))

cfg = dq.QCQP_DEFAULTS.replace(eps=1e-7, max_iter=400)
l, stats = dq.solve_qcqp_with_stats(P, q, l_n, mu, config=cfg)
assert bool(np.all(np.asarray(stats.converged)))

# --- multipliers: gamma_i > 0 <=> contact i slides on its cone boundary
# (squared-slack convention, Jacobian column 2*l_(i), like the reference)
gamma = dq.recover_qcqp_duals(P, q, l_n, mu, l, config=cfg)
sliding = np.asarray(gamma) > 1e-6
print(f"sliding contacts: {sliding.sum()} / {sliding.size} "
      f"(max gamma {float(np.max(np.asarray(gamma))):.3f})")

# consistency: a sliding contact sits on its cone boundary
pts = np.asarray(l).reshape(B, NC, 2)
norms = np.linalg.norm(pts, axis=-1)
radii = np.asarray(l_n) * np.asarray(mu)
on_boundary = np.abs(norms - radii) <= 1e-5 * np.maximum(radii, 1.0)
assert np.all(on_boundary[sliding]), "sliding contact off its cone boundary"

# --- raw KKT sensitivities against a cotangent (here: d sum(l) / d inputs)
g = jnp.ones_like(l)
d = dq.qcqp_derivatives(P, q, l_n, mu, l, g, config=cfg)
# reference gradient assembly (qcqp.py:167-181): grad_l_n = e2*dgamma etc.
grad_l_n = np.asarray(d.e2) * np.asarray(d.dgamma)
grad_mu = np.asarray(d.e1) * np.asarray(d.dgamma)
print(f"max |d sum(l) / d l_n| = {float(np.max(np.abs(grad_l_n))):.4f}, "
      f"max |d sum(l) / d mu| = {float(np.max(np.abs(grad_mu))):.4f}")

# same numbers as autodiff through the solver (the derivatives surface IS
# the custom_vjp machinery, exported)
import jax

gl = jax.grad(
    lambda ln_, mu_: jnp.sum(dq.solve_qcqp(P, q, ln_, mu_, config=cfg)),
    argnums=(0, 1),
)(l_n, mu)
np.testing.assert_allclose(np.asarray(gl[0]), grad_l_n, atol=1e-6)
np.testing.assert_allclose(np.asarray(gl[1]), grad_mu, atol=1e-6)
print("derivatives surface == jax.grad through the solver: OK")
