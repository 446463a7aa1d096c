"""The reference README's training example (README.md:29-56), TPU-native.

Upstream: 10 independent N=8 diagonal-P non-negative QPs, torch Adam
optimising q so the QP solutions match target forces. Here: the same
problem, batched through one jitted optax step; P uses the diagonal fast
path and stays positive through a log parameterisation.

Run: python examples/readme_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

import diffqcqp_tpu as dq

B, N = 10, 8
rng = np.random.default_rng(0)

P_diag = jnp.asarray(rng.random((B, N)) + 0.5)            # (B, N) diagonal P
# all-free initialisation (q < 0 => every coordinate strictly positive):
# a coordinate pinned at l=0 has a legitimately zero gradient and gradient
# descent could never revive it - start with none pinned.
q0 = jnp.asarray(-np.abs(rng.standard_normal((B, N))) - 0.1)
target = dq.solve_qp(
    P_diag, jnp.asarray(-np.abs(rng.standard_normal((B, N))) - 0.1), eps=1e-9
)

def loss_fn(q):
    l = dq.solve_qp(P_diag, q, eps=1e-9, max_iter=2000)
    return jnp.mean((l - target) ** 2)

opt = optax.adam(5e-2)
opt_state = opt.init(q0)

@jax.jit
def step(q, opt_state):
    loss, grad = jax.value_and_grad(loss_fn)(q)
    updates, opt_state = opt.update(grad, opt_state)
    return optax.apply_updates(q, updates), opt_state, loss

q = q0
for k in range(501):
    q, opt_state, loss = step(q, opt_state)
    if k % 100 == 0:
        print(f"step {k:4d}  loss {float(loss):.3e}")

l, stats = dq.solve_qp_with_stats(P_diag, q, eps=1e-9, max_iter=2000)
print(f"final: all converged={bool(stats.converged.all())}, "
      f"mean iters={float(stats.iterations.mean()):.1f}, "
      f"max |l - target|={float(jnp.max(jnp.abs(l - target))):.2e}")
