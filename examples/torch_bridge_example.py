"""Using the framework from PyTorch: the reference's autograd.Function API
(qcqp.py) backed by the batched TPU/JAX engine.

Existing diffqcqp users change one import:
    from qcqp import QCQPFn2            # reference
    from diffqcqp_tpu.torch_autograd import QCQPFn2   # this framework

Run: python examples/torch_bridge_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from diffqcqp_tpu.torch_autograd import QCQPFn2

torch.manual_seed(0)
B, NC = 32, 4
N = 2 * NC
rng = np.random.default_rng(0)

S = rng.standard_normal((B, N, N))
P = torch.tensor(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(N), dtype=torch.float64)
q = torch.tensor(rng.standard_normal((B, N)), dtype=torch.float64)
l_n = torch.tensor(rng.random((B, NC)) * 0.5 + 0.1, dtype=torch.float64)
mu = torch.tensor(rng.random((B, NC)) * 0.5 + 0.1, dtype=torch.float64,
                  requires_grad=True)
ws = torch.zeros((B, N), dtype=torch.float64)

mu0 = mu.detach().clone()
target = QCQPFn2.apply(P, q, l_n, mu0 * 0.8, ws, 1e-10, 2000).detach()

opt = torch.optim.Adam([mu], lr=2e-2)
for k in range(301):
    opt.zero_grad()
    l = QCQPFn2.apply(P, q, l_n, mu, ws, 1e-10, 2000)
    loss = ((l - target) ** 2).mean()
    loss.backward()
    opt.step()
    with torch.no_grad():
        mu.clamp_(0.01, 1.0)
    if k % 75 == 0:
        print(f"step {k:4d}  loss {float(loss.detach()):.3e}")

ratio = (mu.detach() / mu0).median()
print(f"median learned/initial mu ratio (target 0.8): {float(ratio):.3f}")
