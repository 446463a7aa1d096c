"""PyTorch autograd bridge: parity with the JAX API + torch.autograd.gradcheck.

The reference's user layer is torch.autograd.Function subclasses
(qcqp.py:22-181); diffqcqp_tpu.torch_autograd provides the same classes with
the same apply() signatures. Tests run on the CPU backend in float64
(reference precision, qcqp.py:13).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import diffqcqp_tpu as dq  # noqa: E402
from diffqcqp_tpu.torch_autograd import (  # noqa: E402
    BoxQPFn2,
    QCQPFn2,
    QPFn2,
    SignedBoxQPFn2,
    set_backend,
)

from .conftest import random_spd  # noqa: E402

EPS = 1e-10
MAX_ITER = 2000


@pytest.fixture(autouse=True)
def _cpu_backend():
    set_backend("cpu")
    yield
    set_backend(None)


def _t(x):
    return torch.from_numpy(np.asarray(x)).to(torch.float64)


def test_qp_matches_jax_api(rng):
    b, n = 6, 8
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    ws = np.zeros((b, n))
    # reference column layout (B, N, 1)
    l_t = QPFn2.apply(_t(P), _t(q)[..., None], _t(ws)[..., None], EPS, MAX_ITER)
    assert l_t.shape == (b, n, 1)
    l_j = dq.solve_qp(jnp.asarray(P), jnp.asarray(q), eps=EPS, max_iter=MAX_ITER)
    np.testing.assert_allclose(l_t.numpy()[..., 0], np.array(l_j), atol=1e-8)
    # flat layout also accepted
    l_flat = QPFn2.apply(_t(P), _t(q), _t(ws), EPS, MAX_ITER)
    np.testing.assert_allclose(l_flat.numpy(), np.array(l_j), atol=1e-8)


def test_qp_gradcheck(rng):
    b, n = 2, 4
    P = torch.tensor(random_spd(rng, b, n), dtype=torch.float64, requires_grad=True)
    q = torch.tensor(
        -np.abs(rng.standard_normal((b, n))) - 0.5,  # keep all coords free
        dtype=torch.float64,
        requires_grad=True,
    )
    ws = torch.zeros((b, n), dtype=torch.float64)

    def f(P, q):
        return QPFn2.apply(P, q, ws, 1e-12, 10000)

    assert torch.autograd.gradcheck(f, (P, q), eps=1e-6, atol=1e-5, rtol=1e-4)


def test_box_backward_works(rng):
    """The reference's BoxQPFn2.backward crashes (qcqp.py:91 asDiagonal);
    ours must produce finite-difference-accurate grads for all four inputs."""
    b, n = 2, 4
    P = torch.tensor(random_spd(rng, b, n), dtype=torch.float64, requires_grad=True)
    q = torch.tensor(rng.standard_normal((b, n)), dtype=torch.float64, requires_grad=True)
    lo = torch.tensor(
        -(rng.random((b, n)) * 0.5 + 0.3), dtype=torch.float64, requires_grad=True
    )
    hi = torch.tensor(
        rng.random((b, n)) * 0.5 + 0.3, dtype=torch.float64, requires_grad=True
    )
    ws = torch.zeros((b, n), dtype=torch.float64)

    def f(P, q, lo, hi):
        return BoxQPFn2.apply(P, q, lo, hi, ws, 1e-12, 10000)

    assert torch.autograd.gradcheck(
        f, (P, q, lo, hi), eps=1e-6, atol=1e-4, rtol=1e-3,
        nondet_tol=1e-10,
    )


def test_signed_box_forward_matches_api(rng):
    b, n = 5, 6
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    lo = -(rng.random((b, n)) * 0.5 + 0.3)
    hi = rng.random((b, n)) * 0.5 + 0.3
    v = rng.standard_normal((b, n))
    ws = np.zeros((b, n))
    l_t = SignedBoxQPFn2.apply(
        _t(P), _t(q), _t(lo), _t(hi), _t(v), _t(ws), EPS, MAX_ITER
    )
    l_j = dq.solve_signed_box_qp(
        *map(jnp.asarray, (P, q, lo, hi, v)), eps=EPS, max_iter=MAX_ITER
    )
    np.testing.assert_allclose(l_t.numpy(), np.array(l_j), atol=1e-8)


def test_qcqp_matches_api_and_grads(rng):
    b, nc = 4, 3
    n = 2 * nc
    P = random_spd(rng, b, n)
    q = rng.standard_normal((b, n))
    l_n = rng.random((b, nc)) * 0.5 + 0.1
    mu = rng.random((b, nc)) * 0.5 + 0.1
    ws = np.zeros((b, n))

    l_t = QCQPFn2.apply(
        _t(P), _t(q)[..., None], _t(l_n)[..., None], _t(mu)[..., None],
        _t(ws)[..., None], EPS, MAX_ITER,
    )
    l_j = dq.solve_qcqp(
        *map(jnp.asarray, (P, q, l_n, mu)), eps=EPS, max_iter=MAX_ITER
    )
    np.testing.assert_allclose(l_t.numpy()[..., 0], np.array(l_j), atol=1e-8)

    # torch grads == jax grads on a shared scalar loss
    Pt = _t(P).requires_grad_()
    qt = _t(q).requires_grad_()
    lnt = _t(l_n).requires_grad_()
    mut = _t(mu).requires_grad_()
    loss = (QCQPFn2.apply(Pt, qt, lnt, mut, _t(ws), EPS, MAX_ITER) ** 2).sum()
    loss.backward()

    import jax

    def jloss(P, q, l_n, mu):
        return jnp.sum(
            dq.solve_qcqp(P, q, l_n, mu, eps=EPS, max_iter=MAX_ITER) ** 2
        )

    gj = jax.grad(jloss, argnums=(0, 1, 2, 3))(
        *map(jnp.asarray, (P, q, l_n, mu))
    )
    np.testing.assert_allclose(qt.grad.numpy(), np.array(gj[1]), atol=1e-6)
    np.testing.assert_allclose(lnt.grad.numpy(), np.array(gj[2]), atol=1e-6)
    np.testing.assert_allclose(mut.grad.numpy(), np.array(gj[3]), atol=1e-6)
    np.testing.assert_allclose(Pt.grad.numpy(), np.array(gj[0]), atol=1e-6)
