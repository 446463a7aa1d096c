"""Batch bucketing helper (utils/bucketing.py)."""

import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq
from diffqcqp_tpu.utils.bucketing import bucket_size, pad_to_bucket, unpad

CFG = dq.SolverConfig(eps=1e-10, max_iter=5000)


def test_bucket_size():
    assert bucket_size(100, (128, 512)) == 128
    assert bucket_size(128, (128, 512)) == 128
    assert bucket_size(200, (128, 512)) == 512
    assert bucket_size(513, (128, 512)) == 1024   # multiple of the top bucket
    assert bucket_size(1500, (128, 512)) == 1536


def test_padded_solve_matches_unpadded(rng, spd):
    b, n = 11, 8
    P = jnp.array(spd(rng, b, n))
    q = jnp.array(rng.standard_normal((b, n)))
    l_ref, s_ref = dq.solve_qp_with_stats(P, q, config=CFG)
    (Pp, qp), info = pad_to_bucket((P, q), buckets=(16, 64))
    assert info.padded == 16 and Pp.shape[0] == 16
    l_pad, s_pad = dq.solve_qp_with_stats(Pp, qp, config=CFG)
    np.testing.assert_allclose(
        np.array(unpad(l_pad, info)), np.array(l_ref), atol=1e-12
    )
    assert bool(np.all(np.array(unpad(s_pad.converged, info))))
    # identity padding converges immediately and to exactly zero
    assert bool(np.all(np.array(l_pad[b:]) == 0.0))
    assert int(np.array(s_pad.iterations[b:]).max()) <= 2


def test_padded_qcqp_diag(rng):
    b, nc = 5, 3
    n = 2 * nc
    Pd = jnp.array(rng.random((b, n)) + 0.3)
    q = jnp.array(rng.standard_normal((b, n)))
    l_n = jnp.array(rng.random((b, nc)) + 0.1)
    mu = jnp.array(rng.random((b, nc)) + 0.1)
    cfg = dq.QCQP_DEFAULTS.replace(eps=1e-9, max_iter=20000)
    l_ref = dq.solve_qcqp(Pd, q, l_n, mu, config=cfg)
    (Pp, qp, lnp_, mup), info = pad_to_bucket((Pd, q, l_n, mu), buckets=(8,))
    l_pad = dq.solve_qcqp(Pp, qp, lnp_, mup, config=cfg)
    np.testing.assert_allclose(
        np.array(unpad(l_pad, info)), np.array(l_ref), atol=1e-12
    )
