"""Direct unit tests for the in-kernel zero-diag LDL^T helpers (kernels/ldl.py).

The helpers are exercised end-to-end by every fused-kernel parity test; this
file pins their contract in isolation: chol_to_unit + ldl_solve on a packed
SoA tile must reproduce a dense numpy solve of (P + diag(shift)) to f32
accuracy, including the ``start`` (known-leading-zero rhs) fast path and
padded coordinate rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffqcqp_tpu.kernels.ldl import chol_to_unit, ldl_solve


def _solve_kernel(p_ref, rhs_ref, shift_ref, x_out, lc_ref, dinv_ref,
                  *, n: int, start: int):
    f32 = jnp.float32
    tiny = f32(1e-30)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # standard left-looking Cholesky columns of P + diag(shift), as the
    # fused kernels build them (admm_pallas.factorize)
    for j in range(n):
        ej = (row_idx == j).astype(f32)
        s = p_ref[:, j, :] + ej * shift_ref[:]
        for k in range(j):
            colk = lc_ref[:, k, :]
            s = s - colk * colk[j : j + 1, :]
        d = jnp.maximum(s[j : j + 1, :], tiny)
        col = s * jax.lax.rsqrt(d)
        lc_ref[:, j, :] = col * (row_idx >= j).astype(f32)
    chol_to_unit(lc_ref, dinv_ref, n, row_idx)
    x_out[:] = ldl_solve(lc_ref, dinv_ref, rhs_ref[:], n, start=start)


def _run(P_pack, rhs_pack, shift, n, start=0):
    tb = P_pack.shape[-1]
    f = pl.pallas_call(
        lambda *refs: _solve_kernel(*refs, n=n, start=start),
        out_shape=jax.ShapeDtypeStruct((n, tb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, n, tb), jnp.float32),
            pltpu.VMEM((n, tb), jnp.float32),
        ],
        interpret=True,
    )
    return f(P_pack, rhs_pack, shift)


@pytest.mark.parametrize("n,start", [(8, 0), (8, 3), (16, 0)])
def test_ldl_solve_matches_dense(n, start):
    rng = np.random.default_rng(0)
    tb = 128
    A = (rng.standard_normal((tb, n, n)) / np.sqrt(n)).astype(np.float32)
    P = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(n, dtype=np.float32)
    shift = (rng.random((1, tb)) * 2.0 + 0.1).astype(np.float32)
    rhs = rng.standard_normal((tb, n)).astype(np.float32)
    if start:
        rhs[:, :start] = 0.0  # contract: rows < start are known zero

    P_pack = jnp.asarray(P.transpose(1, 2, 0))     # (n, n, tb) SoA
    rhs_pack = jnp.asarray(rhs.T)                  # (n, tb)
    x = np.asarray(_run(P_pack, rhs_pack, jnp.asarray(shift), n, start=start))

    K = P + shift[0][:, None, None] * np.eye(n, dtype=np.float32)
    ref = np.linalg.solve(
        K.astype(np.float64), rhs.astype(np.float64)[..., None]
    )[..., 0]
    err = np.max(np.abs(x.T - ref) / (1.0 + np.abs(ref)))
    assert err < 5e-5, err


def test_padded_rows_stay_zero():
    """Padded coordinates (P diag 1, rhs 0) must solve to exact zeros and
    not pollute real rows — the fused kernels rely on this for n_pad > n."""
    rng = np.random.default_rng(1)
    tb, n_real, n = 128, 5, 8
    A = rng.standard_normal((tb, n_real, n_real)).astype(np.float32)
    P = np.zeros((tb, n, n), np.float32)
    P[:, :n_real, :n_real] = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(
        n_real, dtype=np.float32
    )
    idx = np.arange(n_real, n)
    P[:, idx, idx] = 1.0
    shift = np.full((1, tb), 0.7, np.float32)
    rhs = np.zeros((tb, n), np.float32)
    rhs[:, :n_real] = rng.standard_normal((tb, n_real)).astype(np.float32)

    x = np.asarray(
        _run(
            jnp.asarray(P.transpose(1, 2, 0)),
            jnp.asarray(rhs.T),
            jnp.asarray(shift),
            n,
        )
    ).T
    assert np.all(x[:, n_real:] == 0.0)
    K = P[:, :n_real, :n_real] + shift[0][:, None, None] * np.eye(
        n_real, dtype=np.float32
    )
    ref = np.linalg.solve(
        K.astype(np.float64), rhs[:, :n_real].astype(np.float64)[..., None]
    )[..., 0]
    err = np.max(np.abs(x[:, :n_real] - ref) / (1.0 + np.abs(ref)))
    assert err < 5e-5, err
