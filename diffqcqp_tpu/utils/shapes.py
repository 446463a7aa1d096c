"""Input canonicalisation for the public API.

The reference's PyTorch layer works on column-vector batches (B, N, 1)
(qcqp.py:28-31) and its unbatched twins on flat (N,) vectors
(qcqp_no_batch.py:28). The TPU API accepts all of:

    q: (B, N), (B, N, 1), (N,), (N, 1)
    P: (B, N, N) dense | (B, N) diagonal | (N, N) dense | (N,) diagonal

internally always computing over flat batched (B, N) / (B, N, N) / diagonal
(B, N) arrays, and restoring the caller's q layout on output. The diagonal-P
representation is first-class (the reference supports it only in the
unbatched wrapper, qcqp_no_batch.py:44-47).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import Array


class Canon(NamedTuple):
    P: Array                       # (B, N, N) dense or (B, N) diagonal
    q: Array                       # (B, N)
    batched: bool                  # caller passed a batch dimension
    column: bool                   # caller used trailing (...,1) columns
    restore: Callable[[Array], Array]  # map (B, M) back to caller layout


def _flatten_vec(x: Array, name: str) -> tuple[Array, bool, bool]:
    """-> (flat (B, M), batched, column)."""
    if x.ndim == 1:
        return x[None, :], False, False
    if x.ndim == 2:
        if x.shape[-1] == 1:  # (N, 1) unbatched column
            return x[None, :, 0], False, True
        return x, True, False
    if x.ndim == 3:
        if x.shape[-1] != 1:
            raise ValueError(f"{name}: 3-D input must be (B, N, 1), got {x.shape}")
        return x[:, :, 0], True, True
    raise ValueError(f"{name}: unsupported rank {x.ndim}")


def canon_problem(P: Array, q: Array) -> Canon:
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    # (B, 1) q is ambiguous with an unbatched (N, 1) column; when P has the
    # matching (B, 1) diagonal shape the batched N=1 reading is the only
    # consistent one (an unbatched N=B problem would need P (B,) or (B, B)).
    if (
        q.ndim == 2
        and q.shape[-1] == 1
        and P.ndim == 2
        and P.shape == q.shape
        and q.shape[0] > 1
    ):
        qf, batched, column = q, True, False
    else:
        qf, batched, column = _flatten_vec(q, "q")
    n = qf.shape[-1]

    if P.ndim == 1:                        # (N,) diagonal, unbatched
        if P.shape[0] != n:
            raise ValueError(f"P {P.shape} incompatible with q of size {n}")
        Pf = P[None, :]
    elif P.ndim == 3:                      # (B, N, N) dense
        if P.shape[-2:] != (n, n):
            raise ValueError(f"P {P.shape} incompatible with q of size {n}")
        Pf = P
    elif P.ndim == 2:
        if not batched:                    # (N, N) dense, unbatched
            if P.shape != (n, n):
                raise ValueError(f"P {P.shape} incompatible with q of size {n}")
            Pf = P[None]
        else:                              # batched: (B, N) diag or (N, N) shared
            if P.shape == qf.shape:
                Pf = P                     # diagonal batch
            elif P.shape == (n, n):
                Pf = jnp.broadcast_to(P[None], (qf.shape[0], n, n))
            else:
                raise ValueError(f"P {P.shape} incompatible with q {qf.shape}")
    else:
        raise ValueError(f"P: unsupported rank {P.ndim}")

    if Pf.ndim == 3 and Pf.shape[0] != qf.shape[0]:
        if Pf.shape[0] == 1:
            Pf = jnp.broadcast_to(Pf, (qf.shape[0],) + Pf.shape[1:])
        else:
            raise ValueError(f"batch mismatch: P {Pf.shape}, q {qf.shape}")

    # Mixed-precision inputs (e.g. float64 P with float32 q under x64) would
    # surface as an obscure while_loop carry-dtype error deep in the engine;
    # unify to the promoted dtype here instead.
    common = jnp.promote_types(Pf.dtype, qf.dtype)
    Pf = Pf.astype(common)
    qf = qf.astype(common)

    # The quadratic form only sees the symmetric part of P; symmetrising here
    # makes forward solve, KKT differentiation and grad_P mutually consistent
    # (grad_P is returned symmetrised; identical to the reference's one-sided
    # -dl l^T gradient for any symmetric parametrisation such as P = S S^T).
    if Pf.ndim == 3:
        Pf = 0.5 * (Pf + jnp.swapaxes(Pf, -1, -2))

    def restore(x: Array) -> Array:
        if column:
            x = x[..., None]
        if not batched:
            x = x[0]
        return x

    return Canon(P=Pf, q=qf, batched=batched, column=column, restore=restore)


def canon_like(x: Array, canon: Canon, name: str, width: int | None = None) -> Array:
    """Canonicalise an auxiliary vector (warm_start, l_min, l_n, ...) to
    (B, M) using the same batch convention as the main problem.

    ``width`` is the expected per-problem length (n, or nc for the QCQP's
    l_n/mu); when given it disambiguates the (B, 1)-batched vs (N, 1)-column
    reading for width-1 vectors (single-contact problems).
    """
    x = jnp.asarray(x)
    if (
        width is not None
        and canon.batched
        and x.ndim == 2
        and x.shape == (canon.q.shape[0], width)
    ):
        xf = x
    else:
        xf, batched, _ = _flatten_vec(x, name)
        if batched and not canon.batched and xf.shape[0] != 1:
            raise ValueError(f"{name} is batched but the problem is not")
        if not batched and canon.batched:
            xf = jnp.broadcast_to(xf, (canon.q.shape[0],) + xf.shape[1:])
    if xf.shape[0] != canon.q.shape[0]:
        if xf.shape[0] == 1:
            xf = jnp.broadcast_to(xf, (canon.q.shape[0],) + xf.shape[1:])
        else:
            raise ValueError(f"{name}: batch {xf.shape[0]} != {canon.q.shape[0]}")
    return xf.astype(canon.q.dtype)
