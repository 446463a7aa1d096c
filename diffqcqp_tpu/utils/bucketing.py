"""Batch-size bucketing: stop recompiling on every ragged batch.

Every jitted solve specialises on the batch size; a serving workload whose
batch fluctuates (e.g. number of active contacts per simulation step)
would recompile constantly. The standard fix is to round the batch up to a
small set of bucket sizes and mask out the padding - this module packages
that pattern for the solver API.

Padded problems are IDENTITY problems (P = I, q = 0) that converge in one
iteration to l = 0, so they cost one lane each and cannot drag a tile
(their residual is 0 from the first step).

    from diffqcqp_tpu.utils.bucketing import pad_to_bucket, unpad
    padded, info = pad_to_bucket((P, q, l_n, mu), buckets=(512, 1024, 4096))
    l, stats = solve_qcqp_with_stats(*padded, config=CFG)   # few signatures
    l = unpad(l, info)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import Array


class BucketInfo(NamedTuple):
    batch: int          # real batch size
    padded: int         # bucket size used


def bucket_size(batch: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= batch; the largest bucket's multiple if none fits
    (so arbitrarily large batches still hit a bounded signature set)."""
    for b in sorted(buckets):
        if batch <= b:
            return b
    top = max(buckets)
    return ((batch + top - 1) // top) * top


def pad_to_bucket(
    args: Sequence[Array], buckets: Sequence[int] = (128, 512, 2048, 8192)
) -> tuple[tuple[Array, ...], BucketInfo]:
    """Pad each array's leading batch dim up to the bucket size.

    args[0] must be P ((B, N, N) dense or (B, N) diagonal): its padding is
    the identity problem; every other array pads with zeros. Every array
    must carry the SAME leading batch dimension - broadcast conveniences
    the solver API accepts (shared (N, N) P over a batched q, unbatched
    bounds) must be materialised by the caller first, because a shared
    dense P is indistinguishable from a diagonal batch here and would be
    silently corrupted.
    """
    B = args[0].shape[0]
    for i, x in enumerate(args):
        if x.shape[0] != B:
            raise ValueError(
                f"pad_to_bucket: args[{i}] has leading dim {x.shape[0]} != "
                f"{B}; all arrays must share one batch dimension "
                "(broadcast/shared inputs must be materialised first)"
            )
    Bp = bucket_size(B, buckets)
    info = BucketInfo(batch=B, padded=Bp)
    if Bp == B:
        return tuple(args), info
    pad = Bp - B
    out = []
    P = args[0]
    if P.ndim == 3:
        eye = jnp.broadcast_to(
            jnp.eye(P.shape[-1], dtype=P.dtype), (pad,) + P.shape[1:]
        )
        out.append(jnp.concatenate([P, eye], axis=0))
    else:
        ones = jnp.ones((pad,) + P.shape[1:], P.dtype)
        out.append(jnp.concatenate([P, ones], axis=0))
    for x in args[1:]:
        out.append(
            jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        )
    return tuple(out), info


def unpad(x: Array, info: BucketInfo) -> Array:
    """Strip the bucket padding from a leading-batch result (works on any
    SolveStats field too)."""
    return x[: info.batch]
