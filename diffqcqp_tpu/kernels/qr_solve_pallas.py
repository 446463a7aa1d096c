"""Batched small-dense linear solve on TPU: one fused Householder-QR kernel.

Why: the backward pass solves one m x m KKT adjoint system per problem
(m = n..4n, i.e. 24-96 for the benchmark shapes; see diff/kkt.py). XLA lowers
``jnp.linalg.solve`` on such batches to a pivoted batched LU that dominates
the whole backward (measured on a v5e chip at B=4096, N=24 QCQPs: 48 ms of a
65 ms fwd+bwd step). The systems are tiny and embarrassingly batched - the
right TPU program is the same struct-of-arrays trick as the forward ADMM
kernel (admm_pallas.py): problems on the LANE axis, matrix rows on sublanes,
the whole factorisation in VMEM, no XLA linalg kernel anywhere.

Algorithm: Householder QR + back-substitution. QR needs NO pivoting for
backward stability (unlike LU), which is what makes it expressible as a
fixed, lane-parallel schedule: per column k, the reflector is built from a
masked column norm and applied to the trailing matrix as ONE rank-1 update
on the full (m, m, tile) block - three large VPU ops per step instead of a
per-lane pivot permutation (data-dependent row swaps per lane are the reason
batched LU is slow here in the first place).

Cost per problem: ~4/3 m^3 FLOPs (2x an LU - irrelevant: the batch is
HBM/VPU-bound and the constant is tiny at m <= 96).

The kernel solves A x = b for general (well-conditioned-enough) A in
float32. The KKT callers want S^T x = b; they pass A = swapaxes(S) - the
transpose fuses into the kernel-layout repack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import LANES as _LANES
from .layout import round_up as _round_up
from .layout import vmem_tile_b


def _qr_solve_kernel(a_ref, b_ref, x_out, a_scr, *, m: int):
    """Solve A x = b per lane; A (m, m, tb) rows-on-sublanes, b (m, tb).

    A lives in a VMEM scratch updated column-by-column (ref loads/stores keep
    Mosaic vector layouts concrete; slicing a carried 3-D VALUE along the
    middle axis produced layouts its reduction pass rejects).
    """
    f32 = jnp.float32
    tiny = f32(1e-30)

    a_scr[:] = a_ref[:]
    b = b_ref[:]                     # (m, tb) carried value
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)     # (m, 1)

    # --- Householder triangularisation, applied to [A | b] jointly.
    for k in range(m):
        below = (row >= k).astype(f32)                        # (m, 1)
        col = a_scr[:, k, :] * below                          # (m, tb)
        akk = col[k : k + 1, :]                               # (1, tb)
        nrm = jnp.sqrt(jnp.sum(col * col, axis=0, keepdims=True))
        # alpha = -sign(akk) * ||col||  (sign(0) treated as +1)
        sgn = jnp.where(akk < 0.0, f32(-1.0), f32(1.0))
        alpha = -sgn * nrm
        # v = col - alpha * e_k ; beta = 2 / ||v||^2 (0 when the column is
        # already zero below the diagonal, i.e. nothing to reflect)
        ek = (row == k).astype(f32)
        v = col - alpha * ek
        vsq = jnp.sum(v * v, axis=0, keepdims=True)           # (1, tb)
        beta = jnp.where(vsq > tiny, f32(2.0) / jnp.maximum(vsq, tiny), f32(0.0))
        # column k becomes exactly its triangular value (zeros below the
        # diagonal keep later reflectors clean)
        a_scr[:, k, :] = alpha * ek + a_scr[:, k, :] * (row < k).astype(f32)
        # reflector on the trailing columns: A_j -= beta (v^T A_j) v.
        # Columns j < k only accumulate never-read below-diagonal residue -
        # skipping them halves the work.
        for j in range(k + 1, m):
            cj = a_scr[:, j, :]
            wj = jnp.sum(v * cj, axis=0, keepdims=True)       # (1, tb)
            a_scr[:, j, :] = cj - (beta * wj) * v
        # same reflector on the rhs
        wb = jnp.sum(b * v, axis=0, keepdims=True)            # (1, tb)
        b = b - (beta * wb) * v

    # --- back-substitution R x = b (R upper triangular in a_scr).
    x = b * 0.0
    for k in reversed(range(m)):
        rrow = a_scr[k]                                       # (m, tb): R[k, :]
        upper = (row > k).astype(f32)
        dot = jnp.sum(rrow * x * upper, axis=0, keepdims=True)
        diag = rrow[k : k + 1, :]
        safe = jnp.where(jnp.abs(diag) > tiny, diag, tiny)
        xk = (b[k : k + 1, :] - dot) / safe
        x = x + xk * (row == k).astype(f32)

    x_out[:] = x


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def qr_solve_pallas(
    A: Array, b: Array, tile_b: int = 128, interpret: bool = False
) -> Array:
    """Batched dense solve A x = b; A (B, m, m), b (B, m) -> x (B, m).

    float32 on TPU (inputs are cast); Householder QR per problem inside one
    pallas kernel, problems tiled onto lanes. Zero-padded batch tails solve a
    trivial identity system. Off-TPU the kernel runs in interpret mode
    (Mosaic only lowers for TPU).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    B, m, _ = A.shape
    f32 = jnp.float32
    orig_dtype = b.dtype

    m_pad = _round_up(m, 8)
    # A input block (double-buffered) + a_scr scratch must fit VMEM. The
    # lane tile cannot shrink below 128, so m <= ~88 is the largest system
    # that fits (3 x 88^2 x 128 x 4B ~= 12 MiB) - diff/kkt.py's dispatch
    # respects that bound and sends larger systems to XLA's batched LU.
    tb = vmem_tile_b(m_pad, min(tile_b, _round_up(B, _LANES)))
    Bp = _round_up(B, tb)
    pad_b, pad_m = Bp - B, m_pad - m

    A_p = jnp.pad(A.astype(f32), ((0, pad_b), (0, pad_m), (0, pad_m)))
    # padded rows/cols and padded problems get an identity diagonal so the
    # factorisation stays non-singular and pads solve to exactly zero rhs.
    eye_fix = jnp.zeros((m_pad, m_pad), f32)
    if pad_m:
        idx = jnp.arange(m, m_pad)
        eye_fix = eye_fix.at[idx, idx].set(1.0)
        A_p = A_p + eye_fix[None]
    if pad_b:
        A_p = A_p.at[B:, :m, :m].set(jnp.eye(m, dtype=f32)[None])
    b_p = jnp.pad(b.astype(f32), ((0, pad_b), (0, pad_m)))

    A_k = jnp.transpose(A_p, (1, 2, 0))     # (m_pad, m_pad, Bp)
    b_k = b_p.T                             # (m_pad, Bp)

    grid = (Bp // tb,)
    mat_spec = pl.BlockSpec((m_pad, m_pad, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((m_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)

    x_k = pl.pallas_call(
        functools.partial(_qr_solve_kernel, m=m_pad),
        grid=grid,
        in_specs=[mat_spec, vec_spec],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, Bp), f32),
        scratch_shapes=[pltpu.VMEM((m_pad, m_pad, tb), f32)],
        interpret=interpret,
    )(A_k, b_k)

    return x_k.T[:B, :m].astype(orig_dtype)
