"""Shared kernel-layout helpers for the struct-of-arrays pallas kernels.

All kernels here (admm_pallas, qcqp_bwd_pallas, coord_bwd_pallas,
qr_solve_pallas) use the same layout: problems on the LANE axis, problem
coordinates on sublanes, matrices as (n_pad, n_pad, B_pad) stacks of
column planes. This module centralises the two pieces every wrapper needs:

  * ``vmem_tile_b``: clamp a requested lane-tile width so the kernel's VMEM
    footprint fits the ~16 MiB scoped budget of a TensorCore. Pallas
    double-buffers input/output blocks across grid steps, so the matrix
    input block counts twice; the measured failure point (forward kernel,
    n_pad=24, tile_b=2048 -> "20.53M > 16.00M") anchors the budget.
  * ``pack_P`` / ``pack_vec``: the (B, n, n) -> (n_pad, n_pad, B_pad)
    relayout with optional coordinate permutation and identity padding.
    Measured at the flagship shape this is ~free (< 20 us) - XLA fuses the
    gather+pad+transpose into one pass - so sharing packed values between
    kernels is about avoiding VMEM/code duplication, not HBM traffic.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import Array

LANES = 128
# Conservative scoped-VMEM budget (bytes): real limit 16 MiB, minus slack
# for Mosaic's own scratch and the double-buffered small operands.
VMEM_BUDGET = 10 * 1024 * 1024


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vmem_tile_b(
    n_pad: int,
    requested: int,
    matrix_bufs: float = 3.0,
    vec_rows: int = 40,
    budget: int = VMEM_BUDGET,
) -> int:
    """Largest lane-tile width (multiple of 128, <= requested) whose VMEM
    footprint fits.

    matrix_bufs: number of (n_pad, n_pad, tile) f32 buffers alive at once,
    counting pipeline double-buffering of the P input block (in=2) plus
    scratches. vec_rows: total sublane rows of all (rows, tile) vector
    operands/outputs/carries, double-buffering included.
    """
    per_lane = int((matrix_bufs * n_pad * n_pad + vec_rows * n_pad) * 4)
    cap = max(LANES, (budget // per_lane) // LANES * LANES)
    return max(LANES, min(requested, cap))


def forward_tile_b(n: int, requested: int, hbm_p: bool = True) -> int:
    """The lane-tile width the FUSED FORWARD KERNEL will actually run with
    for problem size n and a requested tile (SolverConfig.pallas_tile_b) -
    the single definition shared by admm_pallas.admm_solve_pallas and the
    compaction calibrator (utils/autotune.py), so the calibrator's cost
    model prices the same tiles the kernel executes (a requested 512 is
    silently clamped to 384/256/128 as N grows; modeling 512 would put the
    tile count off 2-4x exactly on the large-N distributions compaction
    exists for).

    hbm_p=True includes the single-buffered HBM-P mode's wider-tile
    option (on-TPU default; interpret mode runs the blocked path only).
    """
    return forward_tile_plan(n, requested, hbm_p)[0]


def forward_tile_plan(
    n: int, requested: int, hbm_p: bool = True
) -> tuple[int, bool]:
    """(tile_b, p_in_hbm) the fused forward kernel will use - see
    forward_tile_b. p_in_hbm: single-buffered P slab (manual HBM->VMEM
    DMA) - taken when it admits a wider tile, and forced at n_pad >= 96
    where the double-buffered footprint sits at the ~16 MiB ceiling."""
    n_pad = round_up(max(n, 1), 8)
    tb = vmem_tile_b(n_pad, requested)
    if hbm_p:
        tb_sb = vmem_tile_b(
            n_pad, requested, matrix_bufs=2.0, budget=12 * 1024 * 1024
        )
        if tb_sb > tb or n_pad >= 96:
            return tb_sb, True
    return tb, False


def qcqp_perm(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Coordinate permutation: reference order (contact i owns 2i, 2i+1) ->
    kernel order (contact i owns rows i, nc+i), and its inverse."""
    nc = n // 2
    perm = np.concatenate([np.arange(nc) * 2, np.arange(nc) * 2 + 1])
    return perm, np.argsort(perm)


def pack_P(
    P: Array, n_pad: int, B_pad: int, perm: np.ndarray | None = None
) -> Array:
    """(B, n, n) -> (n_pad, n_pad, B_pad) float32 with identity padding.

    Padded coordinate rows/cols get a unit diagonal (keeps every per-lane
    Cholesky/QR non-singular); padded batch lanes get P = I (they solve
    trivially to zero against zero-padded vectors).
    """
    B, n, _ = P.shape
    if perm is not None:
        P = P[:, perm][:, :, perm]
    pad_b, pad_n = B_pad - B, n_pad - n
    P_p = jnp.pad(P.astype(jnp.float32), ((0, pad_b), (0, pad_n), (0, pad_n)))
    if pad_n:
        fix = np.zeros((n_pad, n_pad), np.float32)
        fix[np.arange(n, n_pad), np.arange(n, n_pad)] = 1.0
        P_p = P_p + jnp.asarray(fix)[None]
    if pad_b:
        P_p = P_p.at[B:, :n, :n].set(jnp.eye(n, dtype=jnp.float32)[None])
    return jnp.transpose(P_p, (1, 2, 0))


def pack_vec(
    x: Array, n_pad: int, B_pad: int, perm: np.ndarray | None = None,
    fill: float = 0.0,
) -> Array:
    """(B, m) -> (n_pad, B_pad) float32, padded with ``fill``."""
    B, m = x.shape
    if perm is not None:
        x = x[:, perm]
    x = jnp.pad(
        x.astype(jnp.float32), ((0, B_pad - B), (0, n_pad - m)),
        constant_values=fill,
    )
    return x.T


def unpack_vec(x_k: Array, B: int, m: int, inv: np.ndarray | None = None) -> Array:
    """(rows, B_pad) -> (B, m), undoing pack_vec (and the permutation)."""
    x = x_k.T[:B, :m]
    return x[:, inv] if inv is not None else x
