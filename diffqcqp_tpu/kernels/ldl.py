"""In-kernel unit-diagonal LDL^T conversion + solve (op-count optimised).

The fused kernels' inner loops are op-LATENCY bound (docs/DESIGN.md section
7: ~25 ns per (n, TILE_B) VPU op, roughly half fixed overhead), so the cost
of a triangular-solve sweep is its OP COUNT, not its FLOPs. The classic
row-by-row sweep over a standard Cholesky factor costs 2 ops per row:

    yi  = acc[i] / L[i, i]        # (1, tb) divide - a full-overhead op
    acc = acc - L[:, i] * yi      # (n, tb) FMA

Rewriting L L^T = Lh D~ Lh^T with Lh = L D^{-1} unit-lower (D = diag(L_ii),
D~ = D^2) and storing Lh with its unit diagonal ZEROED makes each sweep row
exactly ONE broadcast-FMA: `acc - Lh[:, i] * acc[i]` leaves row i untouched
(stored diagonal is 0), so row i of the accumulator IS y_i when its turn
comes and the final accumulator is the whole solution - no per-row divides,
no (1, tb) partial results, no jnp.concatenate reassembly. A full solve is
2n + 1 ops instead of ~4n:

    Lh y = rhs          n FMAs          (zero-diag columns)
    w    = y * dinv     1 multiply      (dinv = 1 / L_ii^2, an (n, tb) plane)
    Lh^T x = w          n FMAs          (zero-diag rows)

The factorisation itself still computes standard Cholesky columns (the
left-looking update `s - L[:,k] * L[j,k]` needs UNNORMALISED columns - doing
it on normalised ones adds an n^2/2-small-op rescale, measured not worth
it); `chol_to_unit` then converts in place for ~3 ops per column, under one
iteration's cost per refactorisation.

Numerics: Lh and dinv carry one extra f32 rounding each vs dividing by
L_ii directly; parity tests (tests/test_pallas.py, test_*_bwd_kernel.py)
bound the difference against the XLA engine / generic adjoints.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol_to_unit", "ldl_solve", "ldl_solve_cm"]


def chol_to_unit(lc_ref, dinv_ref, n: int, row_idx):
    """Convert lc_ref from standard Cholesky columns (L[:, j], masked to
    rows >= j) to zero-diagonal unit-lower columns Lh[:, j] = L[:, j] / L_jj
    in place, and store dinv rows 1 / L_jj^2 (the D~^{-1} plane).

    ``row_idx`` is the kernel's (n, 1) iota column. Padded coordinate rows
    (P diagonal 1 + shift) convert to zero columns with finite dinv. The
    `tiny` floor upstream keeps L_jj >= sqrt(tiny) = 1e-15, so the
    reciprocals stay finite (<= 1e30, f32-representable).
    """
    f32 = jnp.float32
    rows = []
    for j in range(n):
        colj = lc_ref[:, j, :]
        rj = 1.0 / colj[j : j + 1, :]
        strict = (row_idx > j).astype(f32)
        lc_ref[:, j, :] = colj * (rj * strict)
        rows.append(rj * rj)
    dinv_ref[:] = jnp.concatenate(rows, axis=0)


def ldl_solve(lc_ref, dinv_ref, rhs, n: int, start: int = 0):
    """x = (L L^T)^{-1} rhs from the CONVERTED (chol_to_unit) factor.

    rhs rows < ``start`` must be known zero: the forward sweep then skips
    them (a zero accumulator row broadcasts a zero update - pure no-op).
    2 (n - start) + 1 ops, no divides, no concatenates.
    """
    acc = rhs
    for i in range(start, n):
        acc = acc - lc_ref[:, i, :] * acc[i : i + 1, :]
    acc = acc * dinv_ref[:]
    for i in reversed(range(n)):
        acc = acc - lc_ref[i] * acc[i : i + 1, :]
    return acc


def ldl_solve_cm(lc_ref, dinv_ref, rhs, n: int):
    """ldl_solve for a COLUMN-MAJOR factor ref: lc_ref[(col, row, lanes)],
    i.e. lc_ref[j] is column j (the rolled factorisation's layout - columns
    live on the LEADING axis so the fori_loop factor body only ever indexes
    the untiled dimension dynamically; see admm_pallas._admm_chol_kernel).
    Same 2n + 1 ops; the two sweeps' index patterns swap: the forward sweep
    reads leading-axis columns, the backward sweep reads static middle-axis
    slices (rows of Lh = columns of Lh^T)."""
    acc = rhs
    for i in range(n):
        acc = acc - lc_ref[i] * acc[i : i + 1, :]
    acc = acc * dinv_ref[:]
    for i in reversed(range(n)):
        acc = acc - lc_ref[:, i, :] * acc[i : i + 1, :]
    return acc
