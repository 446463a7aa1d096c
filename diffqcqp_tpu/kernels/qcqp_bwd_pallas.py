"""Fused QCQP backward (KKT adjoint) kernel: Schur complement in VMEM.

The generic backward assembles the (nc+n)x(nc+n) transposed KKT system in XLA
and solves it with the Householder-QR kernel (qr_solve_pallas.py). For the
QCQP that is wasteful: the system has 2x2 block structure with an SPD (2,2)
block, so a Schur-complement reduction solves it with one n x n CHOLESKY (6x
fewer FLOPs than QR at m = nc+n = 1.5n) plus an nc x nc system - and doing it
inside one kernel removes the (B, m, m) assembly arrays and their HBM round
trips entirely.

Math. Unknowns (dgamma (nc), dl (n)); the transposed system is
    [[Sigma, C^T], [B^T, D]] (dgamma, dl) = (0, g)
with Sigma = diag(s*am + (1-am)), C (n, nc) masked columns 2 l_(i),
B^T = C diag(gamma*am), D = P + blockdiag(2 gamma_i I_2) SPD. Eliminating dl:
    dl = D^{-1}(g - C diag(gamma*am) dgamma)
    (Sigma - C^T D^{-1} C diag(gamma*am)) dgamma = -C^T D^{-1} g
so: factor D once (in-VMEM Cholesky), solve the nc+1 right-hand sides
[g | C], form the nc x nc matrix M and solve it by the same unrolled
Householder-QR used in qr_solve_pallas (M is small and unsymmetric).
Inactive contacts have zero C-columns and unit Sigma, so their dgamma rows
decouple to exact zeros - same fixed-shape masking as diff/kkt.py.

Layout identical to the forward kernel (admm_pallas.py): problems on lanes,
coordinates on sublanes; the QCQP coordinate permutation (contact i owns
rows (i, nc+i)) makes per-contact gathers pure row slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import LANES as _LANES
from .layout import pack_P, pack_vec, qcqp_perm, unpack_vec, vmem_tile_b
from .layout import round_up as _round_up
from .ldl import chol_to_unit, ldl_solve


def _qcqp_bwd_kernel(
    p_ref, l_ref, g_ref, gam_ref, s_ref, am_ref,
    dgamma_out, dl_out,
    lc_ref, dinv_ref, w_ref, m_ref,
    *, n: int, nc: int, nc_pad: int,
):
    """Per-lane Schur-complement KKT adjoint solve.

    Shapes (sublanes x lanes): p (n, n, tb); l, g, dl (n, tb);
    gam, s, am, dgamma (nc_pad, tb). Scratch: lc (n, n, tb) Cholesky of D,
    w (n, nc_pad+8, tb) solves of [g | C], m (nc_pad, nc_pad, tb).
    Coordinates are in PERMUTED order: contact c owns rows (c, nc + c).
    """
    f32 = jnp.float32
    tiny = f32(1e-30)

    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_c = jax.lax.broadcasted_iota(jnp.int32, (nc_pad, 1), 0)

    gam_raw = gam_ref[:]                  # recovered duals (their own mask)
    am = am_ref[:]
    gam = gam_raw * am                    # strict-complementarity masked
    l = l_ref[:]
    g = g_ref[:]
    _schur_core(
        p_ref, l, g, gam_raw, gam, am, s_ref[:],
        dgamma_out, dl_out, lc_ref, dinv_ref, w_ref, m_ref,
        row_n=row_n, row_c=row_c, n=n, nc=nc, nc_pad=nc_pad,
    )


def _schur_core(
    p_ref, l, g, gam_raw, gam, am, sigma_s,
    dgamma_out, dl_out, lc_ref, dinv_ref, w_ref, m_ref,
    *, row_n, row_c, n: int, nc: int, nc_pad: int,
):
    f32 = jnp.float32
    tiny = f32(1e-30)

    # D's shift uses the RAW recovered gamma (diff/kkt.py::qcqp_vjp builds
    # D = P + blockdiag(2 gamma I_2) from duals.gamma, which carries only the
    # dual-recovery activity mask - not the strict-complementarity mask am
    # that gates the B/C blocks). Rows (c) and (nc + c) get gamma_c in the
    # permuted order; padded coordinate rows (>= 2nc) get 0.
    if n > 2 * nc:
        pad_rows = jnp.zeros((n - 2 * nc, gam_raw.shape[-1]), f32)
        gam_coord = jnp.concatenate(
            [gam_raw[:nc, :], gam_raw[:nc, :], pad_rows], axis=0
        )
    else:
        gam_coord = jnp.concatenate([gam_raw[:nc, :], gam_raw[:nc, :]], axis=0)

    # ---- Cholesky of D = P + diag(2 gamma_coord) (pads carry P's identity),
    # converted to the zero-diag LDL^T form (kernels/ldl.py): each of the
    # nc + 1 solve sweeps below is then one broadcast-FMA per row - no
    # per-row divides, no concatenate reassembly.
    for j in range(n):
        ej = (row_n == j).astype(f32)
        s_col = p_ref[:, j, :] + ej * (2.0 * gam_coord[j : j + 1, :])
        for k in range(j):
            colk = lc_ref[:, k, :]
            s_col = s_col - colk * colk[j : j + 1, :]
        d = jnp.maximum(s_col[j : j + 1, :], tiny)
        col = s_col * jax.lax.rsqrt(d)
        lc_ref[:, j, :] = col * (row_n >= j).astype(f32)
    chol_to_unit(lc_ref, dinv_ref, n, row_n)

    def chol_solve(rhs, start=0):
        """(L L^T)^{-1} rhs, rhs (n, tb), rhs rows < start known zero.

        The forward sweep starts at ``start`` - the C columns (first
        nonzero at row c) skip an average of nc/2 rows each. (A multi-RHS
        variant sweeping the whole (n, nc+1, tb) w_ref block at once -
        one pair of triangular sweeps for all right-hand sides, 3-D
        ref-slice read-modify-write along the leading axis - was tried
        on-chip: numerically equivalent within f32 conditioning but NO
        faster than per-column row-by-row sweeps; the zero-diag LDL^T
        sweeps used here halve the op count on top.)
        """
        return ldl_solve(lc_ref, dinv_ref, rhs, n, start=start)

    # ---- W = D^{-1} [g | C]; C column c = 2 l at rows (c, nc+c), masked.
    w_ref[:, 0, :] = chol_solve(g)
    for c in range(nc):
        ec = ((row_n == c) | (row_n == nc + c)).astype(f32)
        col = 2.0 * l * ec * am[c : c + 1, :]
        w_ref[:, 1 + c, :] = chol_solve(col, start=c)

    # ---- M = Sigma - C^T W_C diag(gam); y = -C^T W_g   (per lane, nc x nc)
    # C^T z for contact r: 2 (l_r z_r + l_{nc+r} z_{nc+r}) * am_r.
    def ct_dot(z):
        """(n, tb) -> (nc_pad, tb): per-contact C^T z (masked)."""
        vals = 2.0 * (
            l[:nc, :] * z[:nc, :] + l[nc : 2 * nc, :] * z[nc : 2 * nc, :]
        )
        out = vals * am[:nc, :]
        if nc_pad > nc:
            out = jnp.concatenate(
                [out, jnp.zeros((nc_pad - nc, z.shape[-1]), f32)], axis=0
            )
        return out

    y = -ct_dot(w_ref[:, 0, :])                                   # (nc_pad, tb)
    sigma = sigma_s * am + (1.0 - am)                             # (nc_pad, tb)
    for c in range(nc):
        ctwc = ct_dot(w_ref[:, 1 + c, :])                          # (nc_pad, tb)
        ec = (row_c == c).astype(f32)
        m_ref[:, c, :] = sigma * ec - ctwc * gam[c : c + 1, :]
    for c in range(nc, nc_pad):
        m_ref[:, c, :] = (row_c == c).astype(f32) + sigma * 0.0

    # ---- solve M dgamma = y by unrolled Householder QR. Only the leading
    # nc x nc block is nontrivial: columns/rows >= nc of the padded system
    # are exact identity (ct_dot zero-pads, sigma rows >= nc are 1, y rows
    # >= nc are 0), every reflection vector for k < nc has support in rows
    # < nc, and the padded solution entries are 0 - so the k/j loops run
    # to nc, not nc_pad (saves ~(nc_pad^2 - nc^2) column ops).
    b = y
    for k in range(nc):
        below = (row_c >= k).astype(f32)
        col = m_ref[:, k, :] * below
        akk = col[k : k + 1, :]
        nrm = jnp.sqrt(jnp.sum(col * col, axis=0, keepdims=True))
        sgn = jnp.where(akk < 0.0, f32(-1.0), f32(1.0))
        alpha = -sgn * nrm
        ek = (row_c == k).astype(f32)
        v = col - alpha * ek
        vsq = jnp.sum(v * v, axis=0, keepdims=True)
        beta = jnp.where(vsq > tiny, f32(2.0) / jnp.maximum(vsq, tiny), f32(0.0))
        m_ref[:, k, :] = alpha * ek + m_ref[:, k, :] * (row_c < k).astype(f32)
        for j in range(k + 1, nc):
            cj = m_ref[:, j, :]
            wj = jnp.sum(v * cj, axis=0, keepdims=True)
            m_ref[:, j, :] = cj - (beta * wj) * v
        wb = jnp.sum(b * v, axis=0, keepdims=True)
        b = b - (beta * wb) * v
    dgam = b * 0.0
    for k in reversed(range(nc)):
        rrow = m_ref[k]
        upper = (row_c > k).astype(f32)
        dot = jnp.sum(rrow * dgam * upper, axis=0, keepdims=True)
        diag = rrow[k : k + 1, :]
        safe = jnp.where(jnp.abs(diag) > tiny, diag, tiny)
        xk = (b[k : k + 1, :] - dot) / safe
        dgam = dgam + xk * (row_c == k).astype(f32)
    dgam = dgam * am

    # ---- dl = W_g - W_C (gam * dgamma)
    dl = w_ref[:, 0, :]
    for c in range(nc):
        dl = dl - w_ref[:, 1 + c, :] * (gam[c : c + 1, :] * dgam[c : c + 1, :])

    dgamma_out[:] = dgam
    dl_out[:] = dl


def _qcqp_bwd_fused_kernel(
    p_ref, q_ref, l_ref, g_ref, r_ref,
    dgamma_out, dl_out, gamma_out,
    lc_ref, dinv_ref, w_ref, m_ref,
    *, n: int, nc: int, nc_pad: int,
    eps: float, act_eps: float, stall_ulps: float,
):
    """Dual recovery (Solver.cpp:584-617, closed form per contact) FUSED
    with the Schur-complement adjoint solve - P and l are already in VMEM,
    so Pl+q costs n column FMAs and the whole QCQP backward is one kernel.
    """
    f32 = jnp.float32
    tiny = f32(1e-30)
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_c = jax.lax.broadcasted_iota(jnp.int32, (nc_pad, 1), 0)

    l = l_ref[:]
    g = g_ref[:]
    r = r_ref[:]                                   # (nc_pad, tb) radii

    # plq = P l + q (column FMAs against the VMEM-resident P)
    plq = q_ref[:]
    for k in range(n):
        plq = plq + p_ref[:, k, :] * l[k : k + 1, :]

    # per-contact quantities (permuted layout: contact c owns rows c, nc+c)
    la, lb = l[:nc, :], l[nc : 2 * nc, :]
    pa, pb = plq[:nc, :], plq[nc : 2 * nc, :]
    sq = la * la + lb * lb                         # ||l_(c)||^2, (nc, tb)
    nrm = jnp.sqrt(sq)
    rr = r[:nc, :]
    # dual recovery: active iff slack <= eps and r >= eps (Solver.cpp:597)
    act_rec = ((rr - nrm <= f32(eps)) & (rr >= f32(eps))).astype(f32)
    # max(num, 0): dual-feasibility projection (gamma >= 0 at any KKT
    # point; a negative estimate is recovery noise that can make D
    # indefinite) - mirrors diff/kkt.py::qcqp_dual.
    num = jnp.maximum(-2.0 * (la * pa + lb * pb), 0.0)
    gam_raw_c = act_rec * num / jnp.maximum(4.0 * sq, tiny)
    # strict-complementarity mask (diff/kkt.py::qcqp_strict_active)
    s_c = sq - rr * rr
    s_tol = jnp.maximum(f32(act_eps), f32(stall_ulps) * (sq + rr * rr))
    am_c = (
        (s_c > -s_tol)
        & (rr > f32(act_eps))
        & (gam_raw_c > f32(act_eps))
    ).astype(f32)

    def pad_c(x):
        if nc_pad > nc:
            return jnp.concatenate(
                [x, jnp.zeros((nc_pad - nc, x.shape[-1]), f32)], axis=0
            )
        return x

    gam_raw = pad_c(gam_raw_c)
    am = pad_c(am_c)
    gam = gam_raw * am
    sigma_s = pad_c(s_c)

    gamma_out[:] = gam_raw
    _schur_core(
        p_ref, l, g, gam_raw, gam, am, sigma_s,
        dgamma_out, dl_out, lc_ref, dinv_ref, w_ref, m_ref,
        row_n=row_n, row_c=row_c, n=n, nc=nc, nc_pad=nc_pad,
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act_eps", "stall_ulps", "tile_b", "interpret"),
)
def qcqp_kkt_bwd_fused(
    P: Array,          # (B, n, n) in REFERENCE coordinate order
    q: Array,          # (B, n)
    l: Array,          # (B, n)
    g: Array,          # (B, n) upstream cotangent
    radius: Array,     # (B, nc) = l_n * mu
    eps: float,
    act_eps: float,
    stall_ulps: float = 8.0 * 1.1920929e-7,
    tile_b: int = 512,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """One-kernel QCQP backward: dual recovery + Schur KKT adjoint.
    Returns (dgamma (B, nc), dl (B, n), gamma (B, nc)). Off-TPU the kernel
    runs in interpret mode (Mosaic only lowers for TPU)."""
    interpret = interpret or jax.default_backend() != "tpu"
    B, n = l.shape
    nc = radius.shape[-1]
    f32 = jnp.float32
    orig = l.dtype

    perm, inv = qcqp_perm(n)

    n_pad = _round_up(n, 8)
    nc_pad = _round_up(nc, 8)
    # VMEM residents: P block (double-buffered input) + lc scratch +
    # w (n, nc_pad+8, tb) + m (nc_pad^2, tb) -> ~4 matrix-equivalents.
    tb = vmem_tile_b(
        n_pad, min(tile_b, _round_up(B, _LANES)), matrix_bufs=4.0
    )
    Bp = _round_up(B, tb)

    P_k = pack_P(P, n_pad, Bp, perm=perm)

    def vec_n(x):
        return pack_vec(x[:, perm], n_pad, Bp)

    def vec_c(x):
        return pack_vec(x, nc_pad, Bp)

    grid = (Bp // tb,)
    nvec = pl.BlockSpec((n_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((nc_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((n_pad, n_pad, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _qcqp_bwd_fused_kernel, n=n_pad, nc=nc, nc_pad=nc_pad,
        eps=float(eps), act_eps=float(act_eps), stall_ulps=float(stall_ulps),
    )
    dgam_k, dl_k, gamma_k = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat, nvec, nvec, nvec, cvec],
        out_specs=(cvec, nvec, cvec),
        out_shape=(
            jax.ShapeDtypeStruct((nc_pad, Bp), f32),
            jax.ShapeDtypeStruct((n_pad, Bp), f32),
            jax.ShapeDtypeStruct((nc_pad, Bp), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, tb), f32),
            pltpu.VMEM((n_pad, tb), f32),
            pltpu.VMEM((n_pad, nc_pad + 8, tb), f32),
            pltpu.VMEM((nc_pad, nc_pad, tb), f32),
        ],
        interpret=interpret,
    )(P_k, vec_n(q), vec_n(l), vec_n(g), vec_c(radius))

    dgamma = unpack_vec(dgam_k, B, nc).astype(orig)
    dl = unpack_vec(dl_k, B, n, inv=inv).astype(orig)
    gamma = unpack_vec(gamma_k, B, nc).astype(orig)
    return dgamma, dl, gamma


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def qcqp_kkt_bwd_pallas(
    P: Array,          # (B, n, n) in REFERENCE coordinate order
    l: Array,          # (B, n)
    g: Array,          # (B, n) upstream cotangent
    gamma: Array,      # (B, nc)
    s: Array,          # (B, nc) squared slacks
    active: Array,     # (B, nc) strict-complementarity mask (bool)
    tile_b: int = 256,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Returns (dgamma (B, nc), dl (B, n)), matching diff/kkt.py::qcqp_vjp's
    linear solve exactly (same masking semantics). float32 compute. Off-TPU
    the kernel runs in interpret mode (Mosaic only lowers for TPU)."""
    interpret = interpret or jax.default_backend() != "tpu"
    B, n = l.shape
    nc = gamma.shape[-1]
    f32 = jnp.float32
    orig = l.dtype

    # permute coordinates: reference (2i, 2i+1) -> kernel (i, nc+i)
    perm, inv = qcqp_perm(n)

    n_pad = _round_up(n, 8)
    nc_pad = _round_up(nc, 8)
    tb = vmem_tile_b(
        n_pad, min(tile_b, _round_up(B, _LANES)), matrix_bufs=4.0
    )
    Bp = _round_up(B, tb)

    P_k = pack_P(P, n_pad, Bp, perm=perm)

    def vec_n(x):
        return pack_vec(x[:, perm], n_pad, Bp)

    def vec_c(x):
        return pack_vec(x, nc_pad, Bp)

    grid = (Bp // tb,)
    nvec = pl.BlockSpec((n_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((nc_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((n_pad, n_pad, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _qcqp_bwd_kernel, n=n_pad, nc=nc, nc_pad=nc_pad
    )
    dgam_k, dl_k = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat, nvec, nvec, cvec, cvec, cvec],
        out_specs=(cvec, nvec),
        out_shape=(
            jax.ShapeDtypeStruct((nc_pad, Bp), f32),
            jax.ShapeDtypeStruct((n_pad, Bp), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, tb), f32),
            pltpu.VMEM((n_pad, tb), f32),
            pltpu.VMEM((n_pad, nc_pad + 8, tb), f32),
            pltpu.VMEM((nc_pad, nc_pad, tb), f32),
        ],
        interpret=interpret,
    )(P_k, vec_n(l), vec_n(g), vec_c(gamma), vec_c(s), vec_c(active.astype(f32)))

    dgamma = unpack_vec(dgam_k, B, nc).astype(orig)
    dl = unpack_vec(dl_k, B, n, inv=inv).astype(orig)
    return dgamma, dl
