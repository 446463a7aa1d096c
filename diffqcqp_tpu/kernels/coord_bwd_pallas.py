"""Fused backward (KKT adjoint) kernel for the coordinate-wise-constrained
QP family: non-negative, box, and signed-box.

The generic backward assembles a (B, m, m) saddle system in HBM (m = n for
QP via the masked SPD reduction, 3n for box, 4n for signed box) and solves
it with the Householder-QR kernel. For THESE problem classes that is
wasteful twice over: every constraint touches exactly ONE coordinate
(selector rows +-e_i, reference Solver.cpp:148-177, :292-301, :480-495), so
the differentiated KKT system decouples analytically:

  * a strict-active constraint on coordinate i forces dl_i = 0
    (the top block rows read (J^T dl)_slot = 0 with J^T rows +-e_i);
  * the free coordinates solve the SPD system  P_FF^T dl_F = g_F
    - one masked in-VMEM Cholesky (~6x fewer FLOPs than QR at m = 3n);
  * the active rows then give each slot's multiplier adjoint in closed form:
    (P dl)_i + coeff_slot * dgamma_slot = g_i  with coeff the slot's
    B-block entry (-gamma_lo | +gamma_hi | sign(v)*gamma_sg).

Dual recovery (the reference's dualFromPrimal* least squares, closed-form
here because selector rows have disjoint support - see diff/kkt.py) is
fused in: P and l are already in VMEM, so Pl+q is n column FMAs and the
whole backward for the QP family is ONE kernel, like the QCQP's
(qcqp_bwd_pallas.py). Parity oracle: the generic fixed-shape systems in
diff/kkt.py (tests/test_coord_bwd_kernel.py).

When several constraints are strictly active on one coordinate (e.g.
l_min = l_max), the generic LU system is singular (the reference's compacted
system too); here the residual splits across the active slots in the
minimal-norm sense - a documented, strictly-better-behaved divergence on a
measure-zero set.

Layout identical to the forward kernel: problems on lanes, coordinates on
sublanes, reference coordinate order (no permutation - these prox families
are coordinate-wise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import LANES, pack_P, pack_vec, round_up, vmem_tile_b
from .ldl import chol_to_unit, ldl_solve

KIND_QP = 0
KIND_BOX = 1
KIND_SIGNED_BOX = 2


def _coord_bwd_kernel(
    p_ref, q_ref, l_ref, g_ref, lo_ref, hi_ref, vs_ref,
    # outputs (subset by kind; see wrapper)
    *refs,
    n: int, kind: int, eps: float, act_eps: float,
):
    """Per-lane fused dual recovery + decoupled KKT adjoint.

    Shapes (sublanes x lanes): p (n, n, tb); q, l, g, lo, hi, vs and all
    outputs (n, tb). Scratch lc (n, n, tb) holds the masked Cholesky.
    """
    if kind == KIND_QP:
        dl_out, lc_ref, dinv_ref = refs
    elif kind == KIND_BOX:
        dl_out, dglo_out, dghi_out, glo_out, ghi_out, lc_ref, dinv_ref = refs
    else:
        (dl_out, dglo_out, dghi_out, dgsg_out,
         glo_out, ghi_out, gsg_out, lc_ref, dinv_ref) = refs

    f32 = jnp.float32
    tiny = f32(1e-30)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    l = l_ref[:]
    g = g_ref[:]

    def matvec(x):
        acc = p_ref[:, 0, :] * x[0:1, :]
        for k in range(1, n):
            acc += p_ref[:, k, :] * x[k : k + 1, :]
        return acc

    plq = q_ref[:] + matvec(l)

    # ---- dual recovery + strict-complementarity masks (diff/kkt.py forms)
    if kind == KIND_QP:
        # reference convention gamma = -(Pl+q), zeroed where l > eps
        # (Solver.cpp:125-134); active iff gamma < -act_eps (:140).
        am = ((l <= f32(eps)) & (plq > f32(act_eps))).astype(f32)
    else:
        lo = lo_ref[:]
        hi = hi_ref[:]
        act_lo = ((l - lo) <= f32(eps)).astype(f32)
        act_hi = ((l - hi) >= f32(-eps)).astype(f32)
        rhs = -plq
        if kind == KIND_BOX:
            denom = jnp.maximum(act_lo + act_hi, f32(1.0))
            g_lo = -act_lo * rhs / denom
            g_hi = act_hi * rhs / denom
            am_lo = act_lo * (g_lo > f32(act_eps)).astype(f32)
            am_hi = act_hi * (g_hi > f32(act_eps)).astype(f32)
            am = jnp.minimum(am_lo + am_hi, f32(1.0))
        else:
            vs = vs_ref[:]
            act_sg = (vs * l >= f32(-eps)).astype(f32) * (vs * vs)
            denom = jnp.maximum(act_lo + act_hi + act_sg, f32(1.0))
            g_lo = -act_lo * rhs / denom
            g_hi = act_hi * rhs / denom
            g_sg = act_sg * vs * rhs / denom
            am_lo = act_lo * (g_lo > f32(act_eps)).astype(f32)
            am_hi = act_hi * (g_hi > f32(act_eps)).astype(f32)
            am_sg = act_sg * (g_sg > f32(act_eps)).astype(f32)
            am = jnp.minimum(am_lo + am_hi + am_sg, f32(1.0))
    fm = 1.0 - am

    # ---- masked SPD Cholesky: K = fm P fm + diag(am), converted to the
    # zero-diag LDL^T form (kernels/ldl.py) so each solve sweep row is one
    # broadcast-FMA.
    for j in range(n):
        ej = (row == j).astype(f32)
        fj = fm[j : j + 1, :]
        s_col = p_ref[:, j, :] * fm * fj + ej * am[j : j + 1, :]
        for k in range(j):
            colk = lc_ref[:, k, :]
            s_col = s_col - colk * colk[j : j + 1, :]
        d = jnp.maximum(s_col[j : j + 1, :], tiny)
        col = s_col * jax.lax.rsqrt(d)
        lc_ref[:, j, :] = col * (row >= j).astype(f32)
    chol_to_unit(lc_ref, dinv_ref, n, row)

    # ---- solve K x = g * fm; dl = x * fm
    dl = ldl_solve(lc_ref, dinv_ref, g * fm, n) * fm

    dl_out[:] = dl
    if kind == KIND_QP:
        return

    # ---- dgamma from the active rows: (P dl)_i + coeff * dgamma = g_i,
    # residual split minimal-norm across the slots active on coordinate i.
    resid = (g - matvec(dl)) * am
    if kind == KIND_BOX:
        c_lo = -g_lo * am_lo
        c_hi = g_hi * am_hi
        den = jnp.maximum(c_lo * c_lo + c_hi * c_hi, tiny)
        dglo_out[:] = c_lo * resid / den
        dghi_out[:] = c_hi * resid / den
        glo_out[:] = g_lo
        ghi_out[:] = g_hi
    else:
        c_lo = -g_lo * am_lo
        c_hi = g_hi * am_hi
        c_sg = vs * g_sg * am_sg
        den = jnp.maximum(c_lo * c_lo + c_hi * c_hi + c_sg * c_sg, tiny)
        dglo_out[:] = c_lo * resid / den
        dghi_out[:] = c_hi * resid / den
        dgsg_out[:] = c_sg * resid / den
        glo_out[:] = g_lo
        ghi_out[:] = g_hi
        gsg_out[:] = g_sg


@functools.partial(
    jax.jit,
    static_argnames=("kind", "eps", "act_eps", "tile_b", "interpret"),
)
def coord_kkt_bwd_fused(
    P: Array,              # (B, n, n)
    q: Array,              # (B, n)
    l: Array,              # (B, n)
    g: Array,              # (B, n) upstream cotangent
    l_min: Array | None,   # (B, n) | None for KIND_QP
    l_max: Array | None,
    v_sign: Array | None,  # (B, n) | None unless KIND_SIGNED_BOX
    kind: int,
    eps: float,
    act_eps: float,
    tile_b: int = 512,
    interpret: bool = False,
):
    """One-kernel QP-family backward: fused dual recovery + decoupled KKT
    adjoint solve.

    Returns (dl (B, n),) for KIND_QP;
    (dl, dgamma (B, 2n), gamma (B, 2n)) for KIND_BOX;
    (dl, dgamma (B, 3n), gamma (B, 3n)) for KIND_SIGNED_BOX,
    with gamma blocks ordered [lo | hi(| sign)] like diff/kkt.py.
    Off-TPU the kernel runs in interpret mode (Mosaic only lowers for TPU).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    B, n = l.shape
    f32 = jnp.float32
    orig = l.dtype

    n_pad = round_up(n, 8)
    tb = vmem_tile_b(n_pad, min(tile_b, round_up(B, LANES)))
    Bp = round_up(B, tb)

    P_k = pack_P(P, n_pad, Bp)
    vec = functools.partial(pack_vec, n_pad=n_pad, B_pad=Bp)
    zero = jnp.zeros((n_pad, Bp), f32)
    lo_k = zero if l_min is None else vec(l_min, fill=-1.0)
    hi_k = zero if l_max is None else vec(l_max, fill=1.0)
    vs_k = zero if v_sign is None else vec(v_sign)

    grid = (Bp // tb,)
    nvec = pl.BlockSpec((n_pad, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec(
        (n_pad, n_pad, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    n_out = {KIND_QP: 1, KIND_BOX: 5, KIND_SIGNED_BOX: 7}[kind]

    kernel = functools.partial(
        _coord_bwd_kernel, n=n_pad, kind=kind,
        eps=float(eps), act_eps=float(act_eps),
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat] + [nvec] * 6,
        out_specs=tuple([nvec] * n_out),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, Bp), f32) for _ in range(n_out)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, tb), f32),
            pltpu.VMEM((n_pad, tb), f32),
        ],
        interpret=interpret,
    )(P_k, vec(q), vec(l), vec(g), lo_k, hi_k, vs_k)

    def un(x):
        return x.T[:B, :n].astype(orig)

    if kind == KIND_QP:
        return (un(outs[0]),)
    if kind == KIND_BOX:
        dl, dglo, dghi, glo, ghi = map(un, outs)
        return (
            dl,
            jnp.concatenate([dglo, dghi], axis=-1),
            jnp.concatenate([glo, ghi], axis=-1),
        )
    dl, dglo, dghi, dgsg, glo, ghi, gsg = map(un, outs)
    return (
        dl,
        jnp.concatenate([dglo, dghi, dgsg], axis=-1),
        jnp.concatenate([glo, ghi, gsg], axis=-1),
    )
