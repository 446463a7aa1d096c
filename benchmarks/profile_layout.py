"""On-device cost split of the flagship QCQP fwd+bwd step (perf lever #1).

Times, at the flagship shape (B=4096, N=24, f32, TPU):
  * the full value_and_grad step (the bench number),
  * the forward solve alone,
  * candidate formulations of the P relayout into the kernel's (n, n, B)
    struct-of-arrays layout (the measured ~1.65 ms round-1 setup cost),
  * the fused backward kernel alone,
  * the grad_P outer-product assembly alone.

Methodology (CLAUDE.md "Environment gotchas"): the chip sits behind an RPC
tunnel, so per-dispatch host timing lies. Every measurement is an on-device
``lax.fori_loop`` whose body depends on the loop index (no CSE/hoisting),
followed by a scalar readback; the one-dispatch overhead is removed by
differencing a reps=R loop against a reps=1 loop. Run on an idle host.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import jax
import jax.numpy as jnp


def _problems(b=4096, nc=12, dtype=np.float32, seed=0):
    n = 2 * nc
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((b, n, n)).astype(dtype) / np.sqrt(n)
    P = s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=dtype)
    q = (rng.standard_normal((b, n)) * 0.5).astype(dtype)
    l_n = (rng.random((b, nc)) * 0.5 + 0.05).astype(dtype)
    mu = (rng.random((b, nc)) * 0.5 + 0.05).astype(dtype)
    return jnp.asarray(P), jnp.asarray(q), jnp.asarray(l_n), jnp.asarray(mu)


def dtime(fn, args, reps=30, label=""):
    """fn(k, *args) -> pytree; returns seconds per call (on-device loop)."""

    def probe(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.asarray(x).ravel()[0].astype(jnp.float32) for x in leaves)

    def make(r):
        @jax.jit
        def loop(*a):
            def body(k, acc):
                return acc + probe(fn(k, *a))
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        return loop

    big, one = make(reps), make(1)
    _ = float(big(*args)); _ = float(one(*args))         # compile + warm
    t0 = time.perf_counter(); _ = float(big(*args)); tb = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(one(*args)); t1 = time.perf_counter() - t0
    dt = max(tb - t1, 1e-9) / (reps - 1)
    print(f"{label:42s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    from diffqcqp_tpu import QCQP_DEFAULTS, solve_qcqp
    from diffqcqp_tpu.kernels.qcqp_bwd_pallas import qcqp_kkt_bwd_fused

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = QCQP_DEFAULTS.replace(
        eps=1e-7, max_iter=400, rho0_scale=3.0, power_iters=20
    )
    P, q, l_n, mu = _problems()
    B, n = q.shape
    nc = n // 2
    perm = np.concatenate([np.arange(nc) * 2, np.arange(nc) * 2 + 1])
    results = {}

    def loss(P, q, l_n, mu):
        l = solve_qcqp(P, q, l_n, mu, config=cfg)
        return jnp.sum(l * l)

    results["full_fwd_bwd"] = dtime(
        lambda k, P, q, l_n, mu: jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            P, q + 1e-5 * k, l_n, mu
        ),
        (P, q, l_n, mu), label="full value_and_grad step",
    )
    results["fwd_only"] = dtime(
        lambda k, P, q, l_n, mu: solve_qcqp(P, q + 1e-5 * k, l_n, mu, config=cfg),
        (P, q, l_n, mu), label="forward solve only",
    )

    # ---- P relayout variants: (B, n, n) -> (n, n, B) with contact perm
    def chain_current(k, P):
        Pk = (P + k * 1e-9)[:, perm][:, :, perm]
        return jnp.transpose(Pk, (1, 2, 0))

    def chain_transpose_first(k, P):
        Pt = jnp.transpose(P + k * 1e-9, (1, 2, 0))
        return Pt[perm][:, perm]

    def chain_2d_reshape(k, P):
        Pp = (P + k * 1e-9)[:, perm][:, :, perm]
        return Pp.reshape(B, n * n).T.reshape(n, n, B)

    def chain_2d_transpose_first(k, P):
        Pt = (P + k * 1e-9).reshape(B, n * n).T.reshape(n, n, B)
        return Pt[perm][:, perm]

    def perm_only(k, P):
        return (P + k * 1e-9)[:, perm][:, :, perm]

    def transpose_only(k, P):
        return jnp.transpose(P + k * 1e-9, (1, 2, 0))

    results["relayout_current"] = dtime(chain_current, (P,), label="relayout: perm then transpose (current)")
    results["relayout_tfirst"] = dtime(chain_transpose_first, (P,), label="relayout: transpose then major-dim perm")
    results["relayout_2d"] = dtime(chain_2d_reshape, (P,), label="relayout: perm then 2D-reshape transpose")
    results["relayout_2d_tfirst"] = dtime(chain_2d_transpose_first, (P,), label="relayout: 2D transpose then major perm")
    results["perm_only"] = dtime(perm_only, (P,), label="perm gathers only")
    results["transpose_only"] = dtime(transpose_only, (P,), label="(1,2,0) transpose only")

    # ---- vector relayout (q, ws, radius, outputs)
    results["vec_relayout"] = dtime(
        lambda k, q: (q + k * 1e-9)[:, perm].T, (q,), label="vector (B,n) perm + T"
    )

    # ---- backward kernel alone (inputs precomputed in reference layout)
    l = jax.jit(lambda *a: solve_qcqp(*a, config=cfg))(P, q, l_n, mu)
    g = jnp.ones_like(l)
    radius = l_n * mu
    results["bwd_kernel"] = dtime(
        lambda k, P, q, l, g, r: qcqp_kkt_bwd_fused(
            P, q + k * 1e-9, l, g, r, eps=cfg.eps, act_eps=cfg.act_eps
        ),
        (P, q, l, g, radius), label="fused bwd kernel (incl. its relayout)",
    )

    # ---- grad_P assembly alone
    def gradp(k, dl, l):
        dlk = dl + k * 1e-9
        return -0.5 * (dlk[:, :, None] * l[:, None, :] + l[:, :, None] * dlk[:, None, :])

    results["grad_P_assembly"] = dtime(gradp, (g, l), label="grad_P symmetrised outer product")

    print(json.dumps({k: round(v * 1e3, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
