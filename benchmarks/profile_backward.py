"""Backward (QCQP KKT adjoint) roofline: op-count budget vs measured time.

The forward kernel is defended down to an op-count cost model (DESIGN.md
section 7: one (rows, tile) VPU op ~ 25 ns, ~half fixed overhead); this
script gives the fused backward (kernels/qcqp_bwd_pallas.py) the same
treatment - VERDICT r4 weak-item 2:

  * a static per-phase op count obtained by mirroring the kernel's loop
    structure (every (rows, tile) elementwise/reduce/store op counts 1,
    matching the forward model's granularity);
  * the predicted floor  ops * n_tiles * 25 ns  next to the measured
    kernel time (differenced on-device loop, CLAUDE.md protocol);
  * the full backward pass split: fused kernel vs XLA-side grad assembly
    (grad_P outer product, E1/E2 chain) via profile_layout-style timings.

Run: python -u benchmarks/profile_backward.py            (flagship shape)
     python -u benchmarks/profile_backward.py 8 16       (other nc values)
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import jax
import jax.numpy as jnp

from benchmarks.profile_layout import dtime

OP_NS = 25.0  # measured per-(rows, tile) VPU op cost, DESIGN.md section 7


def op_budget(n: int, nc: int, nc_pad: int) -> dict:
    """Mirror _qcqp_bwd_fused_kernel's loops, counting (rows, tile) ops."""
    phases = {}
    phases["plq (P l + q)"] = n
    phases["dual recovery + masks"] = 14
    # Cholesky of D: per column j: s_col build (2), j inner FMAs, d/rsqrt/
    # mask/store (4)
    phases["Cholesky of D"] = sum(j + 6 for j in range(n))
    phases["chol_to_unit"] = 4 * n
    # solves: g (2n+1); C column c: col build (2) + sweeps 2n - c + 1
    phases["D^-1 [g | C] sweeps"] = (2 * n + 1) + sum(
        2 + 2 * n - c + 1 for c in range(nc)
    )
    phases["M assembly"] = 6 * nc + (nc_pad - nc) + 2
    # Householder QR on the nc x nc block: per k ~7 + 3 per trailing column
    phases["QR of M"] = sum(7 + 3 * (nc - k - 1) for k in range(nc))
    phases["back-substitution"] = 5 * nc
    phases["dl assembly"] = nc + 1
    return phases


def main():
    from diffqcqp_tpu.kernels.layout import LANES, round_up, vmem_tile_b
    from diffqcqp_tpu.kernels.qcqp_bwd_pallas import qcqp_kkt_bwd_fused

    assert jax.default_backend() == "tpu", jax.default_backend()
    ncs = [int(a) for a in sys.argv[1:]] or [12]
    B = 4096
    for nc in ncs:
        n = 2 * nc
        n_pad = round_up(n, 8)
        nc_pad = round_up(nc, 8)
        tb = vmem_tile_b(n_pad, min(512, round_up(B, LANES)), matrix_bufs=4.0)
        n_tiles = round_up(B, tb) // tb

        rng = np.random.default_rng(0)
        s = rng.standard_normal((B, n, n)).astype(np.float32) / np.sqrt(n)
        P = jnp.asarray(s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
        q = jnp.asarray((rng.standard_normal((B, n)) * 0.5).astype(np.float32))
        l_n = (rng.random((B, nc)) * 0.5 + 0.05).astype(np.float32)
        mu = (rng.random((B, nc)) * 0.5 + 0.05).astype(np.float32)
        radius = jnp.asarray(l_n * mu)

        from diffqcqp_tpu import QCQP_DEFAULTS, solve_qcqp
        cfg = QCQP_DEFAULTS.replace(eps=1e-7, max_iter=400,
                                    rho0_scale=2.0, rho_update_period=24)
        l = solve_qcqp(P, q, jnp.asarray(l_n), jnp.asarray(mu), config=cfg)
        g = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

        budget = op_budget(n_pad, nc, nc_pad)
        total_ops = sum(budget.values())
        pred_ms = total_ops * n_tiles * OP_NS * 1e-6

        print(f"\n== nc={nc} (n={n}, n_pad={n_pad}, nc_pad={nc_pad}, "
              f"tile_b={tb}, tiles={n_tiles}) ==")
        print(f"{'phase':28s} {'ops':>6s} {'pred ms':>9s}")
        for k, v in budget.items():
            print(f"{k:28s} {v:6d} {v * n_tiles * OP_NS * 1e-6:9.3f}")
        print(f"{'TOTAL (25 ns/op model)':28s} {total_ops:6d} {pred_ms:9.3f}")

        def bwd_kernel(k, P, q, l, g, radius):
            return qcqp_kkt_bwd_fused(
                P, q + 1e-6 * k, l, g, radius,
                eps=1e-10, act_eps=1e-10,
            )

        t_kernel = dtime(bwd_kernel, (P, q, l, g, radius), reps=30,
                         label=f"fused bwd kernel nc={nc}")

        # full backward pass (kernel + XLA grad assembly) via custom_vjp
        def full_bwd(k, P, q, l_n_, mu_):
            def loss(P, q, l_n_, mu_):
                ll = solve_qcqp(P, q + 1e-6 * k, l_n_, mu_, config=cfg)
                return jnp.sum(ll * ll)
            return jax.grad(loss, argnums=(0, 1, 2, 3))(P, q, l_n_, mu_)

        def fwd_only(k, P, q, l_n_, mu_):
            return solve_qcqp(P, q + 1e-6 * k, l_n_, mu_, config=cfg)

        t_fwd = dtime(fwd_only, (P, q, jnp.asarray(l_n), jnp.asarray(mu)),
                      reps=12, label=f"forward solve nc={nc}")
        t_full = dtime(full_bwd, (P, q, jnp.asarray(l_n), jnp.asarray(mu)),
                       reps=12, label=f"fwd+bwd step nc={nc}")
        print(f"  backward total (step - fwd): {(t_full - t_fwd) * 1e3:7.3f} ms"
              f"  [kernel {t_kernel * 1e3:.3f} ms, assembly "
              f"{(t_full - t_fwd - t_kernel) * 1e3:.3f} ms]")
        print(f"  kernel vs op-model floor: {t_kernel * 1e3:.3f} / "
              f"{pred_ms:.3f} ms = {t_kernel * 1e3 / pred_ms:.2f}x")


if __name__ == "__main__":
    main()
