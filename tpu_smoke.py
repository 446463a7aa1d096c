"""On-TPU smoke/verification: solve + KKT residuals + FD-vs-analytic
gradient check, in float32, on the real chip. Prints one JSON line and
exits nonzero on failure - makes DESIGN.md's "f32 TPU gradients match
finite differences to 4-5 digits" claim reproducible in one command:

    python -u tpu_smoke.py

Covers all four problem classes. The KKT oracle is verify.py, run in TRUE
float64 on the host CPU backend (x64 is enabled below; on the TPU itself
astype(float64) would silently degrade to f32) against the float32
on-device solutions. Stationarity is asserted against the per-problem
ADMM optimality bound (verify.stationarity_bound) computed from each
problem's own SolveStats - the claim the stopping rule actually makes -
rather than fixed per-class tolerances. The FD check perturbs a scalar
loss through jax.value_and_grad exactly like a training step.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

enable_x64 = jax.enable_x64   # scoped x64 context (jax >= 0.7 spelling)

import diffqcqp_tpu as dq
from diffqcqp_tpu import verify

EPS = 1e-7
BOUND_MARGIN = 2.0   # slack on the exact-arithmetic stationarity bound


def _problems(b, n, seed=0):
    rng = np.random.default_rng(seed)
    S = (rng.standard_normal((b, n, n)) / np.sqrt(n)).astype(np.float32)
    P = jnp.asarray(S @ S.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32))
    q = jnp.asarray((rng.standard_normal((b, n)) * 0.5).astype(np.float32))
    return rng, P, q


def fd_check(loss, args, argnum, fd_eps=1e-3, k_coords=5):
    """MEDIAN central-FD-vs-autodiff relative error over the k largest
    analytic-gradient coordinates. A single coordinate can sit next to an
    active-set kink (the solution map is only piecewise smooth) where the
    central difference measures the genuine non-smoothness instead of a
    gradient error; the median over strongly-active coordinates is robust
    to such (expected, measure-zero) outliers."""
    g = np.array(jax.jit(jax.grad(loss, argnums=argnum))(*args))
    flat = g.ravel()
    order = np.argsort(-np.abs(flat))[:k_coords]
    jit_loss = jax.jit(loss)
    rels, pairs = [], []
    x = args[argnum]
    for k in order:
        idx = np.unravel_index(int(k), g.shape)
        ad = float(flat[int(k)])
        up = list(args); up[argnum] = x.at[idx].add(fd_eps)
        dn = list(args); dn[argnum] = x.at[idx].add(-fd_eps)
        fd = (float(jit_loss(*up)) - float(jit_loss(*dn))) / (2 * fd_eps)
        rels.append(abs(fd - ad) / max(abs(fd), abs(ad), 1e-3))
        pairs.append((fd, ad))
    med = int(np.argsort(rels)[len(rels) // 2])
    return float(np.median(rels)), pairs[med][0], pairs[med][1]


def main():
    backend = jax.default_backend()
    results = {"backend": backend, "device": str(jax.devices()[0])}
    failures = []
    cfg = dq.SolverConfig(eps=EPS, max_iter=2000)
    qcfg = dq.QCQP_DEFAULTS.replace(eps=EPS, max_iter=2000)
    b, n = 256, 12
    nc = n // 2

    rng, P, q = _problems(b, n)
    lo = jnp.asarray(-(rng.random((b, n)) * 0.4 + 0.05).astype(np.float32))
    hi = jnp.asarray((rng.random((b, n)) * 0.4 + 0.05).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    l_n = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))
    mu = jnp.asarray((rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32))

    # ---- solves (f32, on the default/TPU backend) + true-f64 KKT residuals
    # of those solutions, evaluated on the host CPU backend.
    Pn, qn, lon, hin, vn, lnn, mun = (
        np.asarray(jax.device_get(x), np.float64)
        for x in (P, q, lo, hi, v, l_n, mu)
    )
    # each class carries ITS OWN config so the stationarity bound below is
    # derived from the alpha/mu_prox the solve actually used (qcfg and cfg
    # only coincide today because QCQP_DEFAULTS tunes power_iters alone)
    sols = {
        "qp": (cfg, dq.solve_qp_with_stats(P, q, config=cfg),
               lambda l: verify.check_qp(Pn, qn, l)),
        "box": (cfg, dq.solve_box_qp_with_stats(P, q, lo, hi, config=cfg),
                lambda l: verify.check_box_qp(Pn, qn, lon, hin, l)),
        "signed_box": (
            cfg,
            dq.solve_signed_box_qp_with_stats(P, q, lo, hi, v, config=cfg),
            lambda l: verify.check_signed_box_qp(Pn, qn, lon, hin, vn, l)),
        "qcqp": (qcfg, dq.solve_qcqp_with_stats(P, q, l_n, mu, config=qcfg),
                 lambda l: verify.check_qcqp(Pn, qn, lnn, mun, l)),
    }
    # Primal feasibility is exact-ish (the projection is the solver's last
    # op); complementarity is O(f32 noise * scale) on the median problem.
    # Stationarity is NOT checked against a fixed tolerance: each problem is
    # checked against its OWN ADMM optimality bound from SolveStats
    # (verify.stationarity_bound) - e.g. the QP family's dual-only stopping
    # rule (Solver.cpp:88) leaves rho*res_prim uncontrolled by contract, and
    # the bound says exactly how much.
    tol_med = {"primal": 1e-6, "complementarity": 5e-4}
    tol_max = {"primal": 1e-5, "complementarity": 5e-2}
    # the oracle runs under scoped x64 on the host CPU backend: enabling
    # x64 globally breaks the f32 pallas-kernel trace, and astype(float64)
    # without it silently stays f32 (round-2 advisor finding).
    cpu = jax.devices("cpu")[0]
    gamma_oracle, sol_host = {}, {}
    for name, (ccfg, (l, stats), check) in sols.items():
        ln_host = np.asarray(jax.device_get(l))
        sol_host[name] = ln_host
        with enable_x64(), jax.default_device(cpu):
            r = check(ln_host)
            bound = np.asarray(verify.stationarity_bound(
                Pn, qn, ln_host, jax.device_get(stats),
                alpha=ccfg.alpha_relax, mu_prox=ccfg.mu_prox,
            ))
        gamma_oracle[name] = np.asarray(r.gamma)
        stat = np.array(r.stationarity)
        ratio = stat / (BOUND_MARGIN * bound)
        results[f"{name}_stationarity_median"] = float(np.median(stat))
        results[f"{name}_stationarity_max"] = float(np.max(stat))
        results[f"{name}_stat_over_bound_max"] = float(np.max(ratio))
        if not np.all(ratio < 1.0):
            k = int(np.argmax(ratio))
            failures.append(
                f"{name}.stationarity {stat[k]:.2e} > "
                f"{BOUND_MARGIN}x bound {bound[k]:.2e} (problem {k})"
            )
        for field in tol_med:
            vals = np.array(getattr(r, field))
            med, mx = float(np.median(vals)), float(np.max(vals))
            results[f"{name}_{field}_median"] = med
            results[f"{name}_{field}_max"] = mx
            if not med < tol_med[field]:
                failures.append(
                    f"{name}.{field} median={med:.2e} >= {tol_med[field]}"
                )
            if not mx < tol_max[field]:
                failures.append(f"{name}.{field} max={mx:.2e} >= {tol_max[field]}")

    # ---- public on-device dual recovery (duals.py, f32 on the solver
    # backend) vs the f64 least-squares oracle's multipliers: median
    # relative error over strongly-active slots (activity classification
    # near the boundary is legitimately f32-noisy; strong multipliers are
    # the physics-relevant ones).
    rec = {
        "qp": np.asarray(dq.recover_qp_duals(P, q, sol_host["qp"])),
        "box": np.concatenate(
            [np.asarray(x) for x in dq.recover_box_qp_duals(
                P, q, lo, hi, sol_host["box"]
            )], axis=-1,
        ),
        "signed_box": np.concatenate(
            [np.asarray(x) for x in dq.recover_signed_box_qp_duals(
                P, q, lo, hi, v, sol_host["signed_box"]
            )], axis=-1,
        ),
        "qcqp": np.asarray(
            dq.recover_qcqp_duals(P, q, l_n, mu, sol_host["qcqp"])
        ),
    }
    for name, g32 in rec.items():
        ref = gamma_oracle[name]
        strong = ref > max(1e-2, 10 * EPS)
        if not strong.any():
            failures.append(f"duals_{name}: no strong multiplier (vacuous)")
            continue
        rel = np.abs(g32[strong] - ref[strong]) / ref[strong]
        med = float(np.median(rel))
        results[f"duals_{name}_rel_median"] = med
        if not med < 1e-2:
            failures.append(f"duals_{name}: median rel err {med:.2e} >= 1e-2")

    # ---- large-N fused-kernel path: N=48 engages BOTH round-5 kernel
    # modes on real hardware (rolled factorisation + the single-buffered
    # HBM P slab, p_in_hbm - which interpret-mode CPU tests can never
    # execute); parity vs the pinned XLA engine is the check.
    if backend == "tpu":
        n48 = 48
        _, P48, q48 = _problems(512, n48, seed=3)   # B=512 -> 384-lane
        # tile via the single-buffered HBM P slab (forward_tile_plan(48,
        # 512) = (384, True)); smaller B would clamp the request below the
        # point where the HBM mode engages
        results["n48_auto_backend"] = dq.which_backend(P48, q48, cfg)
        if results["n48_auto_backend"] != "pallas":
            failures.append("N=48 did not auto-dispatch to the fused kernel")
        l_pal, st_pal = dq.solve_qp_with_stats(P48, q48, config=cfg)
        l_xla, st_xla = dq.solve_qp_with_stats(
            P48, q48, config=cfg.replace(backend="xla")
        )
        d48 = float(np.max(np.abs(np.asarray(l_pal) - np.asarray(l_xla))))
        results["n48_pallas_vs_xla_max_abs"] = d48
        if not bool(np.all(np.asarray(st_pal.converged))):
            failures.append("N=48 fused-kernel solve did not converge")
        # two INDEPENDENT trajectories each stopping at eps=1e-7: solution
        # agreement ~ exit stationarity / lmin ~ 1e-5 / 0.1 = 1e-4 on this
        # generator (measured 1.05e-4); a real kernel breakage is O(1)
        if not d48 < 5e-4:
            failures.append(f"N=48 pallas-vs-xla diff {d48:.2e} >= 5e-4")

    # ---- FD-vs-analytic gradient checks through value_and_grad on-device
    def loss_qp(P, q):
        return jnp.sum(dq.solve_qp(P, q, config=cfg) ** 2)

    def loss_qcqp(q, l_n, mu):
        return jnp.sum(dq.solve_qcqp(P, q, l_n, mu, config=qcfg) ** 2)

    def loss_box(q, lo, hi):
        return jnp.sum(dq.solve_box_qp(P, q, lo, hi, config=cfg) ** 2)

    checks = [
        ("fd_qp_P", loss_qp, (P, q), 0),
        ("fd_qp_q", loss_qp, (P, q), 1),
        ("fd_qcqp_q", loss_qcqp, (q, l_n, mu), 0),
        ("fd_qcqp_ln", loss_qcqp, (q, l_n, mu), 1),
        ("fd_qcqp_mu", loss_qcqp, (q, l_n, mu), 2),
        ("fd_box_lo", loss_box, (q, lo, hi), 1),
        ("fd_box_hi", loss_box, (q, lo, hi), 2),
    ]
    for name, loss, args, argnum in checks:
        rel, fd, ad = fd_check(loss, args, argnum)
        results[name + "_rel"] = rel
        if not rel < 1e-2:   # f32 FD at step 1e-3: ~2-3 matching digits floor
            failures.append(f"{name}: rel={rel:.2e} (fd={fd:.5g} ad={ad:.5g})")

    results["ok"] = not failures
    if failures:
        results["failures"] = failures
    print(json.dumps(results))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
