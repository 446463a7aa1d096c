"""Rolled-vs-unrolled fused-kernel measurement: Mosaic compile time + runtime.

The unrolled kernel's compile time grows ~quadratically in its op count
(round-4 one-offs: ~10 s N=24, ~73 s N=48, ~213 s N=64, ~16 min + VMEM OOM
N=96); the rolled factorisation (SolverConfig.pallas_rolled) bounds it at
the cost of ~3x the per-refactorisation op count. This script measures both
sides of that trade on the real chip:

    python -u benchmarks/profile_rolled.py 24 48        # modes off+on
    python -u benchmarks/profile_rolled.py 64 --rolled-only
    python -u benchmarks/profile_rolled.py 96 --rolled-only

Compile time = wall time of the first jitted call (fresh shape/config keys
per (N, mode), no persistent cache assumed); runtime = the differenced
on-device fori_loop protocol (profile_layout.dtime; CLAUDE.md gotchas).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import jax
import jax.numpy as jnp

from benchmarks.profile_layout import dtime


def _problems(b, nc, seed=0):
    n = 2 * nc
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((b, n, n)).astype(np.float32) / np.sqrt(n)
    P = s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32)
    q = (rng.standard_normal((b, n)) * 0.5).astype(np.float32)
    l_n = (rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32)
    mu = (rng.random((b, nc)) * 0.5 + 0.05).astype(np.float32)
    return jnp.asarray(P), jnp.asarray(q), jnp.asarray(l_n), jnp.asarray(mu)


def measure(n, mode, b=4096, reps=12):
    from diffqcqp_tpu import QCQP_DEFAULTS, solve_qcqp_with_stats

    nc = n // 2
    cfg = QCQP_DEFAULTS.replace(
        eps=1e-7, max_iter=400, backend="pallas", pallas_rolled=mode,
        rho0_scale=2.0, rho_update_period=24, power_iters=10,
    )
    P, q, l_n, mu = _problems(b, nc)

    def fwd(k, P, q, l_n, mu):
        l, st = solve_qcqp_with_stats(
            P, q + 1e-6 * k, l_n, mu, config=cfg
        )
        return l, st.iterations

    wrapped = jax.jit(lambda P, q, l_n, mu: fwd(0, P, q, l_n, mu))
    t0 = time.perf_counter()
    out = wrapped(P, q, l_n, mu)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    print(f"N={n:3d} mode={mode:3s} first-call (compile+run) {t_compile:8.1f} s",
          flush=True)

    conv_cfg = cfg
    l, st = None, None
    dt = dtime(fwd, (P, q, l_n, mu), reps=reps,
               label=f"N={n} rolled={mode} fwd solve")
    # convergence sanity on the measured config
    from diffqcqp_tpu import solve_qcqp_with_stats as s2
    _, st = s2(P, q, l_n, mu, config=conv_cfg)
    frac = float(np.mean(np.asarray(st.converged)))
    mean_it = float(np.mean(np.asarray(st.iterations)))
    print(f"    converged_frac={frac:.3f} mean_iters={mean_it:.1f}", flush=True)
    return {"n": n, "mode": mode, "compile_s": t_compile, "fwd_s": dt,
            "converged_frac": frac, "mean_iters": mean_it}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    rolled_only = "--rolled-only" in sys.argv
    ns = [int(a) for a in args] or [24, 48]
    assert jax.default_backend() == "tpu", jax.default_backend()
    rows = []
    for n in ns:
        modes = ["on"] if rolled_only else ["off", "on"]
        for mode in modes:
            rows.append(measure(n, mode))
    print("\nsummary:")
    for r in rows:
        print(f"  N={r['n']:3d} rolled={r['mode']:3s} compile {r['compile_s']:7.1f} s"
              f"  fwd {r['fwd_s']*1e3:7.3f} ms  conv {r['converged_frac']:.3f}"
              f"  iters {r['mean_iters']:.1f}")


if __name__ == "__main__":
    main()
