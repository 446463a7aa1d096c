"""Benchmark harness.

Headline metric (BASELINE.json): solved QPs/sec/chip, forward+backward, batch
4096, eps=1e-7 - measured on the flagship workload: N=24 (12-contact)
friction-cone QCQPs solved and differentiated inside a jitted
value_and_grad step (the fwd+bwd unit of the reference's timing protocol,
test_script.py:112-123).

Baseline: the reference C++ solver is single-thread CPU, one problem per
pybind call (SURVEY.md section 2.3). When the native host solver
(native/, built with `make -C native`) is available we time it on the same
problems; otherwise we fall back to a conservative constant derived from the
reference's published figure (qcqp_runtime.png: "Ours" forward ~1e-4 s and
backward ~1e-4 s at n=8; we use 5000 fwd+bwd solves/sec, generous for N=24).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import numpy as np


def _build_problems(b, nc, dtype, seed=0):
    n = 2 * nc
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((b, n, n)).astype(dtype) / np.sqrt(n)
    P = s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=dtype)
    q = (rng.standard_normal((b, n)) * 0.5).astype(dtype)
    l_n = (rng.random((b, nc)) * 0.5 + 0.05).astype(dtype)
    mu = (rng.random((b, nc)) * 0.5 + 0.05).astype(dtype)
    return P, q, l_n, mu


def bench_tpu(b=4096, nc=12, eps=1e-7, max_iter=400, reps=40):
    import jax
    import jax.numpy as jnp

    from diffqcqp_tpu import QCQP_DEFAULTS, solve_qcqp, solve_qcqp_with_stats

    # Tuning knobs (see SolverConfig) - all shape the trajectory, not the
    # fixed point (solutions verified against the reference schedule to
    # ~1e-5 and against the native f64 oracle). Round-3 retune against the
    # kernel's REAL cost function, tile-iterations + 3x refactorisations
    # (convergence is tile-synchronous, so each 512-lane tile pays its
    # slowest problem; a tile-wide refactor costs ~3 iterations):
    # rho0_scale=2.0 trades +2 mean iterations for a much shorter tail
    # (max 28 vs 38), and rho_update_period=24 makes the adaptive-rho
    # refactorisations all but vanish - most problems converge before the
    # first update window. Measured cost-equivalent 94 vs 160 for round
    # 2's (3.0, 8) setting, 41% less; 10 power-iteration steps estimate L
    # as well as the reference's 100 (iteration counts measurably
    # identical).
    cfg = QCQP_DEFAULTS.replace(
        eps=eps, max_iter=max_iter, rho0_scale=2.0, power_iters=10,
        rho_update_period=24,
    )
    P, q, l_n, mu = _build_problems(b, nc, np.float32)
    P, q, l_n, mu = map(jnp.asarray, (P, q, l_n, mu))

    def loss(P, q, l_n, mu):
        l = solve_qcqp(P, q, l_n, mu, config=cfg)
        return jnp.sum(l * l)

    # Timing note: this environment reaches the chip through an RPC tunnel
    # whose per-call latency and result caching make per-dispatch host-side
    # timing unreliable. The repeat loop therefore runs ON DEVICE inside one
    # jitted call, with the problem data perturbed per repetition so no two
    # solves are identical, and the scalar result is read back. The one-off
    # dispatch + readback latency of the tunnel (measured ~25 ms, i.e. many
    # times the step itself) is removed by differencing a reps-step loop
    # against a 1-step loop - the steady-state per-step time is what a
    # training loop actually pays.
    def make_loop(r):
        @jax.jit
        def fwd_bwd_loop(P, q, l_n, mu):
            def body(k, acc):
                v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    P, q + 1e-5 * k, l_n, mu
                )
                return acc + v + g[0][0, 0, 0] + jnp.sum(g[2][0])
            return jax.lax.fori_loop(0, r, body, 0.0)
        return fwd_bwd_loop

    big, one = make_loop(reps), make_loop(1)
    _ = float(big(P, q, l_n, mu))   # compile + warm
    _ = float(one(P, q, l_n, mu))
    # The tunneled chip's effective speed drifts across calls (measured
    # single-pass spread 0.60-1.09 ms/step on IDENTICAL code + trajectory,
    # i.e. +-40% - tenancy/clock noise, not this program). One sample can
    # misreport in either direction, so take the MEDIAN of several
    # differenced passes (~0.1 s each).
    samples = []
    for _pass in range(5):
        t0 = time.perf_counter()
        _ = float(big(P, q, l_n, mu))
        t_big = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(one(P, q, l_n, mu))
        t_one = time.perf_counter() - t0
        if t_big - t_one >= 1e-4:
            samples.append((t_big - t_one) / (reps - 1))
        else:
            # differencing invalid (difference at/below host-timer + tunnel
            # noise) - never turn this pass into a clamped garbage number
            print(
                f"bench: pass {_pass} differencing invalid "
                f"(t_big={t_big:.4f}s t_one={t_one:.4f}s); dropped",
                file=sys.stderr,
            )
    if samples:
        dt = float(np.median(samples))
    else:
        # all passes invalid: conservative undifferenced fallback
        t0 = time.perf_counter()
        _ = float(big(P, q, l_n, mu))
        dt = (time.perf_counter() - t0) / reps
        print("bench: all passes invalid; reporting undifferenced time",
              file=sys.stderr)

    _, stats = jax.jit(lambda *a: solve_qcqp_with_stats(*a, config=cfg))(
        P, q, l_n, mu
    )
    conv = float(np.mean(np.array(stats.converged)))
    iters = float(np.mean(np.array(stats.iterations)))
    return {
        "fwd_bwd_seconds": dt,
        "problems_per_sec": b / dt,
        "batch": b,
        "n": 2 * nc,
        "converged_frac": conv,
        "mean_iters": iters,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def baseline_problems_per_sec(b=256, nc=12, eps=1e-7, max_iter=400):
    """Reference-equivalent C++ single-thread throughput on this host, via
    the native host solver if built; else a generous constant."""
    try:
        from diffqcqp_tpu.native import host_solver

        if not host_solver.available():
            import subprocess

            subprocess.run(
                ["make", "-C", "native"], check=True, capture_output=True,
                cwd=__file__.rsplit("/", 1)[0] or ".",
            )
        P, q, l_n, mu = _build_problems(b, nc, np.float64, seed=1)
        # best of 3 runs: the baseline must not be deflated by transient
        # host load (it is the denominator of vs_baseline).
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            host_solver.solve_qcqp_batch(
                P, q, l_n, mu, eps=eps, max_iter=max_iter, threads=1,
                fwd_bwd=True,
            )
            best = max(best, b / (time.perf_counter() - t0))
        return best, "native_host_solver_1thread_best_of_3"
    except Exception as e:  # noqa: BLE001
        print(f"baseline fallback ({type(e).__name__}: {e})", file=sys.stderr)
        return 5000.0, "estimated_from_reference_figure"


def main():
    res = bench_tpu()
    base, base_src = baseline_problems_per_sec()
    out = {
        "metric": "qcqp_fwd_bwd_throughput",
        "value": round(res["problems_per_sec"], 1),
        "unit": "problems/sec/chip (B=4096, N=24, eps=1e-7, fwd+bwd)",
        "vs_baseline": round(res["problems_per_sec"] / base, 2),
        "baseline_problems_per_sec": round(base, 1),
        "baseline_source": base_src,
        "fwd_bwd_seconds": round(res["fwd_bwd_seconds"], 5),
        "converged_frac": res["converged_frac"],
        "mean_iters": res["mean_iters"],
        "backend": res["backend"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
