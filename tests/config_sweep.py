"""One-command adversarial CONFIG-INTERACTION sweep (not a pytest test).

The suite tests each SolverConfig feature thoroughly but not their cross
product; this harness solves one fixed QCQP problem set under N random
config combinations (backend x pallas_rolled x compact_iters x equilibrate
x warm_start_dual x primal_check x rho_sync x schedule x lmax_method x
linsolve, plus warm starts every third combo) and asserts every combination
converges fully and lands eps-level close to a tight float64 reference
solve. Round-5 evidence: 50/50 combinations clean (max err < 5e-4 vs the
1e-12 f64 reference; see the VERDICT-round commit message).

    python tests/config_sweep.py              # 50 combos, ~9 min CPU
    python tests/config_sweep.py 20           # fewer combos

NOT collected by pytest (filename does not match test_*.py): the full
sweep is a ~9-minute CPU run, far above the suite's per-test budget.
"""

import random
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import diffqcqp_tpu as dq  # noqa: E402


def main(n_combos: int = 50) -> int:
    rng = np.random.default_rng(123)
    b, nc = 24, 3
    n = 2 * nc
    s = rng.standard_normal((b, n, n)) / np.sqrt(n)
    P64 = s @ s.transpose(0, 2, 1) + 0.1 * np.eye(n)
    q64 = rng.standard_normal((b, n)) * 0.5
    l_n = rng.random((b, nc)) * 0.5 + 0.05
    mu = rng.random((b, nc)) * 0.5 + 0.05

    ref = np.asarray(dq.solve_qcqp(P64, q64, l_n, mu, eps=1e-12,
                                   max_iter=20000))
    P32, q32 = P64.astype(np.float32), q64.astype(np.float32)
    ln32, mu32 = l_n.astype(np.float32), mu.astype(np.float32)

    random.seed(0)
    bad = 0
    for i in range(n_combos):
        kw = dict(
            eps=random.choice([1e-6, 1e-7]),
            max_iter=3000,
            backend=random.choice(["xla", "pallas"]),
            pallas_tile_b=random.choice([128, 256]),
            pallas_rolled=random.choice(["auto", "on", "off"]),
            compact_iters=random.choice([0, 5, 17, "auto"]),
            equilibrate=random.choice([True, False]),
            ruiz_iters=random.choice([4, 10]),
            warm_start_dual=random.choice([True, False]),
            primal_check=random.choice([True, False]),
            rho_sync=random.choice([True, False]),
            rho0_scale=random.choice([1.0, 2.0]),
            rho_update_period=random.choice([5, 24]),
            lmax_method=random.choice(["eigh", "power"]),
            linsolve=random.choice(["auto", "spectral", "chol"]),
        )
        cfg = dq.QCQP_DEFAULTS.replace(**kw)
        ws = np.asarray(ref, np.float32) if (i % 3 == 0) else None
        try:
            l, st = dq.solve_qcqp_with_stats(
                P32, q32, ln32, mu32, warm_start=ws, config=cfg
            )
        except Exception as e:  # noqa: BLE001
            print(f"combo {i} RAISED {type(e).__name__}: {e}\n  cfg={kw}")
            bad += 1
            continue
        la = np.asarray(l, np.float64)
        err = float(np.max(np.abs(la - ref)))
        conv = float(np.mean(np.asarray(st.converged)))
        it = int(np.asarray(st.iterations).max())
        if not (conv == 1.0 and err < 5e-4 and np.isfinite(la).all()
                and it <= kw["max_iter"]):
            print(f"combo {i} BAD: err={err:.2e} conv={conv} itmax={it}\n"
                  f"  cfg={kw}")
            bad += 1
        if (i + 1) % 10 == 0:
            print(f"  {i + 1}/{n_combos} done ({bad} bad)", flush=True)
    print(f"{n_combos} combos, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 50))
