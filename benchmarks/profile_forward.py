"""Forward-kernel knob sweep at the flagship shape (B=4096, N=24 QCQP).

The layout profile (profile_layout.py) showed the XLA-side setup is ~free
and the forward kernel is ~73% of the fwd+bwd step. This sweeps the knobs
that govern the kernel's serial critical path:

  * tile_b: grid tiles run SEQUENTIALLY on the one TensorCore, and each op
    in the unrolled Cholesky/solve chain is tiny at (n, 512) - larger tiles
    amortise per-op overhead (VMEM-permitting) at the cost of coarser
    tile-synchronous convergence.
  * power_iters: the in-kernel L estimate costs one matvec per step - a
    fixed prologue comparable to several ADMM iterations.
  * max_iter cap splits prologue (power iteration + first factorise) from
    per-iteration cost.

Same on-device differencing methodology as profile_layout.py.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

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
    _ = float(big(*args)); _ = float(one(*args))
    t0 = time.perf_counter(); _ = float(big(*args)); tb = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(one(*args)); t1 = time.perf_counter() - t0
    dt = max(tb - t1, 1e-9) / (reps - 1)
    print(f"{label:52s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    from diffqcqp_tpu import QCQP_DEFAULTS, solve_qcqp_with_stats

    assert jax.default_backend() == "tpu"
    P, q, l_n, mu = _problems()
    out = {}

    def run(tag, **kw):
        cfg = QCQP_DEFAULTS.replace(
            eps=1e-7, max_iter=400, rho0_scale=3.0, power_iters=20, **kw
        )
        def f(k, P, q, l_n, mu):
            l, st = solve_qcqp_with_stats(P, q + 1e-5 * k, l_n, mu, config=cfg)
            return l
        out[tag] = dtime(f, (P, q, l_n, mu), label=tag)
        # convergence sanity at this config
        _, st = jax.jit(lambda *a: solve_qcqp_with_stats(*a, config=cfg))(P, q, l_n, mu)
        conv = float(np.mean(np.array(st.converged)))
        iters = float(np.mean(np.array(st.iterations)))
        print(f"    converged={conv:.4f} mean_iters={iters:.2f}")

    for tb in (512, 1024, 2048):
        run(f"fwd tile_b={tb} power=20", pallas_tile_b=tb)
    for pi in (5, 10):
        run(f"fwd tile_b=1024 power={pi}", pallas_tile_b=1024, power_iters=pi)
    run("fwd tile_b=2048 power=10", pallas_tile_b=2048, power_iters=10)
    # prologue cost: max_iter=1 runs power iteration + factorise + 1 iter
    run("fwd tile_b=512 power=20 max_iter=1 (prologue)", max_iter=1)
    run("fwd tile_b=512 power=1 max_iter=1 (factor only)", power_iters=1, max_iter=1)
    run("fwd tile_b=2048 power=1 max_iter=1", power_iters=1, max_iter=1, pallas_tile_b=2048)

    print(json.dumps({k: round(v * 1e3, 4) for k, v in out.items()}))


if __name__ == "__main__":
    main()
