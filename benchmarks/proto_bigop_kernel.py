"""Microbenchmark: per-iteration cost of the ADMM kernel's linear solve,
current form vs a "big-op" explicit-inverse matvec.

Hypothesis (round-3, from the round-2 measured model): the fused forward
kernel is op-COUNT bound - each (n, tile) VPU op carries ~300 cycles of
issue overhead regardless of width, and solve_normal's two triangular
sweeps are 4n ~ 96 such ops per iteration. If the factorisation instead
produced the explicit inverse Minv laid out as one (n*n, tile) plane, the
per-iteration solve becomes ONE (n*n, tile) elementwise multiply of Minv
against an n-times-stacked rhs plus a log2(n)-level tree of segment adds:
~8 ops per iteration instead of ~96.

This prototype times K iterations of a data-dependent chain of each
variant with everything resident in VMEM (contents are arbitrary - only
the op structure is under test). Run on the TPU:

    python benchmarks/proto_bigop_kernel.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri_kernel(lc_ref, rhs_ref, out_ref, *, n: int, iters: int):
    """Current form: two unrolled triangular sweeps per iteration."""

    def solve_normal(rhs):
        acc = rhs
        ys = []
        for i in range(n):
            coli = lc_ref[:, i, :]
            yi = acc[i : i + 1, :] / coli[i : i + 1, :]
            ys.append(yi)
            acc = acc - coli * yi
        y = jnp.concatenate(ys, axis=0)
        acc = y
        xs = [None] * n
        for i in reversed(range(n)):
            rowi = lc_ref[i]
            xi = acc[i : i + 1, :] / rowi[i : i + 1, :]
            xs[i] = xi
            acc = acc - rowi * xi
        return jnp.concatenate(xs, axis=0)

    def body(_, x):
        return solve_normal(x) * 0.5 + x * 0.25   # data-dependent chain

    out_ref[:] = jax.lax.fori_loop(0, iters, body, rhs_ref[:])


def _bigop_kernel(minv_ref, rhs_ref, out_ref, *, n: int, iters: int):
    """Big-op form: Minv stored j-major as one (n*n, tb) plane with
    sublane j*n + i holding Minv[i, j]; matvec = stack rhs -> one big
    multiply -> log-tree of segment adds over the j blocks."""

    def matvec(x):
        # stack x n times: block j replicates x[j] over its n sublanes
        parts = [
            jnp.broadcast_to(x[j : j + 1, :], (n, x.shape[-1]))
            for j in range(n)
        ]
        xs = jnp.concatenate(parts, axis=0)          # (n*n, tb)
        prod = minv_ref[:] * xs                       # ONE big multiply
        # tree-reduce the n blocks of n sublanes down to one block
        m = n
        while m > 1:
            half = m // 2
            top = prod[: half * n, :]
            bot = prod[half * n : 2 * half * n, :]
            rest = prod[2 * half * n : m * n, :]      # odd leftover block
            s = top + bot
            prod = (
                jnp.concatenate([s, rest], axis=0) if m % 2 else s
            )
            m = half + (m % 2)
        return prod                                   # (n, tb)

    def body(_, x):
        return matvec(x) * 0.5 + x * 0.25

    out_ref[:] = jax.lax.fori_loop(0, iters, body, rhs_ref[:])


def time_kernel(kind: str, n: int, tb: int, iters: int, reps: int = 30):
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((n, tb)).astype(np.float32))
    if kind == "tri":
        lc = jnp.asarray(
            (rng.standard_normal((n, n, tb)) + 3.0).astype(np.float32)
        )
        kernel = functools.partial(_tri_kernel, n=n, iters=iters)
        args = (lc, rhs)
        in_specs = [
            pl.BlockSpec((n, n, tb), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        minv = jnp.asarray(
            (rng.standard_normal((n * n, tb)) * 0.1).astype(np.float32)
        )
        kernel = functools.partial(_bigop_kernel, n=n, iters=iters)
        args = (minv, rhs)
        in_specs = [
            pl.BlockSpec((n * n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
        ]

    run = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tb), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    def make(r):
        @jax.jit
        def loop(*a):
            def body(k, acc):
                return acc + run(a[0], a[1] + 1e-6 * k)[0, 0]
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        return loop

    big, one = make(reps), make(1)
    _ = float(big(*args)); _ = float(one(*args))
    t0 = time.perf_counter(); _ = float(big(*args)); tbig = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(one(*args)); tone = time.perf_counter() - t0
    dt = max(tbig - tone, 1e-9) / (reps - 1)
    per_iter = dt / iters
    print(f"{kind:6s} n={n} tb={tb} iters={iters}: {dt*1e6:9.1f} us/call  "
          f"{per_iter*1e6:7.2f} us/iter")
    return per_iter


def check_equivalence(n=8, tb=128):
    """Both kernels implement x <- f(x) chains; check the bigop matvec
    against numpy on random data (the tree reassociates sums - tolerance)."""
    rng = np.random.default_rng(1)
    minv_plane = rng.standard_normal((n * n, tb)).astype(np.float32)
    x = rng.standard_normal((n, tb)).astype(np.float32)

    def ref_matvec():
        out = np.zeros((n, tb), np.float32)
        for i in range(n):
            for j in range(n):
                out[i] += minv_plane[j * n + i] * x[j]
        return out

    out = pl.pallas_call(
        functools.partial(_bigop_kernel, n=n, iters=1),
        in_specs=[
            pl.BlockSpec((n * n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, tb), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tb), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(minv_plane), jnp.asarray(x))
    expect = ref_matvec() * 0.5 + x * 0.25
    err = np.max(np.abs(np.asarray(out) - expect))
    print(f"bigop equivalence check n={n}: max err {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    check_equivalence()
    for n in (24,):
        for tb in (256, 512):
            a = time_kernel("tri", n, tb, iters=20)
            b = time_kernel("bigop", n, tb, iters=20)
            print(f"  -> speedup {a/b:.2f}x")
