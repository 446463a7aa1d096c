"""Persistent compilation cache for production deployments.

The fused solver kernels are fully unrolled in the problem dimension, so
Mosaic compile time grows steeply with N (measured one-off: ~10 s at N=24,
~73 s at N=48, ~213 s at N=64 on a v5e). In a serving or training fleet
that cost should be paid once per (shape, config), not once per process:
JAX's persistent compilation cache stores the compiled executable keyed by
the HLO, so every later process with the same jit signature loads it in
milliseconds.

    import diffqcqp_tpu as dq
    dq.enable_compilation_cache("/var/cache/diffqcqp_tpu")  # once, at start

Also remember that ``SolverConfig`` is a static jit argument: every
DISTINCT config recompiles. Build configs once at module scope and reuse
them across steps (see CLAUDE.md / README).
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    path: str = "~/.cache/diffqcqp_tpu_xla",
    min_compile_time_secs: float = 1.0,
) -> str:
    """Enable JAX's persistent compilation cache at ``path`` (created if
    missing). Returns the resolved path. Call before the first jitted
    solve; safe to call more than once."""
    import jax

    resolved = os.path.expanduser(path)
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    # cache everything the first process compiles, not just top-level jits
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return resolved
