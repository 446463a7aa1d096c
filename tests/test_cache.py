"""Persistent-compilation-cache helper (utils/cache.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq


def test_enable_compilation_cache_populates(tmp_path, rng, spd):
    path = dq.enable_compilation_cache(str(tmp_path / "xla_cache"))
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        assert os.path.isdir(path)
        P = jnp.array(spd(rng, 4, 6))
        q = jnp.array(rng.standard_normal((4, 6)))
        _ = jax.jit(lambda P, q: dq.solve_qp(P, q, eps=1e-8))(P, q)
        entries = os.listdir(path)
        assert entries, "compilation cache stayed empty"
    finally:
        # do not leak the cache config into other tests
        jax.config.update("jax_compilation_cache_dir", None)
