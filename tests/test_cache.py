"""Persistent-compilation-cache helper (utils/cache.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import diffqcqp_tpu as dq


def test_enable_compilation_cache_populates(tmp_path, rng, spd):
    # The cleanup below needs jax's PRIVATE reset_cache() (see the finally
    # block). Resolve it BEFORE running the test body: if a jax upgrade
    # moves/renames it we skip with a clear message instead of the finally
    # block turning into a new failure that masks the test body.
    try:
        from jax._src.compilation_cache import reset_cache as _reset_cache
    except ImportError:
        import pytest

        pytest.skip(
            "jax._src.compilation_cache.reset_cache moved in jax "
            f"{jax.__version__}; the test's singleton-cleanup dependency "
            "needs re-porting (see the finally-block comment)."
        )
    prev_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
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
        # do not leak the cache config into other tests. Resetting the
        # config dir alone is NOT enough: JAX keeps the initialized cache
        # SINGLETON (jax._src.compilation_cache._cache) alive after the
        # dir is unset, so every later compile in the suite still runs
        # executable.serialize() for a cache write - and XLA's CPU
        # serialize segfaulted on one of test_verify's executables
        # (observed jax 0.9.0, full-suite run; crash frame
        # put_executable_and_time -> executable.serialize()).
        # reset_cache() returns the module to its pristine state.
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min_secs
        )
        _reset_cache()
