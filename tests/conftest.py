"""Test configuration: CPU backend, 8 virtual devices, float64.

Tests run on the CPU backend with x64 enabled so correctness is checked at
the reference's precision (the reference is float64 throughout,
qcqp.py:13 torch.set_default_dtype(torch.double)). Multi-chip sharding is
tested on an 8-device virtual CPU mesh - the standard JAX substitute for a
fake distributed backend (SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in
# this environment; the config update below is what actually pins tests to
# the (8-virtual-device) CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# pyproject.toml pins `addopts = "-n 2"`: without pytest-xdist the suite
# fails at option parsing with an opaque "unrecognized arguments: -n".
# Conftests for the target dir load BEFORE that validation, so fail here
# with the real story instead. The pin is NOT for speed: a single process
# compiling the whole suite's ~190 XLA programs segfaults inside a late
# compile on this jax build (see pyproject.toml / CLAUDE.md;
# tests/serial_compile_repro.py re-validates the pin on a jax upgrade).
import importlib.util  # noqa: E402

if importlib.util.find_spec("xdist") is None:
    raise pytest.UsageError(
        "pytest-xdist is required: pyproject.toml pins 'addopts = -n 2' "
        "because a single process compiling the full suite's XLA program "
        "set segfaults (jax 0.9.0 CPU backend - see pyproject.toml "
        "comment). Install pytest-xdist, or to run a small subset "
        "serially: pytest -p no:cacheprovider -o addopts='' <tests...>"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_spd(rng, b, n, cond_scale=1.0):
    """Random SPD batch P = S S^T + 0.1 I, like the reference's gradient
    check problem (test_script.py:26-27)."""
    s = rng.standard_normal((b, n, n)) * cond_scale
    return s @ np.swapaxes(s, 1, 2) + 0.1 * np.eye(n)


@pytest.fixture
def spd():
    return random_spd
