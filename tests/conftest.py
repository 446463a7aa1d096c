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
