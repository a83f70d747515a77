"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh (the standard TPU-less
multi-device trick, SURVEY.md §4): sharding tests validate multi-chip
semantics without TPU hardware, and kernel tests use Pallas interpret mode.
Set EGS_TEST_TPU=1 to run the suite on the real chip instead.

Note: the environment's TPU plugin overrides the JAX_PLATFORMS env var at
interpreter startup, so the platform is forced via jax.config instead.
"""

import os

if not os.environ.get("EGS_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same deterministic stream
    return np.random.default_rng(0)
