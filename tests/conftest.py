"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh (the standard TPU-less
multi-device trick, SURVEY.md §4): sharding tests validate multi-chip
semantics without TPU hardware, and kernel tests use Pallas interpret mode.
Set EGS_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

if not os.environ.get("EGS_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
