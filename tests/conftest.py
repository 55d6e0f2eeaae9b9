"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-chip sharding is validated on a virtual device mesh
(``--xla_force_host_platform_device_count=8``) because real multi-chip TPU
hardware is not present in CI; the same mesh code runs unchanged on a real
slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
