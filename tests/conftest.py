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
# persistent compilation cache: repeat test runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the axon TPU plugin registers itself at interpreter startup (sitecustomize)
# and overrides JAX_PLATFORMS — force the virtual CPU platform in-process,
# before any backend initialises
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
