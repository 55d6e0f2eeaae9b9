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
import jax  # noqa: E402

# the axon TPU plugin registers itself at interpreter startup (sitecustomize)
# and overrides JAX_PLATFORMS — force the virtual CPU platform in-process,
# before any backend initialises
jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat test runs skip XLA compiles.  Must be
# set via config.update, NOT env vars — the axon sitecustomize imports jax at
# interpreter startup, so jax's env-derived config is already frozen before
# this file runs.  Threshold 0 because the suite's cost is hundreds of
# sub-second tiny-model compiles, all below the default 1s persistence
# cutoff (env-var + 1s threshold left the cache EMPTY after a full run).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-geometry (860M) parity runs — opt-in via "
                   "`-m slow` (several minutes of CPU)")


def pytest_collection_modifyitems(config, items):
    if "slow" in config.getoption("-m", default=""):
        return  # user explicitly asked for them
    skip = pytest.mark.skip(reason="slow full-geometry test; run -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
