"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual host devices (the reference has
no analog of this — SURVEY.md §4); real-TPU benchmarking happens in bench.py,
not in the test suite. These env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may register a TPU PJRT plugin at interpreter startup
# (before this conftest), which overrides JAX_PLATFORMS from the env; the
# config knob still wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's cost is dominated by re-jitting
# the same tiny models every run; cache hits cut repeat runs to seconds.
_cache_dir = os.environ.get("ADAFACE_TEST_JAX_CACHE",
                            "/tmp/adaface_jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs: run uncached
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
