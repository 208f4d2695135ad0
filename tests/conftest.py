"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip (DP mesh) behavior is validated on a fake 8-device CPU mesh,
matching how the driver dry-runs the multichip path. Must run before jax
is imported anywhere.
"""

import os

# NOTE: this image's sitecustomize imports jax at interpreter startup, so
# env vars alone are too late; jax.config still works because the backend
# has not been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's cost is dominated by CPU XLA
# compiles of the jitted train steps (2-3 min each on this 1-core host;
# >90 min for the full suite cold). Identical programs hit the cache on
# re-runs, cutting repeat suites to the actual test compute. Only
# compiles >5 s are cached to keep the directory small.
jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
