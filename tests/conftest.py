"""Test harness config: force an 8-device virtual CPU mesh so sharding tests
run anywhere, per the build contract (multi-chip hardware is unavailable —
shardings are validated on xla_force_host_platform_device_count=8).

Note: this image's sitecustomize registers a remote 'axon' TPU platform and
force-sets jax.config.jax_platforms — the env var alone is ignored, so we must
override through jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
