"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated here on virtual devices; the driver
separately dry-runs the multi-chip path and benchmarks on real TPU hardware.

NOTE: the TPU platform plugin in this environment overrides the
``JAX_PLATFORMS`` environment variable, so we must force the CPU platform via
``jax.config.update`` after importing jax (but before any backend use).
``XLA_FLAGS`` must still be set before import for the host device count.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(1234)
