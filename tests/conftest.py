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


def pytest_addoption(parser):
    parser.addoption(
        "--full",
        action="store_true",
        default=False,
        help="run the FULL profile including @pytest.mark.slow compile-bound "
        "tests (~45 min on the 1-core host; the default fast profile keeps "
        "every module covered in < 10 min — see tests/TIMINGS.md)",
    )


def pytest_collection_modifyitems(config, items):
    """Default = fast profile: tests marked ``slow`` (the compile-bound
    scan-unroll/virtual-mesh equivalence cases that dominate the ~45-min
    full wall time) are skipped unless ``--full`` or an explicit ``-m``
    selection is given. Every module keeps unmarked coverage, so the fast
    profile still touches the whole package."""
    if config.getoption("--full") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow (compile-bound); run with --full")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(1234)
