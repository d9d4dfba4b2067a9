"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

This mirrors the reference's testing stance (single-process MPI stub as the
de-facto parallel fake, SURVEY.md §4): multi-chip logic is exercised on
XLA's forced host-platform device count without real hardware.
"""

import os

# Force CPU: tests must not grab the (slow-to-initialize, single) TPU chip.
# The axon sitecustomize exports JAX_PLATFORMS=axon, so override — backends
# are initialized lazily, so as long as this runs before the first jax
# computation the TPU tunnel is never touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
import pytest

# The TPU-tunnel sitecustomize force-selects its platform via jax.config,
# which wins over the env var — override it back at the same level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
