"""Test configuration.

Tests run on CPU with a virtual 8-device platform so multi-chip sharding
paths (mesh/pjit) are exercised without TPU hardware. These env vars must be
set before jax is first imported anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The ambient TPU-tunnel sitecustomize registers its backend and pins
# jax_platforms programmatically (overriding the env var), so force CPU at
# the config level too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data/subset"


@pytest.fixture(scope="session")
def ref_subset():
    """Path to the reference's in-repo subset fixture (golden data)."""
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference subset fixture not available")
    return REFERENCE_DATA
