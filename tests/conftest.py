"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the sharded
path via __graft_entry__.dryrun_multichip).
"""

import os

# JAX_PLATFORM_NAME (not JAX_PLATFORMS) is what reliably overrides the axon
# TPU plugin in this environment; set both plus the config knob below.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from .ref_fixtures import ReferenceTools  # noqa: E402


@pytest.fixture(scope="session")
def ref_tools():
    tools = ReferenceTools.build()
    if tools is None:
        pytest.skip("reference toolchain not available")
    return tools


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xBEEF)
