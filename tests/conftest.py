"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the sharded
path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
