"""Test harness: force an 8-virtual-device CPU platform.

Sharding/multi-host logic is validated without a pod by running the same
Mesh/shard_map programs over 8 virtual CPU devices (SURVEY.md §4
"Distributed-without-a-cluster"). Must run before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
