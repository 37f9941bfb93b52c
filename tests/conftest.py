"""Test harness: force an 8-virtual-device CPU platform.

Sharding/multi-host logic is validated without a pod by running the same
Mesh/shard_map programs over 8 virtual CPU devices (SURVEY.md §4
"Distributed-without-a-cluster"). Must run before JAX initializes.
"""

import os

# Belt and suspenders: env vars AND config updates. This environment's
# sitecustomize pre-imports jax and registers the TPU ("axon") PJRT plugin at
# interpreter startup, so env vars set here are read too late — only the
# config updates below actually stick.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: the march/interpreter graphs are slow to
# compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/raymarch_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
