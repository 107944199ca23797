"""Test environment: force CPU backend with 8 virtual devices.

Per the build instructions, multi-chip sharding is validated on a virtual
CPU mesh (real TPU has a single chip in CI); compute parity tests also run
on CPU for determinism vs the torch reference fixtures.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize (PYTHONPATH=/root/.axon_site) forces
# jax_platforms='axon,cpu' regardless of JAX_PLATFORMS -- override it
# post-import so tests run on the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# float32 matmuls at full precision for parity against torch CPU
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: test-suite wall-clock is compile-dominated.
# Per-backend subdir: CPU AOT blobs must not mix with axon/TPU ones.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
