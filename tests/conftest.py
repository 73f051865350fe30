"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere in the test process.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (one real TPU)
# via sitecustomize, so the env var alone is not enough — use jax.config below.
# Unit tests run on a virtual 8-device CPU mesh for determinism + sharding checks.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the trainer/pipeline graphs are large and CPU
# XLA compiles are slow; cache them across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
