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

# Modules whose non-slow tests are cheap (no big-model compiles): the `quick`
# tier. `pytest -m quick` is the fast signal loop; the full suite stays the
# merge gate.
_QUICK_MODULES = {
    "test_app_misc",
    "test_checkpoint",
    "test_color",
    "test_datasets",
    "test_deform_conv",
    "test_editor",
    "test_mask_merge",
    "test_metrics",
    "test_misc_components",
    "test_modconv",
    "test_native",
    "test_resize",
    "test_upfirdn",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _QUICK_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
