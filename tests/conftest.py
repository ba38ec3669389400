"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware.

Note: the environment presets JAX_PLATFORMS=axon (a remote-TPU tunnel) and a
sitecustomize may import jax before this file runs, so we must force the
platform through jax.config, not os.environ.
"""

import os

# must be set before the CPU backend is initialized for the 8-device mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import (  # noqa: E402
    synthetic_radiograph,
)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def phantom_512():
    return synthetic_radiograph(512, "thorax")


@pytest.fixture(scope="session")
def phantom_256():
    return synthetic_radiograph(256, "knee")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_collection_modifyitems(config, items):
    """Skip `slow`-marked tests by default (suite budget: < 10 min on the
    8-virtual-CPU mesh).  Opt in with `-m slow` or MUSICA_RUN_SLOW=1; the
    slow set re-covers scale points (1792 ragged sharding) whose quirk
    surface is already exercised at smaller sizes in the default run."""
    if os.environ.get("MUSICA_RUN_SLOW") or "slow" in config.option.markexpr:
        return
    skip = pytest.mark.skip(reason="slow: opt in with -m slow or MUSICA_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# Persistent XLA compile cache for the CPU test backend: the suite runs on
# ONE host core and is dominated by ~200 full-pipeline compiles, so repeat
# runs (CI, review re-runs, iteration) drop from ~15 to well under 10 min.
# Safe here: the known cache-hit HANG is specific to the axon remote-TPU
# backend (memory/axon-background-task-hygiene); tests force CPU above.
# Disable with MUSICA_TEST_COMPILE_CACHE="".
_cache_dir = os.environ.get(
    "MUSICA_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "musica_test_xla"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # "all" (the default) lets cached executables share XLA-level kernel
    # caches across compiles; such executables reference kernel functions
    # that serialize_executable does NOT capture, breaking the MUSICA AOT
    # cache's round trip on the 8-device backend ("Buffer Definition
    # Event: Function ... not found" at dispatch of a deserialized entry).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
