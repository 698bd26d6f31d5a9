"""Test configuration: run on a fake 8-device CPU mesh.

This is the standard JAX trick (SURVEY.md §4) standing in for multi-chip
hardware: XLA exposes 8 host CPU devices, so sharding/pjit paths compile and
execute exactly as they would across a real TPU slice.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (the tunneled TPU) AND pre-imports
# jax via PYTHONPATH=/root/.axon_site, so the env var is already consumed —
# only jax.config.update can override the platform. XLA_FLAGS is still read
# lazily at backend init, so setting it here works. Set MDE_TEST_PLATFORM=axon
# to deliberately run the suite on the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("MDE_TEST_PLATFORM", "cpu"))

# Persistent, machine-scoped compile cache (utils/jax_setup): the suite's
# cost is dominated by XLA:CPU compiles of real models, and every entry
# point already uses this cache — a warm rerun of the slow suite drops from
# tens of minutes to minutes. The cpu_aot_loader "+prefer-no-scatter"
# E-log on cache hits is a documented jaxlib-0.9.0 false positive
# (see utils/jax_setup._machine_tag).
from mono_depth_estimation_tpu.utils.jax_setup import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
