"""Test configuration: run on a fake 8-device CPU mesh.

This is the standard JAX trick (SURVEY.md §4) standing in for multi-chip
hardware: XLA exposes 8 host CPU devices, so sharding/pjit paths compile and
execute exactly as they would across a real TPU slice.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (the tunneled TPU); tests must run
# on the fake multi-device CPU backend, so force-override. Set
# MDE_TEST_PLATFORM=axon to deliberately run the suite on the real chip.
os.environ["JAX_PLATFORMS"] = os.environ.get("MDE_TEST_PLATFORM", "cpu")
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
