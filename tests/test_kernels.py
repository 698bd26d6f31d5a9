"""Pallas kernels vs their jnp twins (interpreter mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mono_depth_estimation_tpu.kernels.lpg import lpg_pallas
from mono_depth_estimation_tpu.kernels.preproc import (
    normalize_crop_pallas,
    normalize_crop_reference,
)
from mono_depth_estimation_tpu.ops.lpg import local_planar_guidance


@pytest.mark.parametrize("r", [2, 4, 8])
def test_lpg_kernel_matches_jnp(r):
    rng = np.random.default_rng(r)
    plane = rng.normal(size=(2, 8, 16, 4)).astype(np.float32)
    plane[..., 2] += 2.0  # keep denominators away from zero
    ref = local_planar_guidance(jnp.asarray(plane), r)
    with pltpu.force_tpu_interpret_mode():
        out = lpg_pallas(jnp.asarray(plane), r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_normalize_crop_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = normalize_crop_reference(jnp.asarray(img), (32, 40), mean, std)
    with pltpu.force_tpu_interpret_mode():
        out = normalize_crop_pallas(jnp.asarray(img), (32, 40), mean, std)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
