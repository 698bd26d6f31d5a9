"""Halo-exchange spatially-sharded conv == unsharded 'SAME' conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_depth_estimation_tpu.parallel.mesh import make_mesh
from mono_depth_estimation_tpu.parallel.spatial import halo_conv2d


@pytest.mark.parametrize("k", [3, 5])
def test_halo_conv_matches_same_conv(k):
    mesh = make_mesh()  # 8 devices on 'data'
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.normal(size=(2, 64, 24, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 3, 5)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    with mesh:
        out = halo_conv2d(x, w, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
