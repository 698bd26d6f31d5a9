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


@pytest.mark.slow
def test_fcrn_spatially_sharded_eval_matches_unsharded():
    """A REAL model (FCRN/ResNet-18, the reference 'laina' network,
    network/FCRN.py) evaluated on a >2K-pixel-tall image with the H axis
    sharded over all 8 mesh devices: GSPMD partitions every conv/pool in
    the encoder+decoder (inserting the halo exchanges halo_conv2d spells
    out by hand) and the result must equal the unsharded forward."""
    from mono_depth_estimation_tpu.models.fcrn import FCRN
    from mono_depth_estimation_tpu.parallel.spatial import (
        spatially_sharded_apply,
    )

    mesh = make_mesh()
    h, w = 2048, 160  # H > 2K, divisible by 8 shards and stride 32
    model = FCRN(layers=18, decoder="upproj", output_size=(h // 2, w // 2),
                 out_channels=1)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    )
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(
        jax.random.PRNGKey(0), x
    )

    apply_fn = lambda v, xx: model.apply(v, xx, train=False)
    ref = jax.jit(apply_fn)(variables, x)
    out = spatially_sharded_apply(apply_fn, variables, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
