"""Fused up-projection: exact equivalence with the direct formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_depth_estimation_tpu.ops.upproj import upproj_conv, upproj_conv_reference


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("hw", [(4, 6), (7, 5)])
def test_upproj_matches_direct(k, hw):
    rng = np.random.default_rng(k)
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(k, k, 3, 4)).astype(np.float32))
    ref = upproj_conv_reference(x, wgt)
    out = upproj_conv(x, wgt)
    assert out.shape == ref.shape == (2, 2 * h, 2 * w, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_upproj_gradients_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(5, 5, 2, 3)).astype(np.float32))

    g_ref = jax.grad(lambda w: upproj_conv_reference(x, w).sum())(wgt)
    g_fused = jax.grad(lambda w: upproj_conv(x, w).sum())(wgt)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)
