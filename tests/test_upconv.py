"""Fused nearest-upsample+conv (ops/upconv.py) == the direct formulation.

The BTS decoder's upconv (network/Bts.py:69-80) is nearest-2x + 3x3 conv;
the fused input-dilated form must be exact (up to f32 association) for any
odd kernel, including the boundary rows/columns where the upsampled map's
zero padding and the duplicated last row interact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.ops.upconv import (
    upconv_nearest_conv,
    upconv_nearest_conv_reference,
)


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("hw", [(6, 7), (1, 1), (4, 4)])
def test_upconv_matches_direct(k, hw):
    rng = np.random.default_rng(k * 10 + hw[0])
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(k, k, 5, 6)), jnp.float32)
    want = np.asarray(upconv_nearest_conv_reference(x, wk))
    got = np.asarray(jax.jit(upconv_nearest_conv)(x, wk))
    assert got.shape == (2, 2 * h, 2 * w, 6)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_upconv_gradients_match():
    """The fused form must also train identically (it replaces the direct
    form inside the flagship's training step)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 3)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(3, 3, 3, 4)), jnp.float32)

    gf = jax.grad(lambda w, x: jnp.sum(upconv_nearest_conv(x, w) ** 2),
                  argnums=(0, 1))(wk, x)
    gr = jax.grad(
        lambda w, x: jnp.sum(upconv_nearest_conv_reference(x, w) ** 2),
        argnums=(0, 1),
    )(wk, x)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)


def test_fused_upconv_module_matches_literal_form():
    """FusedUpConv (models/common.py) must produce the exact param tree of
    the literal upsample2x_nearest + Conv pair it replaces (so checkpoints
    and the torch converter are untouched) and the same outputs when both
    are evaluated with the same params — with and without bias."""
    from flax import linen as nn

    from mono_depth_estimation_tpu.models.common import (
        Conv,
        FusedUpConv,
        upsample2x_nearest,
    )

    class Literal(nn.Module):
        features: int
        use_bias: bool

        @nn.compact
        def __call__(self, x):
            x = upsample2x_nearest(x)
            return Conv(self.features, kernel=3, padding=1,
                        use_bias=self.use_bias, name="Conv_0")(x)

    class Fused(nn.Module):
        features: int
        use_bias: bool

        @nn.compact
        def __call__(self, x):
            return FusedUpConv(self.features, use_bias=self.use_bias,
                               name="Conv_0")(x)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 3)), jnp.float32)
    for use_bias in (False, True):
        lit, fus = Literal(4, use_bias), Fused(4, use_bias)
        v_lit = lit.init(jax.random.PRNGKey(0), x)
        v_fus = fus.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v_lit) == \
            jax.tree_util.tree_structure(v_fus)
        assert jax.tree.map(lambda a: a.shape, v_lit) == \
            jax.tree.map(lambda a: a.shape, v_fus)
        # same params through both forms -> same outputs
        np.testing.assert_allclose(
            np.asarray(fus.apply(v_lit, x)),
            np.asarray(lit.apply(v_lit, x)),
            atol=3e-5, rtol=1e-5,
        )
