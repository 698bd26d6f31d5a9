"""Eigen et al. (2014) 3-scale coarse-to-fine depth network (Flax, NHWC).

Capability parity with /root/reference/network/Eigen.py:1-98:

* Scale 1: VGG-19-BN features -> FC 4096 -> FC 64*19*14 -> deconv k3 s4
  (Eigen.py:71-90). The FC pair is the single largest matmul in the zoo —
  it runs as one big MXU matmul in bf16.
* Scale 2: 9x9 s2 conv + 3x3 s2 pool (cropped), concat(96+64), 3 5x5 convs,
  deconv k5 s2 p2 (Eigen.py:20-43).
* Scale 3: 9x9 s2 conv (cropped), 3x3 s1 pool, concat(+1), 4 5x5 convs
  (Eigen.py:45-69).

Geometry is tied to the 240x320 training resolution (output 109x149), as in
the reference; the module layer upsamples predictions to ground-truth size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import Conv, ConvTranspose, max_pool
from mono_depth_estimation_tpu.models.encoders.vgg import VGG19BNFeatures


class EigenScale1(nn.Module):
    """VGG features -> MLP -> coarse 64-channel 55x75 map."""

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        x = VGG19BNFeatures()(img, train=train)  # (B, 7, 10, 512) @240x320
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.Dense(4096)(x)
        x = nn.Dense(64 * 19 * 14)(x)
        x = x.reshape(b, 14, 19, 64)
        return ConvTranspose(64, kernel=3, stride=4)(x)  # (B, 55, 75, 64)


class EigenScale2(nn.Module):
    @nn.compact
    def __call__(
        self, img: jax.Array, coarse: jax.Array, train: bool = False
    ) -> jax.Array:
        x = Conv(96, kernel=9, stride=2, padding=0, use_bias=True)(img)
        x = nn.relu(x)
        x = max_pool(x, 3, 2)[:, 1:-1, 1:-1, :]
        x = jnp.concatenate([x, coarse], axis=-1)  # 160 ch
        for _ in range(3):
            x = Conv(64, kernel=5, padding=2, use_bias=True)(x)
            x = nn.relu(x)
        return ConvTranspose(1, kernel=5, stride=2, padding=2)(x)


class EigenScale3(nn.Module):
    @nn.compact
    def __call__(
        self, img: jax.Array, mid: jax.Array, train: bool = False
    ) -> jax.Array:
        x = Conv(96, kernel=9, stride=2, padding=0, use_bias=True)(img)
        x = x[:, 2:-3, 2:-3, :]
        x = nn.relu(x)
        x = max_pool(x, 3, 1)
        x = jnp.concatenate([x, mid], axis=-1)  # 97 ch
        for _ in range(3):
            x = Conv(64, kernel=5, padding=2, use_bias=True)(x)
            x = nn.relu(x)
        x = Conv(1, kernel=5, padding=2, use_bias=True)(x)
        return nn.relu(x)


class Eigen(nn.Module):
    """Full 3-scale model; returns (B, 109, 149, 1) at 240x320 input."""

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        coarse = EigenScale1()(img, train=train)
        mid = EigenScale2()(img, coarse, train=train)
        return EigenScale3()(img, mid, train=train)
