"""VGG-19-BN feature extractor (Flax, NHWC) — Eigen's scale-1 backbone.

Mirrors torchvision vgg19_bn(...).features, used at
/root/reference/network/Eigen.py:71-90. Configuration 'E':
conv(64)x2, M, conv(128)x2, M, conv(256)x4, M, conv(512)x4, M, conv(512)x4, M
with BatchNorm + ReLU after every conv and 2x2 max-pool at the 'M's.
Output stride 32, 512 channels.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, max_pool

_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


class VGG19BNFeatures(nn.Module):
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for v in _VGG19_CFG:
            if v == "M":
                x = max_pool(x, 2, 2)
            else:
                x = Conv(int(v), kernel=3, use_bias=True)(x)
                x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
                x = nn.relu(x)
        return x
