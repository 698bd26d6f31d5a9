"""SharpNet — multi-task depth / normals / boundary network (Flax, NHWC).

Capability parity with /root/reference/network/SharpNet.py:13-277:

* encoder: ResNet-50 with layer4 stride-1, first-block-only dilation 2
  (SharpNet.py:165-172,235-252); skips are
  [post-maxpool (64), layer1 (256), layer2 (512), layer3 (1024), layer4 (2048)].
* per-task decoders (SharpNet.py:13-143): 5 upconv stages of
  ``layers_nums[i]`` conv-BN-ReLU layers to [1024, 512, 256, 64, 16]
  channels, each stage followed by an align-corners bilinear resize to the
  next skip's size and channel concat; head conv -> BN -> task activation.
  Depth decoder triples the first two stage depths and ends in ReLU;
  normals uses doubled depths, Tanh and L2-normalized output; boundary
  uses nearest interpolation and Sigmoid (SharpNet.py:175-211).

Returns a dict with the enabled task heads ('depth', 'normals', 'boundary').
The reference module is NOT in the method registry (modules/__init__.py:3);
our framework registers it — a documented capability improvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, max_pool
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.resize import resize_bilinear, resize_nearest

_DEC_CHANNELS = (1024, 512, 256, 64, 16)


class SharpNetDecoder(nn.Module):
    out_channels: int
    layers_nums: tuple[int, ...] = (2, 2, 2, 2, 2)
    out_activation: str = "ReLU"
    normalize_output: bool = False
    interpolation: str = "bilinear"
    use_bias: bool = True
    frozen_bn: bool = False

    def _resize(self, x, size):
        if self.interpolation == "bilinear":
            return resize_bilinear(x, size, align_corners=True)
        return resize_nearest(x, size)

    @nn.compact
    def __call__(
        self,
        skips: tuple[jax.Array, ...],
        image_hw: tuple[int, int],
        train: bool = False,
    ) -> jax.Array:
        x_pool, x1, x2, x3, x4 = skips
        x = self._resize(x4, (x3.shape[1], x3.shape[2]))
        stage_skips = [x3, x2, x1, x_pool, None]
        for i, n_convs in enumerate(self.layers_nums):
            for _ in range(n_convs):
                x = Conv(_DEC_CHANNELS[i], kernel=3, use_bias=self.use_bias)(x)
                x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
                x = nn.relu(x)
            skip = stage_skips[i]
            if skip is not None:
                if i > 0:
                    x = self._resize(x, (skip.shape[1], skip.shape[2]))
                x = jnp.concatenate([x, skip], axis=-1)
            else:
                x = self._resize(x, image_hw)
        x = Conv(self.out_channels, kernel=3, use_bias=self.use_bias)(x)
        x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        if self.out_activation == "ReLU":
            x = nn.relu(x)
        elif self.out_activation == "Sigmoid":
            x = nn.sigmoid(x)
        elif self.out_activation == "Tanh":
            x = nn.tanh(x)
        if self.normalize_output:
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )
        return x


class SharpNet(nn.Module):
    use_depth: bool = True
    use_normals: bool = False
    use_boundary: bool = False
    bias_decoder: bool = True
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self, x_img: jax.Array, train: bool = False
    ) -> dict[str, jax.Array]:
        enc = ResNetEncoder(
            config=RESNET_PRESETS["sharpnet_resnet50"], frozen_bn=self.frozen_bn
        )
        stem_act, x1, x2, x3, x4 = enc(x_img, train=train)
        x_pool = max_pool(stem_act, 3, 2, padding=1)
        skips = (x_pool, x1, x2, x3, x4)
        hw = (x_img.shape[1], x_img.shape[2])

        outs: dict[str, jax.Array] = {}
        if self.use_depth:
            outs["depth"] = SharpNetDecoder(
                1,
                layers_nums=(6, 6, 2, 2, 2),
                out_activation="ReLU",
                use_bias=self.bias_decoder,
                frozen_bn=self.frozen_bn,
            )(skips, hw, train=train)
        if self.use_normals:
            outs["normals"] = SharpNetDecoder(
                3,
                layers_nums=(4, 4, 2, 2, 2),
                out_activation="Tanh",
                normalize_output=True,
                use_bias=self.bias_decoder,
                frozen_bn=self.frozen_bn,
            )(skips, hw, train=train)
        if self.use_boundary:
            outs["boundary"] = SharpNetDecoder(
                1,
                layers_nums=(2, 2, 2, 2, 2),
                out_activation="Sigmoid",
                interpolation="nearest",
                use_bias=self.bias_decoder,
                frozen_bn=self.frozen_bn,
            )(skips, hw, train=train)
        return outs
