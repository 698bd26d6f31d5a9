"""MiDaS v2 — RefineNet-style fusion depth network (Flax, NHWC).

Capability parity with /root/reference/network/MiDaS.py:25-229:

* encoder: ResNeXt101-32x8d (the WSL architecture; MiDaS.py:89-111) with
  layer1..4 taps.
* scratch: per-tap 3x3 projections to ``features`` channels (MiDaS.py:114-129).
* 4 FeatureFusionBlocks (two ResidualConvUnits + add + align-corners 2x
  upsample, MiDaS.py:163-229).
* output head conv(128) -> 2x bilinear (align_corners=False) -> conv(32) ->
  ReLU -> 1x1 conv(out_channels) -> sigmoid. The reference head emits
  7 channels — its stdepth variant of MiDaS (MiDaS.py:49-57); upstream
  MiDaS uses 1. ``out_channels`` covers both.

This is a self-contained reimplementation; no torch.hub dependency
(reference loads the hub model at modules/midas.py:12,40 — SURVEY §7 hard
part 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import Conv
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.resize import resize_bilinear


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.relu(x)
        out = Conv(self.features, kernel=3, use_bias=True)(out)
        out = nn.relu(out)
        out = Conv(self.features, kernel=3, use_bias=True)(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Reference quirk kept for weight parity: MiDaS.py:183 builds its
    ResidualConvUnit with ``nn.ReLU(inplace=True)``, so ``out = relu(x)``
    at MiDaS.py:191 MUTATES the residual input and the unit actually
    computes ``conv_path(relu(x)) + relu(x)`` — i.e. the clean RCU applied
    to relu(x). Released/reference-trained MiDaS weights implement exactly
    that function, so we pre-relu here instead of copying the in-place
    behavior. (MyNet's vendored copy uses inplace=False, MyNet.py:219 —
    its FusionRefine keeps the clean RCU.)"""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None = None) -> jax.Array:
        # Both RCUs exist as parameters even when skip is None, matching the
        # reference's module structure for checkpoint compatibility.
        rcu1 = ResidualConvUnit(self.features)
        rcu2 = ResidualConvUnit(self.features)
        out = x
        if skip is not None:
            out = out + rcu1(nn.relu(skip))
        else:
            _ = rcu1(jnp.zeros_like(out))  # materialize params, fold away
        out = rcu2(nn.relu(out))
        h, w = out.shape[1] * 2, out.shape[2] * 2
        return resize_bilinear(out, (h, w), align_corners=True)


class MidasNet(nn.Module):
    features: int = 256
    out_channels: int = 7
    backbone: str = "resnext101_wsl"
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        enc = ResNetEncoder(
            config=RESNET_PRESETS[self.backbone], frozen_bn=self.frozen_bn
        )
        _, l1, l2, l3, l4 = enc(x, train=train)

        rn = [Conv(self.features, kernel=3)(t) for t in (l1, l2, l3, l4)]

        path = FeatureFusionBlock(self.features)(rn[3])
        path = FeatureFusionBlock(self.features)(path, rn[2])
        path = FeatureFusionBlock(self.features)(path, rn[1])
        path = FeatureFusionBlock(self.features)(path, rn[0])

        out = Conv(128, kernel=3, use_bias=True)(path)
        out = resize_bilinear(
            out, (out.shape[1] * 2, out.shape[2] * 2), align_corners=False
        )
        out = Conv(32, kernel=3, use_bias=True)(out)
        out = nn.relu(out)
        out = Conv(self.out_channels, kernel=1, use_bias=True)(out)
        return nn.sigmoid(out)
