"""VNL — depth-as-classification with virtual-normal supervision (Flax, NHWC).

Capability parity with /root/reference/network/VNL.py:

* bottom-up: ResNeXt50/101 stride-16 body or MobileNetV2 stride-8
  (VNL.py:539-669,389-537) via the shared encoders.
* bottom-up top: 5-branch ASPP (1x1 + 3 dilated 3x3 + global pool, all
  BN'd; VNL.py:189-228) for ResNeXt, or a global-pool block for MobileNetV2
  (VNL.py:172-187).
* laterals: FTB blocks (1x1 -> dilated 3x3 residual pair; VNL.py:330-350)
  on res5..res2 (VNL.py:97-170).
* top-down: AFA attention fusion (squeeze-excite over concat, w*lateral+top;
  VNL.py:353-373) + FTB per stage, final stage upsamples to half then full
  input size (VNL.py:376-388), predict head = dilated 3x3 conv ->
  (logit, softmax) over dec_out_c=150 log-depth bins (VNL.py:317-327).

forward returns (logit, softmax), both (B, H, W, C_bins), matching
MetricDepthModel.forward (VNL.py:672-683).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, global_avg_pool
from mono_depth_estimation_tpu.models.encoders.mobilenetv2 import MobileNetV2Encoder
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.resize import resize_bilinear

VNL_ENCODERS = {
    "resnext50_32x4d_body_stride16": ("resnet", "resnext50_32x4d_stride16"),
    "resnext101_32x4d_body_stride16": ("resnet", "resnext101_32x4d_stride16"),
    "mobilenetv2_body_stride8": ("mobilenet", None),
}


class FTBBlock(nn.Module):
    """Feature transformation block (VNL.py:330-350)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(self.features, kernel=1)(x)
        residual = x
        out = Conv(self.features, kernel=3, dilation=2, use_bias=True)(x)
        out = BatchNorm(momentum=0.5)(out, train=train)
        out = nn.relu(out)
        out = Conv(self.features, kernel=3, dilation=2)(out)
        return nn.relu(out + residual)


class AFABlock(nn.Module):
    """Adaptive feature aggregation (VNL.py:353-373)."""

    features: int

    @nn.compact
    def __call__(self, lateral: jax.Array, top: jax.Array) -> jax.Array:
        w = jnp.concatenate([lateral, top], axis=-1)
        w = global_avg_pool(w)
        w = Conv(self.features // 8, kernel=1)(w)
        w = nn.relu(w)
        w = Conv(self.features, kernel=1)(w)
        w = nn.sigmoid(w)
        return w * lateral + top


class ASPPBlock(nn.Module):
    """5-branch ASPP over the coarsest features (VNL.py:189-228)."""

    features: int
    dilate_rates: tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        outs = []
        y = Conv(self.features, kernel=1)(x)
        outs.append(BatchNorm(momentum=0.5)(y, train=train))
        for d in self.dilate_rates:
            y = Conv(self.features, kernel=3, dilation=d)(x)
            outs.append(BatchNorm(momentum=0.5)(y, train=train))
        g = global_avg_pool(x)
        g = Conv(self.features, kernel=1)(g)
        g = BatchNorm(momentum=0.5)(g, train=train)
        g = resize_bilinear(g, (x.shape[1], x.shape[2]), align_corners=True)
        outs.append(g)
        return jnp.concatenate(outs, axis=-1)


class GlobalPoolBlock(nn.Module):
    """MobileNetV2 bottom-up top (VNL.py:172-187): 1x1 conv -> BN -> global
    pool -> broadcast back to the feature size."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = Conv(self.features, kernel=1)(x)
        out = BatchNorm(momentum=0.1)(out, train=train)
        out = global_avg_pool(out)
        return jnp.broadcast_to(
            out, (x.shape[0], x.shape[1], x.shape[2], self.features)
        )


class FCNTopdownBlock(nn.Module):
    features_out: int

    @nn.compact
    def __call__(
        self, lateral: jax.Array, top: jax.Array, train: bool = False
    ) -> jax.Array:
        if lateral.shape[1:3] != top.shape[1:3]:
            top = resize_bilinear(
                top, (lateral.shape[1], lateral.shape[2]), align_corners=True
            )
        out = AFABlock(lateral.shape[-1])(lateral, top)
        return FTBBlock(self.features_out)(out, train=train)


class MetricDepthModel(nn.Module):
    """VNL top model (VNL.py:672-693)."""

    encoder: str = "resnext50_32x4d_body_stride16"
    enc_dim_out: tuple[int, ...] = (512, 256, 256, 256)
    dec_dim_in: tuple[int, ...] = (512, 256, 256, 256, 256, 256)
    dec_dim_out: tuple[int, ...] = (256, 256, 256, 256, 256)
    dec_out_c: int = 150
    crop_size: tuple[int, int] = (385, 385)
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        h, w = x.shape[1], x.shape[2]
        family, preset = VNL_ENCODERS[self.encoder]
        if family == "mobilenet":
            taps = MobileNetV2Encoder(output_stride=8, frozen_bn=self.frozen_bn)(
                x, train=train
            )
        else:
            taps = ResNetEncoder(
                config=RESNET_PRESETS[preset], frozen_bn=self.frozen_bn
            )(x, train=train)
        # res2..res5 = taps[1..4]; top operates on res5.
        res5 = taps[4]
        if family == "mobilenet":
            top_feat = GlobalPoolBlock(self.enc_dim_out[0])(res5, train=train)
            n_branches = 1
        else:
            dilation = (4, 8, 12) if "stride_8" in self.encoder else (2, 4, 6)
            top_feat = ASPPBlock(self.enc_dim_out[0], dilation)(res5, train=train)
            n_branches = 5

        laterals = [top_feat]
        for i, tap in enumerate((taps[4], taps[3], taps[2], taps[1])):
            laterals.append(FTBBlock(self.enc_dim_out[i])(tap, train=train))

        stage_sizes = [
            (math.ceil(h / 2.0**k), math.ceil(w / 2.0**k)) for k in range(5, 0, -1)
        ] + [(h, w)]

        # top: 1x1 conv + BN over the (possibly multi-branch) top features.
        # NOTE (parity): the reference passes 0.5 POSITIONALLY to
        # BatchNorm2d (VNL.py:255-258) — that's eps=0.5, not momentum.
        t = Conv(self.dec_dim_in[0], kernel=1)(laterals[0])
        t = BatchNorm(epsilon=0.5)(t, train=train)

        for i in range(4):
            t = FCNTopdownBlock(self.dec_dim_out[i])(laterals[i + 1], t, train=train)

        # fcn_last_block (VNL.py:376-388)
        t = resize_bilinear(t, stage_sizes[4], align_corners=True)
        t = FTBBlock(self.dec_dim_out[4])(t, train=train)
        t = resize_bilinear(t, stage_sizes[5], align_corners=True)

        # predict head (VNL.py:317-327)
        logit = Conv(self.dec_out_c, kernel=3, dilation=2, use_bias=True)(t)
        return logit, jax.nn.softmax(logit, axis=-1)
