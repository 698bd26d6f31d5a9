"""BTS — From Big to Small: local planar guidance depth network (Flax, NHWC).

Capability parity with /root/reference/network/Bts.py:148-333:

* encoder: DenseNet/ResNet/ResNeXt with five skip taps (Bts.py:280-322).
* decoder: nearest-2x upconvs with ELU, dense-ASPP (dilations 3/6/12/18/24
  with progressive concatenation, Bts.py:167-173,214-225), sphere-param
  plane heads (reduction_1x1, Bts.py:83-122), and local planar guidance at
  8x/4x/2x (ops/lpg.py) whose depth maps re-enter the decoder as features.
* stdepth image-residual head for out_channels==10 (Bts.py:265-272).
* KITTI focal scaling (Bts.py:275-276).

forward returns the reference 5-tuple
(depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled, reduc1x1, final)
— consumers take [4] (reference modules/bts.py:98-100).

Decoder BatchNorms use momentum 0.01 / eps 1.1e-5 like the reference; note
flax momentum is the decay factor (torch momentum m == flax momentum 1-m).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, FusedUpConv
from mono_depth_estimation_tpu.models.encoders.densenet import (
    DENSENET_PRESETS,
    DenseNetEncoder,
)
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.lpg import (
    local_planar_guidance,
    normalize_plane_eq,
    plane_eq_from_params,
)
from mono_depth_estimation_tpu.ops.resize import resize_nearest

BTS_ENCODERS = {
    "densenet121_bts": ("densenet", "densenet121"),
    "densenet161_bts": ("densenet", "densenet161"),
    "resnet50_bts": ("resnet", "resnet50"),
    "resnet101_bts": ("resnet", "resnet101"),
    "resnext50_bts": ("resnet", "resnext50_32x4d"),
    "resnext101_bts": ("resnet", "resnext101_32x8d"),
}


def bts_feat_channels(encoder_version: str) -> list[int]:
    family, name = BTS_ENCODERS[encoder_version]
    if family == "densenet":
        return DENSENET_PRESETS[name].feat_channels
    return RESNET_PRESETS[name].feat_channels


class _DecoderBN(nn.Module):
    """BTS decoder BatchNorm: torch momentum 0.01, eps 1.1e-5."""

    frozen: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        return BatchNorm(momentum=0.99, epsilon=1.1e-5, frozen=self.frozen)(
            x, train=train
        )


class UpConvELU(nn.Module):
    """nearest-2x upsample + 3x3 conv + ELU (Bts.py:69-80), computed as one
    fused input-dilated conv (exact; ops/upconv.py) — 1.4-2.1x measured on
    the flagship decoder shapes; no 4x-upsampled intermediate in HBM."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.elu(FusedUpConv(self.features, name="Conv_0")(x))


class AtrousConv(nn.Module):
    """[BN] -> ReLU -> 1x1 conv (2C) -> BN -> ReLU -> 3x3 dilated conv (C)
    (Bts.py:51-66)."""

    features: int
    dilation: int
    apply_bn_first: bool = True
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.apply_bn_first:
            x = BatchNorm(momentum=0.99, epsilon=1.1e-5, frozen=self.frozen_bn)(
                x, train=train
            )
        x = nn.relu(x)
        x = Conv(self.features * 2, kernel=1)(x)
        x = BatchNorm(momentum=0.99, frozen=self.frozen_bn)(x, train=train)
        x = nn.relu(x)
        return Conv(self.features, kernel=3, dilation=self.dilation)(x)


class Reduction1x1(nn.Module):
    """Stack of 1x1 conv + ELU halving channels down to the plane head
    (Bts.py:83-122). is_final=True ends in a sigmoid'd single channel."""

    num_out_filters: int
    max_depth: float
    is_final: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_out = self.num_out_filters
        while n_out >= 4:
            if n_out < 8:
                if self.is_final:
                    x = Conv(1, kernel=1)(x)
                    return nn.sigmoid(x)
                raw = Conv(3, kernel=1)(x)
                return plane_eq_from_params(raw, self.max_depth)
            x = Conv(n_out, kernel=1)(x)
            x = nn.elu(x)
            n_out = n_out // 2
        return x


class BtsDecoder(nn.Module):
    max_depth: float
    feat_channels: tuple[int, ...]
    num_features: int = 512
    out_channels: int = 20
    image_residuals: bool = False
    dataset: str = "nyu"
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self,
        features: tuple[jax.Array, ...],
        focal: jax.Array | float,
        inp: jax.Array | None = None,
        train: bool = False,
    ):
        nf = self.num_features
        skip0, skip1, skip2, skip3 = features[0], features[1], features[2], features[3]
        dense = nn.relu(features[4])
        bn = lambda: _DecoderBN(frozen=self.frozen_bn)

        up5 = bn()(UpConvELU(nf)(dense), train=train)  # H/16
        iconv5 = nn.elu(Conv(nf, kernel=3)(jnp.concatenate([up5, skip3], -1)))

        up4 = bn()(UpConvELU(nf // 2)(iconv5), train=train)  # H/8
        concat4 = jnp.concatenate([up4, skip2], -1)
        iconv4 = nn.elu(Conv(nf // 2, kernel=3)(concat4))
        iconv4 = bn()(iconv4, train=train)

        d3 = AtrousConv(nf // 4, 3, apply_bn_first=False, frozen_bn=self.frozen_bn)(
            iconv4, train=train
        )
        c4_2 = jnp.concatenate([concat4, d3], -1)
        d6 = AtrousConv(nf // 4, 6, frozen_bn=self.frozen_bn)(c4_2, train=train)
        c4_3 = jnp.concatenate([c4_2, d6], -1)
        d12 = AtrousConv(nf // 4, 12, frozen_bn=self.frozen_bn)(c4_3, train=train)
        c4_4 = jnp.concatenate([c4_3, d12], -1)
        d18 = AtrousConv(nf // 4, 18, frozen_bn=self.frozen_bn)(c4_4, train=train)
        c4_5 = jnp.concatenate([c4_4, d18], -1)
        d24 = AtrousConv(nf // 4, 24, frozen_bn=self.frozen_bn)(c4_5, train=train)
        daspp = jnp.concatenate([iconv4, d3, d6, d12, d18, d24], -1)
        daspp_feat = nn.elu(Conv(nf // 4, kernel=3)(daspp))

        plane8 = normalize_plane_eq(
            Reduction1x1(nf // 4, self.max_depth)(daspp_feat)
        )
        depth8 = local_planar_guidance(plane8, 8)[..., None] / self.max_depth
        h8, w8 = depth8.shape[1], depth8.shape[2]
        depth8_ds = resize_nearest(depth8, (h8 // 4, w8 // 4))

        up3 = bn()(UpConvELU(nf // 4)(daspp_feat), train=train)  # H/4
        iconv3 = nn.elu(
            Conv(nf // 4, kernel=3)(jnp.concatenate([up3, skip1, depth8_ds], -1))
        )

        plane4 = normalize_plane_eq(
            Reduction1x1(nf // 8, self.max_depth)(iconv3)
        )
        depth4 = local_planar_guidance(plane4, 4)[..., None] / self.max_depth
        h4, w4 = depth4.shape[1], depth4.shape[2]
        depth4_ds = resize_nearest(depth4, (h4 // 2, w4 // 2))

        up2 = bn()(UpConvELU(nf // 8)(iconv3), train=train)  # H/2
        iconv2 = nn.elu(
            Conv(nf // 8, kernel=3)(jnp.concatenate([up2, skip0, depth4_ds], -1))
        )

        plane2 = normalize_plane_eq(
            Reduction1x1(nf // 16, self.max_depth)(iconv2)
        )
        depth2 = local_planar_guidance(plane2, 2)[..., None] / self.max_depth

        up1 = UpConvELU(nf // 16)(iconv2)  # H
        reduc1x1 = Reduction1x1(nf // 32, self.max_depth, is_final=True)(up1)
        iconv1 = nn.elu(
            Conv(nf // 16, kernel=3)(
                jnp.concatenate([up1, reduc1x1, depth2, depth4, depth8], -1)
            )
        )
        head = nn.sigmoid(Conv(self.out_channels, kernel=3)(iconv1))

        if self.out_channels == 10 and self.image_residuals and inp is not None:
            inp_mean = jnp.mean(inp, axis=-1, keepdims=True)
            front = jnp.clip(head[..., :3] * 2.0 - 1.0 + inp, 0.0, 1.0)
            back = jnp.clip(head[..., 4:7] * 2.0 - 1.0 + inp, 0.0, 1.0)
            fronta = jnp.clip(head[..., 3:4] * 2.0 - 1.0 + inp_mean, 0.0, 1.0)
            backa = jnp.clip(head[..., 7:8] * 2.0 - 1.0 + inp_mean, 0.0, 1.0)
            final = jnp.concatenate([front, fronta, back, backa, head[..., 8:]], -1)
        else:
            final = self.max_depth * head

        if self.dataset == "kitti":
            focal = jnp.asarray(focal, final.dtype)
            final = final * focal.reshape(-1, 1, 1, 1) / 715.0873

        return depth8, depth4, depth2, reduc1x1, final


class BtsModel(nn.Module):
    """Encoder + BTS decoder; reference network/Bts.py:325-333."""

    bts_size: int = 512
    max_depth: float = 10.0
    out_channels: int = 20
    image_residuals: bool = False
    encoder_version: str = "densenet161_bts"
    dataset: str = "nyu"
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        focal: jax.Array | float = 518.8579,
        train: bool = False,
    ):
        family, name = BTS_ENCODERS[self.encoder_version]
        if family == "densenet":
            enc = DenseNetEncoder(
                config=DENSENET_PRESETS[name], frozen_bn=self.frozen_bn
            )
        else:
            enc = ResNetEncoder(
                config=RESNET_PRESETS[name], frozen_bn=self.frozen_bn
            )
        feats = enc(x, train=train)
        return BtsDecoder(
            max_depth=self.max_depth,
            feat_channels=tuple(bts_feat_channels(self.encoder_version)),
            num_features=self.bts_size,
            out_channels=self.out_channels,
            image_residuals=self.image_residuals,
            dataset=self.dataset,
            frozen_bn=self.frozen_bn,
        )(feats, focal, inp=x, train=train)
