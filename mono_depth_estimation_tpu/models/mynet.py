"""MyNet — the reference author's multi-branch experiment (Flax, NHWC).

Capability parity with /root/reference/network/MyNet.py:17-283: a BTS-style
encoder feeds three parallel branches — GlobalConsistency (MyNet.py:17-32),
Details (pixel-shuffle mixing, MyNet.py:34-54), Sharpness (transpose-conv
fusion of the deep taps, MyNet.py:56-83) — whose depth maps are blended by
learned scalar weights (Weighter, MyNet.py:85-114); a *shared* get_depth
head (upsample + conv + sigmoid) maps each branch to depth; final output is
(g*a + d*b + s*c)/3 * 10 (MyNet.py:145-154).

The per-branch refinement blocks are MiDaS FeatureFusionBlocks without the
final upsample (MyNet.py:235-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.bts import BTS_ENCODERS, bts_feat_channels
from mono_depth_estimation_tpu.models.common import (
    BatchNorm,
    Conv,
    ConvTranspose,
    FusedUpConv,
    pixel_shuffle,
    upsample2x_nearest,
)
from mono_depth_estimation_tpu.models.encoders.densenet import (
    DENSENET_PRESETS,
    DenseNetEncoder,
)
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.models.midas import ResidualConvUnit


class ELUBNConv(nn.Module):
    """ELU -> BN(in) -> conv (MyNet.py:4-15; note BN precedes the conv and
    normalizes the *input* channels)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.elu(x)
        x = BatchNorm()(x, train=train)
        return Conv(
            self.features, kernel=self.kernel, stride=self.stride,
            padding=self.padding,
        )(x)


def adaptive_max_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """AdaptiveMaxPool2d for integer downscale ratios (the only shapes the
    reference exercises, MyNet.py:21,27-28)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = out_hw
    if (h, w) == (th, tw):
        return x
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    kh, kw = h // th, w // tw
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class FusionRefine(nn.Module):
    """FeatureFusionBlock without upsample (MyNet.py:235-265, single input:
    only resConfUnit2 runs, but resConfUnit1 params exist for ckpt parity)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rcu1 = ResidualConvUnit(self.features)
        _ = rcu1(jnp.zeros_like(x))  # params only; folded away by XLA
        return ResidualConvUnit(self.features)(x)


class GlobalConsistency(nn.Module):
    channels: int
    input_size: tuple[int, int]
    out_feat: int = 64

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array, train: bool = False):
        target = (self.input_size[0] // 2, self.input_size[1] // 2)
        x1 = upsample2x_nearest(x1)
        x0 = adaptive_max_pool(x0, target)
        x1 = adaptive_max_pool(x1, target)
        x = jnp.concatenate([x0, x1], axis=-1)
        x = ELUBNConv(self.channels // 2)(x, train=train)
        return ELUBNConv(self.out_feat)(x, train=train)


class Details(nn.Module):
    channels: int
    scale: int = 2
    out_feat: int = 64

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array, train: bool = False):
        c = self.channels // (self.scale * self.scale)
        x0 = pixel_shuffle(x0, self.scale)
        x0 = ELUBNConv(c * 2, stride=2)(x0, train=train)
        x1 = pixel_shuffle(x1, self.scale)
        x = jnp.concatenate([x0, x1], axis=-1)
        x = ELUBNConv(c * 2)(x, train=train)
        x = ELUBNConv(c)(x, train=train)
        x = ELUBNConv(self.out_feat)(x, train=train)
        return upsample2x_nearest(x)


class Sharpness(nn.Module):
    feat_sizes: tuple[int, int, int]  # encoder taps 2..4
    out_feat: int = 64

    @nn.compact
    def __call__(self, x0, x1, x2, train: bool = False):
        _, feat1, feat2 = self.feat_sizes
        x1 = ConvTranspose(feat1 // 2, kernel=4, stride=2, padding=1)(x1)
        x2 = ConvTranspose(feat2 // 4, kernel=4, stride=2, padding=1)(x2)
        x2 = ConvTranspose(feat2 // 8, kernel=4, stride=2, padding=1)(x2)
        x = jnp.concatenate([x0, x1, x2], axis=-1)
        # upsample+conv pairs fused into input-dilated convs (ops/upconv.py);
        # names pinned so the param tree stays Conv_{0,1}/Conv_0/{kernel,bias}
        x = FusedUpConv(self.out_feat * 2, use_bias=True, name="Conv_0")(x)
        x = nn.relu(x)
        x = FusedUpConv(self.out_feat, use_bias=True, name="Conv_1")(x)
        return nn.relu(x)


class Weighter(nn.Module):
    """Shared conv+MLP scoring each branch to a sigmoid scalar
    (MyNet.py:85-114)."""

    input_size: tuple[int, int]
    in_feat: int = 64

    @nn.compact
    def __call__(self, branches, train: bool = False):
        conv = ELUBNConv(self.in_feat // 2, stride=2)
        mlp = nn.Dense(1)
        outs = []
        for x in branches:
            y = conv(x, train=train)
            b, h, w, c = y.shape
            # torch flattens (C, H*W); NHWC transpose keeps channel rows
            y = y.transpose(0, 3, 1, 2).reshape(b, c, h * w)
            y = mlp(y)  # (B, C, 1)
            y = jnp.sum(y, axis=1)  # (B, 1)
            outs.append(nn.sigmoid(y))
        return tuple(outs)


class MyModel(nn.Module):
    input_size: tuple[int, int] = (384, 384)
    encoder_version: str = "densenet161_bts"
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
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
        fc = bts_feat_channels(self.encoder_version)
        skip0, skip1, skip2, skip3 = feats[0], feats[1], feats[2], feats[3]
        dense = nn.relu(feats[4])

        x0 = FusionRefine(fc[0])(skip0)
        x1 = FusionRefine(fc[1])(skip1)
        x2 = FusionRefine(fc[2])(skip2)
        x3 = FusionRefine(fc[3])(skip3)

        glob = GlobalConsistency(fc[0] + fc[1], self.input_size)(
            x0, x1, train=train
        )
        detail = Details(fc[1])(x1, x2, train=train)
        sharp = Sharpness(tuple(fc[2:5]))(x2, x3, dense, train=train)

        # weighter params before the head — matches the torch registration
        # order (MyNet.py:129-131) so the sequential weight converter aligns
        a, b, c = Weighter(self.input_size)((glob, detail, sharp), train=train)

        # shared depth head (MyNet.py:131,145-147); the upsample+conv is one
        # fused input-dilated conv, params shared across the three branches
        head_conv = FusedUpConv(1, name="Conv_0")

        def get_depth(feat):
            return nn.sigmoid(head_conv(feat))

        glob_d = get_depth(glob)
        detail_d = get_depth(detail)
        sharp_d = get_depth(sharp)
        depth = (
            glob_d * a[:, None, None]
            + detail_d * b[:, None, None]
            + sharp_d * c[:, None, None]
        )
        return depth / 3.0 * 10.0
