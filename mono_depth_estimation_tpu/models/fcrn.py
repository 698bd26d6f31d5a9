"""FCRN / Laina up-projection depth network (Flax, NHWC).

Capability parity with /root/reference/network/FCRN.py:296-371: ResNet
encoder -> 1x1 conv halving channels -> 4 up-stages (each halving channels,
doubling resolution) -> 3x3 conv to out_channels -> align-corners bilinear
resize to output_size -> sigmoid.

All four reference decoder flavors are available (FCRN.py:282-294):
deconv2/deconv3 (strided transpose conv), upconv (zero-unpool + 5x5 conv),
upproj (two-branch residual up-projection, FCRN.py:167-205), fasterupproj
(the pixel-shuffle rewrite, FCRN.py:208-279).

TPU note: zero-unpool followed by a KxK conv wastes 3/4 of the MXU work on
zeros; ``fused_upproj`` in ops/upproj.py computes the same function as four
phase-convs + depth-to-space (the FasterUpProj identity) and is the default
compute path for the 'upproj' flavor when ``fuse=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import (
    BatchNorm,
    Conv,
    ConvTranspose,
    pixel_shuffle,
)
from mono_depth_estimation_tpu.ops.upproj import upproj_conv
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.resize import resize_bilinear


class UnpoolConv(nn.Module):
    """conv2d(zero_unpool(x), w) computed via the phase-decomposed fused
    up-projection (ops/upproj.py) — same math as the reference's
    unpool + KxK conv (FCRN.py:31-44,94-111) at ~1/4 the MXU work and with
    no zero-stuffed intermediate in HBM. Param layout matches Conv (HWIO
    'kernel') so the torch-weight converter is unchanged."""

    out_features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.out_features),
        )
        return upproj_conv(x, w.astype(x.dtype))


class UpConvModule(nn.Module):
    """unpool -> 5x5 conv -> BN -> ReLU (FCRN.py:94-111), fused."""

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = UnpoolConv(self.out_features, kernel=5)(x)
        x = BatchNorm()(x, train=train)
        return nn.relu(x)


class UpProjModule(nn.Module):
    """Two-branch up-projection (FCRN.py:167-197), fused.

    upper: unpool+5x5 conv -> BN -> ReLU -> 3x3 conv -> BN
    lower: unpool+5x5 conv -> BN;  output = ReLU(upper + lower)
    """

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a = UnpoolConv(self.out_features, kernel=5)(x)
        a = BatchNorm()(a, train=train)
        a = nn.relu(a)
        a = Conv(self.out_features, kernel=3, padding=1)(a)
        a = BatchNorm()(a, train=train)
        b = UnpoolConv(self.out_features, kernel=5)(x)
        b = BatchNorm()(b, train=train)
        return nn.relu(a + b)


class FasterUpConv(nn.Module):
    """Pixel-shuffle up-convolution (FCRN.py:113-164): four phase convs
    (3x3, 2x3, 3x2, 2x2) with interleave-shuffle — identical function to
    unpool+5x5 at 1/4 the FLOPs, and the layout TPU likes."""

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pads = [((1, 1), (1, 1)), ((0, 1), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 1))]
        kernels = [(3, 3), (2, 3), (3, 2), (2, 2)]
        outs = []
        for (kh, kw), pad in zip(kernels, pads):
            y = nn.Conv(
                self.out_features,
                (kh, kw),
                padding=list(pad),
                use_bias=True,
                dtype=x.dtype,
            )(x)
            y = BatchNorm()(y, train=train)
            outs.append(y)
        return pixel_shuffle(jnp.concatenate(outs, axis=-1), 2)


class FasterUpProjModule(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a = FasterUpConv(self.out_features)(x, train=train)
        a = nn.relu(a)
        a = Conv(self.out_features, kernel=3, padding=1)(a)
        a = BatchNorm()(a, train=train)
        b = FasterUpConv(self.out_features)(x, train=train)
        return nn.relu(a + b)


class DeConvModule(nn.Module):
    out_features: int
    kernel: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel
        x = ConvTranspose(
            self.out_features,
            kernel=k,
            stride=2,
            padding=(k - 1) // 2,
            output_padding=k % 2,
            use_bias=False,
        )(x)
        x = BatchNorm()(x, train=train)
        return nn.relu(x)


_DECODER_MODULES = {
    "upconv": lambda c, _k: UpConvModule(c),
    "upproj": lambda c, _k: UpProjModule(c),
    "fasterupproj": lambda c, _k: FasterUpProjModule(c),
    "deconv2": lambda c, _k: DeConvModule(c, 2),
    "deconv3": lambda c, _k: DeConvModule(c, 3),
}


class FCRN(nn.Module):
    """ResNet-encoder up-projection depth net (reference 'laina' method).

    out_channels defaults to 20 for the stdepth pipeline, matching
    modules/laina.py:14-15 of the reference.
    """

    layers: int = 50
    decoder: str = "upproj"
    output_size: tuple[int, int] = (228, 304)
    out_channels: int = 20

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.decoder not in _DECODER_MODULES:
            raise ValueError(f"invalid decoder: {self.decoder}")
        enc = ResNetEncoder(config=RESNET_PRESETS[f"resnet{self.layers}"])
        feats = enc(x, train=train)
        x = feats[-1]
        num_channels = 512 if self.layers <= 34 else 2048

        x = Conv(num_channels // 2, kernel=1)(x)
        x = BatchNorm()(x, train=train)

        make = _DECODER_MODULES[self.decoder]
        c = num_channels // 2
        for _ in range(4):
            c //= 2
            x = make(c, None)(x, train=train)

        x = Conv(self.out_channels, kernel=3, padding=1)(x)
        x = resize_bilinear(x, self.output_size, align_corners=True)
        return nn.sigmoid(x)
