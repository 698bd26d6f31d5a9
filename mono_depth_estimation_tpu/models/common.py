"""Shared building blocks for the Flax model zoo.

Design notes (TPU-first, not a translation of the reference):

* All tensors are NHWC — the layout XLA:TPU tiles onto the MXU without
  transposes. The reference is NCHW; converters live at the IO boundary.
* BatchNorm supports a ``frozen`` mode covering the reference's
  "BN as frozen TF" trick (modules/bts.py:19-24,56-59 in the reference):
  running statistics are used in both train and eval and never updated.
* Convolutions carry explicit torch-compatible padding so converted
  torchvision weights reproduce reference activations exactly.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.ops.upconv import upconv_nearest_conv


def torch_pad(kernel: int, dilation: int = 1) -> tuple[int, int]:
    """torch Conv2d padding=k//2*d as an explicit (lo, hi) pair."""
    p = (kernel // 2) * dilation
    return (p, p)


class Conv(nn.Module):
    """3x3/1x1-style conv with torch-compatible explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    padding: int | str | None = None  # None -> torch 'same-ish' k//2*d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.padding is None:
            pad = [torch_pad(self.kernel, self.dilation)] * 2
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=x.dtype,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with an extra ``frozen`` mode (running stats, no updates).

    * train=True, frozen=False  -> batch stats, update running stats.
    * train=False               -> running stats.
    * frozen=True               -> running stats even in training and no
      stat updates — the reference's "TF-style frozen BN" used by BTS when
      ``bn_no_track_stats`` is set. Freezing the affine scale/bias is the
      optimizer's job (optax mask in the module layer), matching the
      reference's requires_grad=False approach.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_running = (not train) or self.frozen
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=x.dtype,
        )(x)


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Callable | None = nn.relu
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(
            self.features,
            kernel=self.kernel,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
        )(x)
        x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d semantics via input dilation + regular conv.

    out = (in - 1)*stride - 2*padding + kernel + output_padding.
    Implemented as lhs-dilated convolution — the form XLA:TPU maps onto the
    MXU directly (no scatter). The kernel is stored HWIO for the dilated
    conv; the torch-weight converter flips deconv kernels spatially and
    swaps I/O to match.
    """

    features: int
    kernel: int
    stride: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[pad, pad],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + b.astype(y.dtype)
        return y


def zero_unpool(x: jax.Array, stride: int = 2) -> jax.Array:
    """FCRN 'Unpool': 2x2 zero-stuffing upsample — x lands at the top-left of
    each stride x stride cell (network/FCRN.py:31-44 semantics, without the
    grouped deconv trick)."""
    b, h, w, c = x.shape
    out = jnp.zeros((b, h, stride, w, stride, c), x.dtype)
    out = out.at[:, :, 0, :, 0, :].set(x)
    return out.reshape(b, h * stride, w * stride, c)


def max_pool(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    """torch MaxPool2d semantics (explicit symmetric padding with -inf)."""
    pads = ((padding, padding), (padding, padding))
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=pads
    )


def avg_pool(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    pads = ((padding, padding), (padding, padding))
    return nn.avg_pool(
        x, (window, window), strides=(stride, stride), padding=pads
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, the cheap TPU-friendly path."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _FusedUpConvKernel(nn.Module):
    """Owns the 3x3 kernel (and optional bias) under the exact names, shapes
    and inits ``nn.Conv`` would give them, but applies the conv as the fused
    input-dilated form (ops/upconv.py) — no 4x-upsampled intermediate in HBM."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        y = upconv_nearest_conv(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


class FusedUpConv(nn.Module):
    """``upsample2x_nearest`` + ``Conv(features, kernel=3, padding=1)`` as ONE
    input-dilated convolution (exact; ops/upconv.py — 1.4-2.1x measured on the
    BTS-512 decoder shapes, kernel_bench.json).

    The parameter tree matches what a direct ``Conv`` child would have
    produced (``<name>/Conv_0/{kernel,bias}``) so checkpoints and the torch
    converter are unaffected; pass ``name="Conv_N"`` at the call site to pin
    the auto-name the plain ``Conv`` used to get.
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _FusedUpConvKernel(
            self.features, self.use_bias, name="Conv_0"
        )(x)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space (torch PixelShuffle) in NHWC.

    Matches torch.nn.PixelShuffle channel ordering on NCHW tensors whose
    channels were converted to NHWC: input channels are (C*r*r) laid out as
    (C, r, r) in torch order.
    """
    b, h, w, crr = x.shape
    r = factor
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)
