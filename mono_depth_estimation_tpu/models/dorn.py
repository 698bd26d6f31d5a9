"""DORN — deep ordinal regression network (Flax, NHWC).

Capability parity with /root/reference/network/Dorn.py:

* deep-stem dilated ResNet-101 backbone (Dorn.py:230-285; output stride 8)
* SceneUnderstandingModule: FullImageEncoder (avgpool -> FC 512 -> 1x1 conv,
  Dorn.py:56-80) + 3 dilated ASPP branches + 1x1 branch, concat 2560ch ->
  2*ord_num logits upsampled (align-corners bilinear) to input size
  (Dorn.py:83-128)
* OrdinalRegressionLayer: pairwise softmax over (even, odd) channel pairs,
  P(l > k) = softmax[..1..]; decoded label = sum(P > 0.5) (Dorn.py:288-321).

TPU notes: the pairwise softmax is computed as a numerically-stable sigmoid
of the logit difference — identical math (softmax over 2 classes), one
fused VPU op instead of reshape+softmax+slice. Decode is a sum-reduce over
the ordinal axis. Dropout is interface-compatible (deterministic=not train).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import Conv, avg_pool
from mono_depth_estimation_tpu.models.encoders.resnet import (
    RESNET_PRESETS,
    ResNetEncoder,
)
from mono_depth_estimation_tpu.ops.resize import resize_bilinear


class ConvRelu(nn.Module):
    """conv_bn_relu with batchNorm=False (Dorn.py:37-53): conv (bias) + ReLU."""

    features: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.dilation if self.dilation > 1 else (self.kernel // 2)
        x = Conv(
            self.features,
            kernel=self.kernel,
            dilation=self.dilation,
            padding=pad,
            use_bias=True,
        )(x)
        return nn.relu(x)


class FullImageEncoder(nn.Module):
    """Global context head (Dorn.py:56-80)."""

    feat_h: int  # input-size H // 8
    feat_w: int
    kernel_size: int
    dropout_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        h = self.feat_h // k + 1
        w = self.feat_w // k + 1
        x = avg_pool(x, k, k, padding=k // 2)
        x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)  # (B, h*w*2048) NHWC order
        x = nn.Dense(512)(x)
        x = nn.relu(x)
        x = x.reshape(-1, 1, 1, 512)
        return Conv(512, kernel=1, use_bias=True)(x)

    @staticmethod
    def flat_dim(feat_h: int, feat_w: int, kernel_size: int) -> int:
        return 2048 * (feat_h // kernel_size + 1) * (feat_w // kernel_size + 1)


class SceneUnderstandingModule(nn.Module):
    """ASPP + global-context fusion -> 2*ord_num logits (Dorn.py:83-128).

    LAYOUT HAZARD: the returned logits are in the halves layout
    [A_0..A_K, B_0..B_K] (deinterleaved before the full-res upsample for
    speed), NOT the reference's interleaved (A_k, B_k) pairing — decode
    with ``ordinal_regression(..., interleaved=False)``. Both layouts have
    the same shape, so a mismatch decodes garbage with no shape error.
    """

    ord_num: int
    size: tuple[int, int]
    kernel_size: int = 16
    pyramid: tuple[int, int, int] = (4, 8, 12)
    dropout_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        g = FullImageEncoder(
            self.size[0] // 8, self.size[1] // 8, self.kernel_size, self.dropout_prob
        )(x, train=train)
        g = resize_bilinear(g, (h, w), align_corners=True)

        b1 = ConvRelu(512, kernel=1)(x)
        b1 = ConvRelu(512, kernel=1)(b1)
        branches = [g, b1]
        for d in self.pyramid:
            b = ConvRelu(512, kernel=3, dilation=d)(x)
            b = ConvRelu(512, kernel=1)(b)
            branches.append(b)

        out = jnp.concatenate(branches, axis=-1)  # 2560 ch
        out = nn.Dropout(self.dropout_prob, deterministic=not train)(out)
        out = ConvRelu(2048, kernel=1)(out)
        out = nn.Dropout(self.dropout_prob, deterministic=not train)(out)
        out = Conv(int(self.ord_num * 2), kernel=1, use_bias=True)(out)
        # Deinterleave the (A_k, B_k) channel pairs BEFORE the full-resolution
        # upsample: per-channel bilinear resize commutes with channel
        # permutation bit-exactly, and the stride-2 gather runs on the 33x45
        # grid instead of the 257x353 one, where the lane-dim shuffle cost
        # ~5 ms/batch at ~0% MFU (profile_dorn.json 'head_only'). Output
        # layout is therefore [A_0..A_K, B_0..B_K] halves, not interleaved.
        out = jnp.concatenate([out[..., 0::2], out[..., 1::2]], axis=-1)
        return resize_bilinear(out, self.size, align_corners=True)


def ordinal_regression(
    logits: jax.Array, *, interleaved: bool
) -> tuple[jax.Array, jax.Array]:
    """(B, H, W, 2K) logits -> (decoded labels (B,H,W,1), P(l>k) (B,H,W,K)).

    Matches Dorn.py:288-321: channels alternate (A_k, B_k); prob = softmax
    over the clamped pair, taken at index 1. Computed as
    sigmoid(clip(B) - clip(A)) — exactly softmax([A,B])[1].

    ``interleaved`` is REQUIRED keyword-only (ADVICE r3 #2): the two layouts
    have identical shapes, so a wrong guess silently mis-pairs (A_k, B_k)
    and decodes garbage with no shape error. ``interleaved=True`` reads the
    reference's alternating layout; ``interleaved=False`` reads the
    [A_0..A_K, B_0..B_K] halves layout that SceneUnderstandingModule emits
    (deinterleaved pre-resize; contiguous half slices cost nothing on the
    lane dimension at full resolution).
    """
    if interleaved:
        a_raw, b_raw = logits[..., 0::2], logits[..., 1::2]
    else:
        k = logits.shape[-1] // 2
        a_raw, b_raw = logits[..., :k], logits[..., k:]
    a = jnp.clip(a_raw, 1e-8, 1e4)
    b = jnp.clip(b_raw, 1e-8, 1e4)
    prob = jax.nn.sigmoid(b - a)
    label = jnp.sum((prob > 0.5).astype(jnp.int32), axis=-1, keepdims=True)
    return label, prob


class DORN(nn.Module):
    ord_num: int = 68
    input_size: tuple[int, int] = (257, 353)
    kernel_size: int = 16
    pyramid: tuple[int, int, int] = (4, 8, 12)
    dropout_prob: float = 0.5
    frozen_bn: bool = False
    # GPipe over the 22 identical dilated blocks of layer3 (the backbone's
    # FLOPs bulk) — see ResNetEncoder.pipeline_stages; eval-only, exposed
    # via the CLI --pipeline_stages flag.
    pipeline_stages: int = 0
    pipeline_mesh: Any = None
    pipeline_microbatches: int = 4

    @nn.compact
    def __call__(
        self, image: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (decoded label (B,H,W,1), prob P(l>k) (B,H,W,K)).

        The reference DORN.forward names its outputs (prob, label) but the
        regression layer actually returns (decode_c, ord_c1) = (label, prob)
        (Dorn.py:288-321,344-348), and the module consumes them as
        ``pred_d, pred_ord = self(x)`` (modules/dorn.py:159). We match the
        actual semantics: label first, prob second."""
        enc = ResNetEncoder(
            config=RESNET_PRESETS["dorn_resnet101"], frozen_bn=self.frozen_bn,
            pipeline_stages=self.pipeline_stages,
            pipeline_mesh=self.pipeline_mesh,
            pipeline_microbatches=self.pipeline_microbatches,
        )
        feat = enc(image, train=train)[-1]
        logits = SceneUnderstandingModule(
            ord_num=self.ord_num,
            size=self.input_size,
            kernel_size=self.kernel_size,
            pyramid=self.pyramid,
            dropout_prob=self.dropout_prob,
        )(feat, train=train)
        label, prob = ordinal_regression(logits, interleaved=False)
        return label, prob
