"""Pallas TPU kernel: fused device-side image normalize + center-crop.

The device-side preproc stage (BASELINE.json north star: "decode/resize/
center-crop/normalize fused ... feeding HBM"): uint8 NHWC images arrive
from the host, and a single kernel pass emits cropped, scaled, mean/std-
normalized float tiles — one HBM read of the uint8 bytes (4x less
bandwidth than reading pre-converted f32), one write.

Layout note: channels-last c=3 as the lane dim would be padded to 128
lanes by Mosaic (a 40x VMEM blowup), so the kernel views images as
(B, H, W*C) — W*C is the lane dim — and normalization constants arrive
pre-tiled to a (W*C,) repeating pattern. The (u8 -> f32)/255 - mean)/std
chain is folded into a single multiply-add (scale = 1/(255*std),
bias = mean/std).

Resize stays in XLA (jax.image.resize lowers to efficient gathers/convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_crop_kernel(img_ref, scale_ref, bias_ref, out_ref, *, top: int,
                      left_lanes: int):
    # img_ref: (1, H, W*C) uint8; out_ref: (1, th, tw*C) float32
    _, th, twc = out_ref.shape
    x = img_ref[0, pl.ds(top, th), pl.ds(left_lanes, twc)]
    # Mosaic has no direct u8 -> f32 cast; hop through int32
    xf = x.astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = xf * scale_ref[0] - bias_ref[0]


@functools.partial(jax.jit, static_argnames=("crop_hw",))
def normalize_crop_pallas(
    images_u8: jax.Array,
    crop_hw: tuple[int, int],
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    """(B, H, W, C) uint8 -> (B, th, tw, C) float32 normalized center crop."""
    b, h, w, c = images_u8.shape
    th, tw = crop_hw
    top, left = (h - th) // 2, (w - tw) // 2
    mean = jnp.asarray(mean, jnp.float32).reshape(c)
    std = jnp.asarray(std, jnp.float32).reshape(c)
    scale = jnp.tile(1.0 / (255.0 * std), tw).reshape(1, tw * c)
    bias = jnp.tile(mean / std, tw).reshape(1, tw * c)
    img_flat = images_u8.reshape(b, h, w * c)
    out = pl.pallas_call(
        functools.partial(
            _norm_crop_kernel, top=top, left_lanes=left * c
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, th, tw * c), jnp.float32),
    )(img_flat, scale, bias)
    return out.reshape(b, th, tw, c)


def normalize_crop_reference(
    images_u8: jax.Array,
    crop_hw: tuple[int, int],
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    """jnp twin (correctness oracle + fallback)."""
    b, h, w, c = images_u8.shape
    th, tw = crop_hw
    top, left = (h - th) // 2, (w - tw) // 2
    x = images_u8[:, top : top + th, left : left + tw, :].astype(jnp.float32)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, c)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, c)
    return (x - mean) / std
