"""Pallas TPU kernel: fused device-side image normalize + center-crop.

The device-side preproc stage (BASELINE.json north star: "decode/resize/
center-crop/normalize fused ... feeding HBM"): uint8 NHWC images arrive
from the host, and a single kernel pass emits cropped, scaled, mean/std-
normalized float tiles — one HBM read of the uint8 bytes (4x less
bandwidth than reading pre-converted f32), one write.

Resize stays in XLA (jax.image.resize lowers to efficient gathers/convs);
the fused win here is u8->f32 conversion + crop + affine normalize, which
would otherwise be three materialized HBM tensors.

Shapes: crop offsets are static (center crop); lane dim is W*C which must
be 128-aligned for the fast path — ops-level callers fall back to jnp
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_crop_kernel(img_ref, mean_ref, std_ref, out_ref):
    # img_ref: (1, H, W, C) uint8 (whole image in VMEM);
    # out_ref: (1, th, tw, C) float32
    _, h, w, c = img_ref.shape
    _, th, tw, _ = out_ref.shape
    top = (h - th) // 2
    left = (w - tw) // 2
    x = img_ref[0, pl.ds(top, th), pl.ds(left, tw), :].astype(jnp.float32)
    x = x / 255.0
    mean = mean_ref[0, 0, 0, :]
    std = std_ref[0, 0, 0, :]
    out_ref[0] = (x - mean) / std


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
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, c)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, c)
    return pl.pallas_call(
        _norm_crop_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, th, tw, c), jnp.float32),
    )(images_u8, mean, std)


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
