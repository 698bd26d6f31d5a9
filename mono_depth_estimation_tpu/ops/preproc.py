"""Device-side image preprocessing (the input-pipeline device stage,
SURVEY §2.8 item 4 / BASELINE north star "decode/resize/center-crop/
normalize fused").

Production path: host transforms keep images as uint8 right up to the
device boundary (``quantize_rgb_u8`` wraps the PIL eval/train policies —
their float output is exactly u8/255, so the re-encode is lossless), the
batch crosses host->HBM at 1/4 the f32 bytes, and ``dequantize_images`` in
the jitted step turns them back into f32/255 where XLA fuses the scale into
the first conv's input chain.

A Pallas kernel for this stage (normalize_crop_pallas) was benchmarked on
the real chip against this XLA form and LOST (kernel_bench.json r2:
pallas 0.107 ms vs XLA ~0 ms at 16x540x720 — XLA fuses the crop+scale into
the consumer, the kernel can't), so it was deleted; this module is the
winner per SURVEY §7 hard part 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_crop(
    images_u8: jax.Array,
    crop_hw: tuple[int, int],
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    """(B, H, W, C) uint8 -> (B, th, tw, C) float32 normalized center crop."""
    b, h, w, c = images_u8.shape
    th, tw = crop_hw
    top, left = (h - th) // 2, (w - tw) // 2
    x = images_u8[:, top : top + th, left : left + tw, :].astype(jnp.float32)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, c)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, c)
    return (x - mean) / std


def dequantize_images(batch):
    """uint8 image arrays -> float32/255 (identity on everything else).

    Runs inside the jitted step, so the /255 fuses into the consumer.
    """

    def deq(x):
        if hasattr(x, "dtype") and x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x

    return jax.tree.map(deq, batch)


# Policies whose host output is PIL-derived and therefore exactly
# u8/255-quantized in every array (rgb AND the /255'd depth quirk included
# for rgb only — depths stay float because metric depths are mode-'F'
# unquantized). See data/policies.py _rgb_to_pil: every rgb input becomes a
# u8 PIL image before the trailing /255.
UINT8_SAFE_POLICIES = frozenset({"default", "laina", "bts", "my"})


def raw_collate(rgb, depth, rng):
    """Transform for the --device_aug path: NO host-side augmentation —
    ship the raw decoded sample (uint8 rgb untouched, target planes
    concatenated channel-last float32) and let the jitted step augment on
    device (ops/device_aug.py). With data/raw_cache.py this makes the
    host's per-sample work a single memcpy."""
    import numpy as np

    del rng
    if isinstance(depth, (list, tuple)):
        depth = np.concatenate(
            [p if p.ndim == 3 else p[..., None] for p in depth], axis=-1
        )
    elif depth.ndim == 2:
        depth = depth[..., None]
    return rgb, np.asarray(depth, np.float32)


def cast_targets_host(transform, dtype):
    """Wraps a host policy fn so float32 TARGETS travel in the step's
    compute dtype (bf16 under --precision 16): half the host->HBM bytes.

    Bit-identical to the status quo: train/steps._cast_inputs casts every
    floating input to compute_dtype on device anyway (round-to-nearest-even,
    the same rounding ml_dtypes uses), so converting on the host — inside
    the Loader's thread pool, overlapped with device compute — only moves
    the cast across the wire. The flagship's 10-channel 512x512 stdepth
    target is the dominant transfer (10.5 MB/sample f32); see
    bench_extra.json["fed_train"]. Only tuple samples (x, y) are touched.
    """
    import numpy as np

    np_dtype = np.dtype(dtype)

    def wrapped(rgb, depth, rng):
        out = transform(rgb, depth, rng)
        if not isinstance(out, tuple) or len(out) != 2:
            return out
        x, y = out
        y = np.asarray(y)
        if y.dtype == np.float32:
            y = y.astype(np_dtype)
        return x, y

    return wrapped


def quantize_rgb_u8(transform):
    """Wraps a host policy fn so the rgb half travels as uint8.

    Lossless for UINT8_SAFE_POLICIES (their rgb values are exactly k/255);
    the jitted steps dequantize on device (train/steps.py _cast_inputs).
    Only tuple samples (rgb, target) are touched; dict batches pass through.
    """

    def wrapped(rgb, depth, rng):
        out = transform(rgb, depth, rng)
        if not isinstance(out, tuple) or len(out) != 2:
            return out
        x, y = out
        x = np.asarray(x)
        if x.dtype == np.uint8:
            return x, y
        xq = np.rint(x * 255.0)
        return xq.astype(np.uint8), y

    return wrapped
