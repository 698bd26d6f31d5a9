"""Separable-Gaussian SSIM on NHWC images.

Covers both SSIM flavors the reference uses:

* the loss-side SSIM of stdepth_utils.py:56-144 (win 11, sigma 1.5, SAME
  padding, optional non-negative clamp of the contrast term, data_range=1)
* the metric-side torchmetrics SSIM (metrics.py:123): VALID padding and
  data_range inferred from the data when not given.

The filtering is two depthwise 1-D convolutions (separable), which XLA maps
onto fused VPU loops; no NCHW transposes anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_K1 = 0.01
_K2 = 0.03


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(size: int, sigma: float) -> tuple[float, ...]:
    import numpy as np

    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return tuple(g.astype(np.float64).tolist())


def _blur(x: jax.Array, win: jax.Array, padding: str) -> jax.Array:
    """Separable depthwise Gaussian blur over H and W of an NHWC tensor."""
    c = x.shape[-1]
    size = win.shape[0]
    kh = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 per group
    kw = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = padding.upper()
    out = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), pad, dimension_numbers=dn, feature_group_count=c
    )
    out = jax.lax.conv_general_dilated(
        out, kw.astype(x.dtype), (1, 1), pad, dimension_numbers=dn, feature_group_count=c
    )
    return out


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float | None = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    nonnegative: bool = True,
    padding: str = "same",
    reduction: str = "mean",
) -> jax.Array:
    """SSIM between two NHWC (or HWC) image batches.

    Args:
        pred, target: (..., H, W, C) images, same shape.
        data_range: dynamic range of the data. ``None`` infers
            ``max(pred,target) - min(pred,target)`` (torchmetrics default).
        win_size, sigma: Gaussian window parameters.
        nonnegative: clamp the contrast-structure map at 0 (reference loss
            behavior, stdepth_utils.py:115).
        padding: "same" (reference loss) or "valid" (torchmetrics metric).
        reduction: "mean", "sum" or "none".

    Returns:
        Scalar for mean/sum reduction, else the per-pixel SSIM map.
    """
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    # promote (not cast): bf16 -> f32, f64 passes through for the f64
    # gradient-parity certificates
    dt = jnp.promote_types(pred.dtype, jnp.float32)
    pred = pred.astype(dt)
    target = target.astype(dt)

    if data_range is None:
        hi = jnp.maximum(pred.max(), target.max())
        lo = jnp.minimum(pred.min(), target.min())
        data_range = hi - lo

    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2

    win = jnp.asarray(_gaussian_kernel(win_size, sigma), dtype=dt)
    mu1 = _blur(pred, win, padding)
    mu2 = _blur(target, win, padding)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _blur(pred * pred, win, padding) - mu1_sq
    sigma2_sq = _blur(target * target, win, padding) - mu2_sq
    sigma12 = _blur(pred * target, win, padding) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    if nonnegative:
        cs_map = jax.nn.relu(cs_map)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    if reduction == "mean":
        return ssim_map.mean()
    if reduction == "sum":
        return ssim_map.sum()
    return ssim_map


def dssim(pred: jax.Array, target: jax.Array, **kwargs) -> jax.Array:
    """1 - SSIM (parity with stdepth_utils.dssim2d)."""
    return 1.0 - ssim(pred, target, **kwargs)


def ssim_metric(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torchmetrics-compatible SSIM: VALID padding, no non-negative clamp,
    and the torchmetrics data-range inference
    ``max(pred.max()-pred.min(), target.max()-target.min())`` — the max of
    the PER-TENSOR ranges, not the joint range (metrics.py:123 of the
    reference; pinned by goldens in tests/test_metrics.py)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    dr = jnp.maximum(pred.max() - pred.min(), target.max() - target.min())
    return ssim(
        pred, target, data_range=dr, nonnegative=False, padding="valid",
        reduction="mean",
    )
