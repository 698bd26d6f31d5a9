"""DORN ordinal regression loss and SID/UD discretization helpers.

Parity targets: criteria.py ordLoss :734-787 and OrdinalRegressionLoss
:789-836; SID helpers in modules/dorn.py:10-107.

The reference builds an explicit (N, K, H, W) index cube per call
(criteria.py:761-767); here a broadcasted iota compares against the label
map directly — no materialized cube, fused on the VPU.

Layout: ordinal probabilities are (B, H, W, K) (channel-last);
labels/depths are (B, H, W) or (B, H, W, 1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SIDBins:
    """Spacing-increasing (or uniform) discretization parameters."""

    alpha: float
    beta: float
    ord_num: int
    discretization: str = "SID"  # or "UD"

    def depth_to_label(self, depth: jax.Array) -> jax.Array:
        if self.discretization == "SID":
            return (
                self.ord_num
                * jnp.log(depth / self.alpha)
                / jnp.log(self.beta / self.alpha)
            )
        return self.ord_num * (depth - self.alpha) / (self.beta - self.alpha)

    def label_to_depth(self, label: jax.Array) -> jax.Array:
        if self.discretization == "SID":
            return jnp.exp(
                jnp.log(self.alpha)
                + jnp.log(self.beta / self.alpha) * label / self.ord_num
            )
        return self.alpha + (self.beta - self.alpha) * label / self.ord_num


# per-dataset SID presets (modules/dorn.py:10-71)
SID_PRESETS = {
    "kitti": SIDBins(0.001, 80.0, 71),
    "nyu": SIDBins(0.02, 10.0, 68),
    "floorplan3d": SIDBins(0.0552, 10.0, 68),
    "stdepth": SIDBins(1e-3, 1.0, 68),
}


def ord_loss(ord_probs: jax.Array, target_label: jax.Array) -> jax.Array:
    """Pixelwise ordinal NLL (criteria.py:734-787).

    Args:
        ord_probs: (B, H, W, K) probabilities P(l > k) per threshold k.
        target_label: (B, H, W) or (B, H, W, 1) real-valued SID labels.

    Returns:
        scalar loss, averaged over B*H*W (reference divides by N*H*W).
    """
    if target_label.ndim == 4:
        target_label = target_label[..., 0]
    b, h, w, k = ord_probs.shape
    ks = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, k), dimension=3)
    le_mask = ks <= target_label[..., None]

    p = jnp.clip(ord_probs, 1e-8, 1e8)
    one_minus = jnp.clip(1.0 - ord_probs, 1e-8, 1e8)
    ll = jnp.where(le_mask, jnp.log(p), jnp.log(one_minus))
    return -ll.sum() / (b * h * w)


def ordinal_regression_loss(
    prob: jax.Array, gt_depth: jax.Array, bins: SIDBins
) -> jax.Array:
    """Vectorized variant (criteria.py:789-836): cross-entropy against the
    (c0, c1) ordinal label stack, averaged over valid (gt > 0) pixels.

    Args:
        prob: (B, H, W, 2K) log-prob-like outputs, first K = c0, last K = c1.
        gt_depth: (B, H, W) ground-truth depth.
    """
    k = prob.shape[-1] // 2
    label = jnp.floor(bins.depth_to_label(jnp.maximum(gt_depth, 1e-12))).astype(jnp.int32)
    ks = jax.lax.broadcasted_iota(jnp.int32, (*gt_depth.shape, k), dimension=gt_depth.ndim)
    ord_c0 = (ks <= label[..., None]).astype(prob.dtype)
    ord_label = jnp.concatenate([ord_c0, 1.0 - ord_c0], axis=-1)

    entropy = -(prob * ord_label).sum(axis=-1)
    valid = (gt_depth > 0).astype(prob.dtype)
    return (entropy * valid).sum() / jnp.maximum(valid.sum(), 1.0)
