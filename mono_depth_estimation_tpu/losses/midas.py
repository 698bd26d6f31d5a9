"""MiDaS loss family: scale/shift-invariant alignment, trimmed MAE,
multi-scale gradient regularization, trimmed-Procrustes.

Parity targets in the reference's criteria.py:
  compute_scale_and_shift :154-176, normalize_prediction_robust :135-152,
  reductions :179-199, l1/trimmed/mse/gradient losses :201-244,
  MidasLoss :306-332, TrimmedProcrustesLoss :335-363.

All functions take (B, H, W) maps (channel dim squeezed by callers).

KNOWN REFERENCE BUG (documented, not copied): trimmed_mae_loss in the
reference slices the (values, indices) tuple returned by torch.sort instead
of the values tensor (criteria.py:214-216), so no trimming ever happens
there. We implement the *intended* top-(1-trim) trimming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_scale_and_shift(
    prediction: jax.Array, target: jax.Array, mask: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Closed-form per-image least-squares scale & shift (criteria.py:154-176)."""
    if mask is None:
        mask = (target > 0).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))

    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def apply_scale_and_shift(prediction: jax.Array, target: jax.Array) -> jax.Array:
    """ssi alignment used pre-metrics by MidasModule.scale_shift (modules/midas.py:57-62)."""
    scale, shift = compute_scale_and_shift(prediction, target)
    return scale[:, None, None] * prediction + shift[:, None, None]


def _torch_median(row: jax.Array) -> jax.Array:
    """torch.median semantics: lower of the two middle elements."""
    n = row.shape[-1]
    srt = jnp.sort(row, axis=-1)
    return srt[..., (n - 1) // 2]


def normalize_prediction_robust(
    target: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Median/MAD normalization (criteria.py:135-152).

    NOTE (parity): the reference takes the median of ``mask * target`` over
    ALL pixels (zeros included), not over the masked subset — replicated.
    """
    if mask is None:
        mask = (target > 0).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    b = target.shape[0]
    ssum = mask.sum(axis=(1, 2))
    valid = ssum > 0

    m = jnp.where(valid, _torch_median((mask * target).reshape(b, -1)), 0.0)
    shifted = target - m[:, None, None]
    # |shifted| written as shifted*sign(shifted): identical forward, but the
    # subgradient at 0 is 0 (sign's grad is 0), matching torch.abs backward.
    # The median pixel's shifted value is EXACTLY 0 by construction, so
    # jnp.abs (whose grad at 0 is 1) would put a spurious unit cotangent on
    # it — the one place this loss family disagrees with torch autograd
    # (pinned by tests/test_gradient_parity.py::test_trimmed_procrustes_gradient_parity).
    sq = jnp.sum(mask * (shifted * jnp.sign(shifted)), axis=(1, 2))
    s = jnp.where(valid, jnp.maximum(sq / jnp.maximum(ssum, 1.0), 1e-6), 1.0)
    return shifted / s[:, None, None]


def _reduce(image_loss: jax.Array, m: jax.Array, reduction: str) -> jax.Array:
    if reduction == "batch-based":
        divisor = m.sum()
        return jnp.where(divisor == 0, 0.0, image_loss.sum() / jnp.maximum(divisor, 1e-12))
    # image-based: mean over images of per-image averages. NOTE: the
    # reference's reduction_image_based (criteria.py:191-199) indexes the
    # flattened per-pixel loss vector with per-IMAGE indices — ill-defined;
    # all reference modules use batch-based. We implement the documented
    # intent.
    valid = m > 0
    per_image = jnp.where(valid, image_loss / jnp.maximum(m, 1.0), image_loss)
    return per_image.mean()


def l1_loss(prediction, target, mask, reduction: str = "batch-based"):
    m = mask.sum(axis=(1, 2))
    image_loss = jnp.sum(jnp.abs(target - prediction) * mask, axis=(1, 2))
    return _reduce(image_loss, 2 * m, reduction)


def mse_loss(prediction, target, mask, reduction: str = "batch-based"):
    m = mask.sum(axis=(1, 2))
    res = prediction - target
    image_loss = jnp.sum(mask * res * res, axis=(1, 2))
    return _reduce(image_loss, 2 * m, reduction)


def trimmed_mae_loss(prediction, target, mask, trim: float = 0.2,
                     reduction: str = "batch-based"):
    """Trimmed MAE: drop the largest ``trim`` fraction of valid residuals
    (over the whole batch, flattened sort).

    NOTE (reference bug, not copied): criteria.py:233-239 writes
    ``torch.sort(res.view(-1))[: int(len(res) * 0.8)]`` — that slices the
    (values, indices) TUPLE returned by torch.sort, not the values, so the
    reference never actually trims and its 'trim'/'ssitrim' losses degrade
    to plain (masked) MAE. Pass ``trim=0.0`` here to reproduce the
    reference's actual behavior (tests/test_reference_parity.py does)."""
    m = mask.sum(axis=(1, 2))
    res = jnp.abs(prediction - target) * mask
    flat = res.reshape(-1)
    flat_mask = mask.reshape(-1)
    n_valid = flat_mask.sum()
    # invalid entries -> +inf so they sort to the end and never get kept
    keyed = jnp.where(flat_mask > 0, flat, jnp.inf)
    srt = jnp.sort(keyed)
    keep = jnp.arange(flat.shape[0]) < jnp.floor(n_valid * (1.0 - trim)).astype(jnp.int32)
    trimmed_sum = jnp.where(keep, jnp.where(jnp.isfinite(srt), srt, 0.0), 0.0).sum()
    if reduction == "batch-based":
        divisor = (2 * m).sum()
        return jnp.where(divisor == 0, 0.0, trimmed_sum / jnp.maximum(divisor, 1e-12))
    # per-image trimming is not separable after a global sort; fall back to
    # batch-based (the reference only ever uses batch-based here).
    divisor = (2 * m).sum()
    return jnp.where(divisor == 0, 0.0, trimmed_sum / jnp.maximum(divisor, 1e-12))


def gradient_loss(prediction, target, mask, reduction: str = "batch-based"):
    m = mask.sum(axis=(1, 2))
    diff = (prediction - target) * mask
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (mask[:, :, 1:] * mask[:, :, :-1])
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (mask[:, 1:, :] * mask[:, :-1, :])
    image_loss = grad_x.sum(axis=(1, 2)) + grad_y.sum(axis=(1, 2))
    return _reduce(image_loss, m, reduction)


def multiscale_gradient_loss(prediction, target, mask, scales: int = 4,
                             reduction: str = "batch-based"):
    """GradientLoss with ::2^k striding (criteria.py:283-303)."""
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        total += gradient_loss(
            prediction[:, ::step, ::step],
            target[:, ::step, ::step],
            mask[:, ::step, ::step],
            reduction=reduction,
        )
    return total


def _squeeze_map(x: jax.Array) -> jax.Array:
    """(B, H, W, 1) or (B, 1, H, W) -> (B, H, W)."""
    if x.ndim == 4:
        if x.shape[-1] == 1:
            return x[..., 0]
        if x.shape[1] == 1:
            return x[:, 0]
        raise ValueError(f"expected a single-channel map, got shape {x.shape}")
    return x


def midas_loss(
    prediction: jax.Array,
    target: jax.Array,
    alpha: float = 0.5,
    scales: int = 4,
    loss: str = "ssimse",
    reduction: str = "batch-based",
    trim: float = 0.2,
) -> jax.Array:
    """MidasLoss (criteria.py:306-332): optional ssi alignment + data + grad."""
    # promote (not hard-cast): bf16 inputs compute in f32 as before, while
    # f64 inputs stay f64 for the gradient-parity certificates
    prediction = _squeeze_map(prediction)
    prediction = prediction.astype(jnp.promote_types(prediction.dtype, jnp.float32))
    target = _squeeze_map(target)
    target = target.astype(jnp.promote_types(target.dtype, jnp.float32))
    mask = (target > 0).astype(jnp.float32)

    if "ssi" in loss:
        scale, shift = compute_scale_and_shift(prediction, target, mask)
        prediction = scale[:, None, None] * prediction + shift[:, None, None]

    if "trim" in loss:
        total = trimmed_mae_loss(
            prediction, target, mask, trim=trim, reduction=reduction
        )
    elif "mse" in loss:
        total = mse_loss(prediction, target, mask, reduction=reduction)
    elif "l1" in loss:
        total = l1_loss(prediction, target, mask, reduction=reduction)
    else:
        raise ValueError(f"unknown midas data loss: {loss}")

    if alpha > 0:
        total = total + alpha * multiscale_gradient_loss(
            prediction, target, mask, scales=scales, reduction=reduction
        )
    return total


def trimmed_procrustes_loss(
    prediction: jax.Array,
    target: jax.Array,
    alpha: float = 0.5,
    scales: int = 4,
    reduction: str = "batch-based",
    trim: float = 0.2,
) -> jax.Array:
    """TrimmedProcrustesLoss (criteria.py:335-363)."""
    prediction = _squeeze_map(prediction)
    prediction = prediction.astype(jnp.promote_types(prediction.dtype, jnp.float32))
    target = _squeeze_map(target)
    target = target.astype(jnp.promote_types(target.dtype, jnp.float32))
    mask = (target > 0).astype(jnp.float32)

    pred_n = normalize_prediction_robust(prediction, mask)
    targ_n = normalize_prediction_robust(target, mask)
    total = trimmed_mae_loss(pred_n, targ_n, mask, trim=trim, reduction=reduction)
    if alpha > 0:
        total = total + alpha * multiscale_gradient_loss(
            pred_n, targ_n, mask, scales=scales, reduction=reduction
        )
    return total
