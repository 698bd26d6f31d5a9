"""On-device depth metrics with masked (static-shape) reductions.

Parity with the reference metric suite (/root/reference/metrics.py:47-123):
pred is clamped to >= 1e-7, the valid mask is ``target > 0``, and every
metric except SSIM is computed over the masked pixels. Boolean indexing of
the reference becomes mask-weighted reductions so everything stays
static-shape under jit and aggregates exactly under pjit/pmean.

NOTE ON 'rmse': the reference's 'rmse' is NOT standard RMSE — it computes
``mean(sqrt((p-t)^2 / t))`` (metrics.py:106-109), a *relative* metric. We
replicate that formula under the name 'rmse' for metric parity and expose
the standard root-mean-square error as 'rmse_true'. 'rmsle' (listed in the
reference test.py:71 defaults but absent from its METRICS registry — a
latent KeyError there) is provided as sqrt(MSLE).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.ops.ssim import ssim_metric

PRED_CLAMP_MIN = 1e-7


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    mask = mask.astype(values.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (values * mask).sum() / denom


def _delta(pred, target, mask, exp):
    # torch.max(p/t, t/p) over valid pixels; counts strictly-less than 1.25^k
    safe_t = jnp.where(mask, target, 1.0)
    ratio = jnp.maximum(pred / safe_t, safe_t / pred)
    return _masked_mean((ratio < 1.25**exp).astype(jnp.float32), mask)


def delta1(pred, target, mask):
    return _delta(pred, target, mask, 1)


def delta2(pred, target, mask):
    return _delta(pred, target, mask, 2)


def delta3(pred, target, mask):
    return _delta(pred, target, mask, 3)


def mae(pred, target, mask):
    return _masked_mean(jnp.abs(pred - target), mask)


def mse(pred, target, mask):
    return _masked_mean(jnp.square(pred - target), mask)


def msle(pred, target, mask):
    d = jnp.log1p(pred) - jnp.log1p(jnp.where(mask, target, 0.0))
    return _masked_mean(jnp.square(d), mask)


def rmsle(pred, target, mask):
    return jnp.sqrt(msle(pred, target, mask))


def log10(pred, target, mask):
    safe_t = jnp.where(mask, target, 1.0)
    d = jnp.abs(jnp.log10(pred) - jnp.log10(safe_t))
    return _masked_mean(d, mask)


def absrel(pred, target, mask):
    safe_t = jnp.where(mask, target, 1.0)
    return _masked_mean(jnp.abs(pred - safe_t) / safe_t, mask)


def sqrel(pred, target, mask):
    safe_t = jnp.where(mask, target, 1.0)
    return _masked_mean(jnp.square(pred - safe_t) / safe_t, mask)


def rmse(pred, target, mask):
    """Reference 'rmse' (relative; metrics.py:106-109): mean(sqrt((p-t)^2/t))."""
    safe_t = jnp.where(mask, target, 1.0)
    return _masked_mean(jnp.sqrt(jnp.square(pred - safe_t) / safe_t), mask)


def rmse_true(pred, target, mask):
    """Standard RMSE (documented improvement over the reference formula)."""
    return jnp.sqrt(mse(pred, target, mask))


METRICS = {
    "delta1": delta1,
    "delta2": delta2,
    "delta3": delta3,
    "mae": mae,
    "mse": mse,
    "msle": msle,
    "rmsle": rmsle,
    "log10": log10,
    "absrel": absrel,
    "sqrel": sqrel,
    "rmse": rmse,
    "rmse_true": rmse_true,
    # 'ssim' is special-cased (full maps, no mask) in compute_metrics
}

DEFAULT_TRAIN_METRICS = ["delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse", "ssim"]
DEFAULT_EVAL_METRICS = ["delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse"]


def compute_metrics(
    pred: jax.Array,
    target: jax.Array,
    names: Sequence[str] = DEFAULT_EVAL_METRICS,
) -> dict[str, jax.Array]:
    """Computes the named metrics on device.

    Args:
        pred, target: matching-shape maps, any layout (masked metrics flatten;
            SSIM expects (..., H, W, C)).
        names: metric names from METRICS plus optionally 'ssim'.

    Returns:
        dict name -> f32 scalar (DeviceArray; jit/pjit-safe).
    """
    pred = jnp.maximum(pred.astype(jnp.float32), PRED_CLAMP_MIN)
    target = target.astype(jnp.float32)
    mask = target > 0

    out: dict[str, jax.Array] = {}
    for name in names:
        if name == "ssim":
            out[name] = ssim_metric(pred, target)
        else:
            out[name] = METRICS[name](pred, target, mask)
    return out
