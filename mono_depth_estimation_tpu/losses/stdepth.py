"""The stdepth composite loss factory.

Parity target: BaseModule.setup_criterion of the reference
(modules/base_module.py:124-208) — the multi-term loss over layered
RGBA+Depth predictions, selected by substring flags in the loss string:

  'silma'        SILog(depth) * w_d + MAE(color)          (:156-158)
  'silms'        SILog(depth) * w_d + MSE(color)          (:159-161)
  'mse'          MSE(all) + w_d * MSE(depth)              (:162-164)
  'mae'          MAE(all) + w_d * MAE(depth)              (:165-167)
  'allssim'      w_s * DSSIM(all channels)                (:168-171)
  'colorssim'    w_s * (DSSIM(front) + DSSIM(back))       (:172-178)
  'composite'    w_c * MSE(recomposited RGBA)             (:179-185)
  '...ssim' + 'composite'  adds w_s*w_c*DSSIM(composite)  (:182-185)
  'fbdivergence' w_f * front/back cosine divergence       (:186-196)

Channel protocol (channel-LAST here; reference is channel-first):
  single-layer (10ch): [0:4]=front RGBA, [4:8]=back RGBA, [8:10]=depths
  multi-layer (20ch):  [0:4],[4:8],[8:12]=layers, [12:16]=back,
                       [16:19]=layer depths, [19]=full alpha
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.masked import masked_mean, silog_loss
from mono_depth_estimation_tpu.ops.compositing import composite_layers, depth_sort
from mono_depth_estimation_tpu.ops.ssim import ssim


@dataclasses.dataclass(frozen=True)
class StdepthLossConfig:
    loss: str = "silma"
    single_layer: bool = True
    variance_focus: float = 0.85
    depth_loss_weight: float = 10.0   # --depth-loss-weight default
    comp_loss_weight: float = 2.0     # --comp-loss-weight default
    fbdiv_loss_weight: float = 0.2    # --fbdiv-loss-weight default
    ssim_loss_weight: float = 2.0     # --ssim-loss-weight default


def _masked_dssim(pred, targ, mask):
    """dssim2d(..., reduction='none')[mask].mean() of the reference."""
    m = ssim(
        jnp.clip(pred, 0.0, 1.0),
        jnp.clip(targ, 0.0, 1.0),
        data_range=1.0,
        nonnegative=True,
        padding="same",
        reduction="none",
    )
    return masked_mean(1.0 - m, mask)


def composite_prediction(pred: jax.Array, targ: jax.Array, rgba: jax.Array,
                         single_layer: bool) -> tuple[jax.Array, jax.Array]:
    """Re-composites the layered prediction into a full RGBA render.

    Returns (pred_full, targ_full); parity with base_module.py:142-154.
    """
    if single_layer:
        targ_full = rgba
        l1, back = pred[..., :4], pred[..., 4:8]
        pred_full = composite_layers(jnp.stack([l1, back], axis=1))
    else:
        # NOTE: the reference concatenates the full-alpha channel onto the
        # 4-channel rgba here (base_module.py:148), yielding a 5-channel
        # targ_full that can never align with the 4-channel composited
        # prediction in the downstream masked MSE — a latent shape bug.
        # We compare on the RGBA channels only.
        targ_full = rgba
        l1 = jnp.concatenate([pred[..., 0:4], pred[..., 16:17]], axis=-1)
        l2 = jnp.concatenate([pred[..., 4:8], pred[..., 17:18]], axis=-1)
        l3 = jnp.concatenate([pred[..., 8:12], pred[..., 18:19]], axis=-1)
        sorted_layers = depth_sort(jnp.stack([l1, l2, l3], axis=1))[..., :4]
        back = pred[..., 12:16][:, None]  # add layer dim
        pred_full = composite_layers(jnp.concatenate([sorted_layers, back], axis=1))
    return pred_full, targ_full


def stdepth_loss(
    pred: jax.Array,
    targ: jax.Array,
    rgba: jax.Array,
    cfg: StdepthLossConfig,
) -> tuple[jax.Array, jax.Array, dict[str, jax.Array]]:
    """Computes the configured stdepth loss terms.

    Args:
        pred: (B, H, W, 10|20) network output.
        targ: (B, H, W, 10|20) ground truth, same channel protocol.
        rgba: (B, H, W, 4) input RGBA composite.

    Returns:
        (total_loss, pred_full, loss_dict). pred_full is the recomposited
        RGBA (or zeros when no composite was requested — callers that need
        it always request 'composite' or pass return flags in the
        reference; here it is always computed lazily when needed).
    """
    # promote (not cast): bf16 -> f32 as before, but f64 passes through —
    # the gradient-parity certificates differentiate this loss at f64
    # (tests/test_gradient_parity.py)
    dt = jnp.promote_types(pred.dtype, jnp.float32)
    pred = pred.astype(dt)
    targ = targ.astype(dt)
    rgba = rgba.astype(dt)

    mask1 = rgba[..., 3:4] > 0.0
    mask4 = jnp.broadcast_to(mask1, (*mask1.shape[:-1], 4))
    mask8 = jnp.broadcast_to(mask1, (*mask1.shape[:-1], 8))
    mask_n = jnp.broadcast_to(mask1, targ.shape)
    d_sl = slice(8, 10) if cfg.single_layer else slice(16, 20)
    mask_d = targ[..., d_sl] > 0.0

    w_d, w_c = cfg.depth_loss_weight, cfg.comp_loss_weight
    w_f, w_s = cfg.fbdiv_loss_weight, cfg.ssim_loss_weight
    loss_dict: dict[str, jax.Array] = {}

    pred_full, targ_full = composite_prediction(pred, targ, rgba, cfg.single_layer)

    pred_d, targ_d = pred[..., d_sl], targ[..., d_sl]
    if "silma" in cfg.loss:
        loss_dict["depth_silog"] = w_d * silog_loss(
            pred_d, targ_d, cfg.variance_focus, mask=mask_d
        )
        loss_dict["color_mae"] = masked_mean(
            jnp.abs(pred[..., :8] - targ[..., :8]), mask8
        )
    if "silms" in cfg.loss:
        loss_dict["depth_silog"] = w_d * silog_loss(
            pred_d, targ_d, cfg.variance_focus, mask=mask_d
        )
        loss_dict["color_mse"] = masked_mean(
            jnp.square(pred[..., :8] - targ[..., :8]), mask8
        )
    if "mse" in cfg.loss:
        all_mse = masked_mean(jnp.square(pred - targ), mask_n)
        all_mse += w_d * masked_mean(jnp.square(pred_d - targ_d), mask_d)
        loss_dict["all_mse"] = all_mse
    if "mae" in cfg.loss:
        all_mae = masked_mean(jnp.abs(pred - targ), mask_n)
        all_mae += w_d * masked_mean(jnp.abs(pred_d - targ_d), mask_d)
        loss_dict["all_mae"] = all_mae
    if "allssim" in cfg.loss:
        loss_dict["all_ssim"] = w_s * _masked_dssim(pred, targ, mask_n)
    if "colorssim" in cfg.loss:
        loss_dict["front_ssim"] = w_s * _masked_dssim(
            pred[..., :4], targ[..., :4], mask4
        )
        loss_dict["back_ssim"] = w_s * _masked_dssim(
            pred[..., 4:8], targ[..., 4:8], mask4
        )
    if "composite" in cfg.loss:
        comp = w_c * jnp.square(pred_full - targ_full)
        loss_dict["composite_mse"] = masked_mean(jnp.nan_to_num(comp), mask4)
        if "ssim" in cfg.loss:
            loss_dict["composite_ssim"] = w_s * w_c * _masked_dssim(
                pred_full, targ_full, mask4
            )
    if "fbdivergence" in cfg.loss:
        def vnorm(x):
            return jnp.linalg.norm(x, axis=-1, keepdims=True)

        fpbg = vnorm(pred[..., :3]) * vnorm(targ[..., 4:7]) + 1e-3
        fgbp = vnorm(pred[..., 4:7]) * vnorm(targ[..., :3]) + 1e-3
        div = (pred[..., :3] * targ[..., 4:7] / fpbg).sum(axis=-1) + (
            pred[..., 4:7] * targ[..., :3] / fgbp
        ).sum(axis=-1)
        loss_dict["fb_divergence"] = w_f * masked_mean(div, mask1[..., 0])

    total = jnp.stack(list(loss_dict.values())).sum() if loss_dict else jnp.float32(0.0)
    return total, pred_full, loss_dict


def adjust_loss_dict(loss_dict: dict, cfg: StdepthLossConfig) -> dict:
    """Normalizes loss terms back to interpretable units (base_module.py:108-122)."""
    ret = {}
    for k, v in loss_dict.items():
        if k == "composite_ssim":
            ret[k] = 1 - (v / (cfg.ssim_loss_weight * cfg.comp_loss_weight))
        elif "ssim" in k:
            ret[k] = 1 - (v / cfg.ssim_loss_weight)
        elif "depth" in k:
            ret[k] = v / cfg.depth_loss_weight
        elif k == "fb_divergence":
            ret[k] = v / cfg.fbdiv_loss_weight
        else:
            ret[k] = v
    return ret
