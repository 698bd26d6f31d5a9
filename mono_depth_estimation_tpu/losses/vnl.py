"""VNL (virtual normal) loss and the weighted cross-entropy bin loss.

Parity targets: criteria.py WCEL_Loss :839-863, VNL_Loss :866-1045,
ModelLoss :1047-1062.

TPU redesign (SURVEY.md §7): the reference's dynamic boolean gathers
(select_points_groups, criteria.py:990-1009) become fixed-count sampling
with validity masks, and the "drop the easiest 25%" selection becomes a
rank-mask over a full sort — everything static-shape under jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VNLConfig:
    focal_x: float
    focal_y: float
    input_size: tuple[int, int]  # (H, W)
    delta_cos: float = 0.867
    delta_diff_x: float = 0.005
    delta_diff_y: float = 0.005
    delta_diff_z: float = 0.005
    delta_z: float = 0.0001
    sample_ratio: float = 0.15


def transfer_xyz(depth: jax.Array, cfg: VNLConfig) -> jax.Array:
    """Back-projects a depth map to camera-space XYZ (criteria.py:905-910).

    depth: (B, H, W) -> (B, H, W, 3)
    """
    h, w = cfg.input_size
    u0, v0 = w // 2, h // 2
    u = jnp.arange(w, dtype=jnp.float32)[None, None, :] - u0
    v = jnp.arange(h, dtype=jnp.float32)[None, :, None] - v0
    x = u * jnp.abs(depth) / cfg.focal_x
    y = v * jnp.abs(depth) / cfg.focal_y
    return jnp.stack([x, y, depth], axis=-1)


def _sample_indices(key: jax.Array, cfg: VNLConfig) -> jax.Array:
    """3 independent pixel-index draws of n = ratio * H * W (with replacement)."""
    h, w = cfg.input_size
    num = h * w
    n = int(num * cfg.sample_ratio)
    return jax.random.randint(key, (3, n), 0, num)


def _form_groups(xyz: jax.Array, p123: jax.Array) -> jax.Array:
    """Gathers 3-point groups: (B, H, W, 3) + (3, N) -> (B, N, 3coords, 3points)."""
    b = xyz.shape[0]
    flat = xyz.reshape(b, -1, 3)  # (B, HW, 3)
    pts = [jnp.take(flat, p123[i], axis=1) for i in range(3)]  # each (B, N, 3)
    return jnp.stack(pts, axis=-1)  # (B, N, 3, 3)


def _filter_mask(pw_gt: jax.Array, cfg: VNLConfig) -> jax.Array:
    """Validity mask per group (criteria.py:955-988): keep groups that are
    non-colinear, not-all-near-identical, and fully inside valid depth."""
    p12 = pw_gt[..., 1] - pw_gt[..., 0]
    p13 = pw_gt[..., 2] - pw_gt[..., 0]
    p23 = pw_gt[..., 2] - pw_gt[..., 1]
    diff = jnp.stack([p12, p13, p23], axis=-1)  # (B, N, 3coords, 3diffs)

    # cosine-colinearity: normalized gram matrix of the 3 difference vectors
    q = jnp.swapaxes(diff, -1, -2)  # (B, N, 3diffs, 3coords)
    norms = jnp.linalg.norm(q, axis=-1)  # (B, N, 3)
    gram = jnp.einsum("bnic,bnjc->bnij", q, q)
    nm = norms[..., :, None] * norms[..., None, :]
    energy = gram / (nm + 1e-8)
    over = (energy > cfg.delta_cos) | (energy < -cfg.delta_cos)
    mask_cos = over.reshape(*over.shape[:2], -1).sum(axis=-1) > 3

    mask_pad = (pw_gt[..., 2, :] > cfg.delta_z).sum(axis=-1) == 3

    near_x = (jnp.abs(diff[..., 0, :]) < cfg.delta_diff_x).sum(axis=-1) > 0
    near_y = (jnp.abs(diff[..., 1, :]) < cfg.delta_diff_y).sum(axis=-1) > 0
    near_z = (jnp.abs(diff[..., 2, :]) < cfg.delta_diff_z).sum(axis=-1) > 0

    mask_ignore = (near_x & near_y & near_z) | mask_cos
    return mask_pad & ~mask_ignore


def _unit_normals(groups: jax.Array) -> jax.Array:
    """Cross-product normals with the reference's zero-norm guard
    (criteria.py:1025-1038): norm==0 -> add 0.01 before dividing."""
    p12 = groups[..., 1] - groups[..., 0]
    p13 = groups[..., 2] - groups[..., 0]
    normal = jnp.cross(p12, p13, axis=-1)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    norm = norm + (norm == 0.0).astype(normal.dtype) * 0.01
    return normal / norm


def vnl_loss(
    gt_depth: jax.Array,
    pred_depth: jax.Array,
    cfg: VNLConfig,
    key: jax.Array,
    select: bool = True,
    p123: jax.Array | None = None,
) -> jax.Array:
    """Virtual-normal loss (criteria.py:1011-1045).

    Args:
        gt_depth, pred_depth: (B, H, W) or (B, H, W, 1) depth maps.
        key: PRNG key for the point sampling (the reference uses np.random;
            we thread explicit keys).
        select: drop the smallest 25% of group losses (reference default).
        p123: optional (3, N) flat pixel indices overriding the sampling —
            everything after the draw is deterministic, so injecting the
            same groups into the reference proves tail parity
            (tests/test_reference_parity.py::test_vnl_loss_tail_parity).

    Reference quirk NOT copied: criteria.py:1004's z==0 guard indexes the
    (B, N, coords, points) prediction groups with a (B, N, points) boolean
    mask, so torch treats the POINT index as the COORDS axis and overwrites
    coordinate k of all three points whenever point k has z == 0. We guard
    the z coordinate of the offending point, which is what the guard is for.
    """
    if gt_depth.ndim == 4:
        gt_depth = gt_depth[..., 0]
    if pred_depth.ndim == 4:
        pred_depth = pred_depth[..., 0]
    # promote (not cast): bf16 -> f32, f64 passes through for the f64
    # gradient-parity certificate (tests/test_gradient_parity.py)
    dt = jnp.promote_types(pred_depth.dtype, jnp.float32)
    gt_depth = gt_depth.astype(dt)
    pred_depth = pred_depth.astype(dt)

    xyz_gt = transfer_xyz(gt_depth, cfg)
    xyz_pred = transfer_xyz(pred_depth, cfg)

    if p123 is None:
        p123 = _sample_indices(key, cfg)
    pw_gt = _form_groups(xyz_gt, p123)
    pw_pred = _form_groups(xyz_pred, p123)
    valid = _filter_mask(pw_gt, cfg)  # (B, N)

    # z == 0 guard on predictions (criteria.py:1004)
    z = pw_pred[..., 2, :]
    pw_pred = pw_pred.at[..., 2, :].set(jnp.where(z == 0.0, 1e-4, z))

    # groups are (B, N, coords, points); _unit_normals subtracts along the
    # points axis and crosses along the coords axis
    gt_n = _unit_normals(pw_gt)
    dt_n = _unit_normals(pw_pred)

    loss = jnp.abs(gt_n - dt_n).sum(axis=-1)  # (B, N) — sum over xyz
    flat = loss.reshape(-1)
    vflat = valid.reshape(-1)
    total = flat.shape[0]
    n_valid = vflat.sum()

    if not select:
        return (flat * vflat).sum() / jnp.maximum(n_valid, 1.0)

    # keep the worst 75% of VALID groups: invalid -> -inf sorts to the front
    keyed = jnp.where(vflat > 0, flat, -jnp.inf)
    srt = jnp.sort(keyed)
    n_invalid = total - n_valid
    start = n_invalid + jnp.floor(0.25 * n_valid)
    keep = jnp.arange(total) >= start
    kept_sum = jnp.where(keep & jnp.isfinite(srt), srt, 0.0).sum()
    kept_count = jnp.maximum(total - start, 1.0)
    return kept_sum / kept_count


@functools.lru_cache(maxsize=8)
def _wcel_weight(dec_out_c: int) -> jnp.ndarray:
    import numpy as np

    w = np.array(
        [[np.exp(-0.2 * (i - j) ** 2) for i in range(dec_out_c)] for j in range(dec_out_c)]
    )
    w /= w.sum(axis=1, keepdims=True)
    return w  # f64 numpy; cast to the compute dtype at use


def wcel_loss(
    pred_logit: jax.Array,
    gt_bins: jax.Array,
    gt_depth: jax.Array,
    dec_out_c: int,
) -> jax.Array:
    """Gaussian-weighted cross entropy over depth bins (criteria.py:839-863).

    Args:
        pred_logit: (B, H, W, C) bin logits.
        gt_bins: (B, H, W) int bin labels; invalid pixels carry C+1 (out of
            range -> zero one-hot row, contributing nothing).
        gt_depth: (B, H, W) depth for the valid-pixel count.
    """
    c = dec_out_c
    dt = jnp.promote_types(pred_logit.dtype, jnp.float32)
    weight = _wcel_weight(c).astype(dt)
    log_pred = jax.nn.log_softmax(pred_logit.astype(dt), axis=-1)
    one_hot = jax.nn.one_hot(gt_bins, c, dtype=dt)  # (B,H,W,C)
    w = jnp.einsum("bhwc,cd->bhwd", one_hot, weight)
    valid_pixels = jnp.maximum((gt_depth > 0).sum().astype(dt), 1.0)
    return -(w * log_pred).sum() / valid_pixels


def model_loss(
    pred_depth: jax.Array,
    pred_logit: jax.Array,
    gt_bins: jax.Array,
    gt_depth: jax.Array,
    cfg: VNLConfig,
    dec_out_c: int,
    diff_loss_weight: float,
    key: jax.Array,
) -> jax.Array:
    """WCEL + lambda * VNL (criteria.py:1047-1062)."""
    metric = wcel_loss(pred_logit, gt_bins, gt_depth, dec_out_c)
    normal = vnl_loss(gt_depth, pred_depth, cfg, key)
    return metric + diff_loss_weight * normal
