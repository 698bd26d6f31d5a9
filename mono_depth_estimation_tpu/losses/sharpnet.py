"""SharpNet loss stack: focal boundary, spatial gradients, geometric consensus.

Parity targets: criteria.py DoobNetLoss :367-400, SharpNetLoss :403-473,
SpatialGradientsLoss :548-624, DepthBoundaryConsensusLoss :627-675,
NormalDepthConsensusLoss :678-722.

The reference hardcodes ``.cuda()`` on its Sobel kernels (criteria.py:573,
580, ...); here the kernels are constants folded into the jit program — a
documented fix, not a behavioral change. Despite that hardcoding, the
reference classes ARE cross-run on this CPU host (forward + f64 gradients)
via a ``Tensor.cuda -> identity`` shim: tests/test_sharpnet_losses.py.

KNOWN REFERENCE QUIRK (documented, not copied): SpatialGradientsLoss's
masked smooth branch multiplies its (B,1,H,W) gradient map by
``mask.repeat(1, 3, 1, 1)`` (criteria.py:602) — broadcasting to (B,3,H,W)
and TRIPLING the masked smooth sum for the 1-channel depth maps
SharpNetLoss feeds it. We apply the mask once; the 3x relation is pinned
by test_spatial_gradients_masked_smooth_triple_quirk.

Layout: all maps NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.masked import (
    huber_loss,
    laina_berhu_loss,
    normals_loss,
)

_SOBEL_X = [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]]
_SOBEL_Y = [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]
_LAPLACE = [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]


def _conv3x3(x: jax.Array, kernel2d, scale: float = 1.0 / 8.0) -> jax.Array:
    """Cross-channel 3x3 conv with a single shared kernel, SAME padding.

    Matches the reference's F.conv2d with a kernel repeated over input
    channels (sums across channels, one output channel).
    """
    c = x.shape[-1]
    k = jnp.asarray(kernel2d, dtype=x.dtype) * scale
    k = jnp.tile(k[:, :, None, None], (1, 1, c, 1))  # HWIO, O=1
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)


def doobnet_loss(
    b_pred: jax.Array, b_gt: jax.Array, beta: float = 4.0, gamma: float = 0.5
) -> jax.Array:
    """Focal boundary loss (criteria.py:367-400)."""
    n = b_gt.shape[0]
    bp = b_pred.reshape(-1)
    bg = b_gt.reshape(-1).astype(jnp.float32)

    alpha = 1.0 - bg.sum() / bg.shape[0]
    alfa = alpha * bg + (1.0 - alpha) * (1.0 - bg)

    pt = jnp.clip(bg * bp + (1.0 - bg) * (1.0 - bp), 1e-7, 1.0 - 1e-7)
    power_pt = ((1.0 - pt) ** gamma) * beta * jnp.log(pt)
    return (-(alfa * power_pt)).sum() / n


def spatial_gradients_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    clamp_value: float = 1e-7,
    size_average: bool = True,
    smooth_error: bool = True,
    gradient_loss_on: bool = True,
) -> jax.Array:
    """Sobel log-gradient loss (criteria.py:548-624)."""
    total = 0.0
    if smooth_error:
        diff = jnp.log(jnp.maximum(pred, clamp_value)) - jnp.log(
            jnp.maximum(target, clamp_value)
        )
        gx = _conv3x3(diff, _SOBEL_X)
        gy = _conv3x3(diff, _SOBEL_Y)
        grad = jnp.square(gx) + jnp.square(gy)
        if mask is None:
            smooth = grad.sum()
            if size_average:
                smooth = smooth / grad.size
        else:
            m = mask.astype(grad.dtype)
            smooth = (grad * m).sum()
            if size_average:
                smooth = smooth / jnp.maximum(m.sum(), 1.0)
        total = total + smooth

    if gradient_loss_on:
        lp = jnp.log(jnp.maximum(pred, clamp_value))
        lt = jnp.log(jnp.maximum(target, clamp_value))
        gi = jnp.square(_conv3x3(lp, _SOBEL_X)) + jnp.square(_conv3x3(lp, _SOBEL_Y))
        gt = jnp.square(_conv3x3(lt, _SOBEL_X)) + jnp.square(_conv3x3(lt, _SOBEL_Y))
        total = total + huber_loss(gi, gt, mask, sigma=3.0)
    return total


def depth_boundary_consensus_loss(
    depth: jax.Array,
    boundary: jax.Array,
    mask: jax.Array | None = None,
    clamp_value: float = 1e-7,
) -> jax.Array:
    """criteria.py:627-675."""
    lap = _conv3x3(depth, _LAPLACE)
    gx = _conv3x3(depth, _SOBEL_X)
    gy = _conv3x3(depth, _SOBEL_Y)
    g = jnp.square(gx) + jnp.square(gy)
    b = jnp.clip(boundary, clamp_value, 1.0 - clamp_value)
    loss = jnp.abs(g * jnp.log(b) * lap)
    loss = loss + 1e-4 * jnp.abs(jnp.log(1.0 - b) * jnp.exp(-lap))
    loss = loss + 1e-4 * jnp.abs(b)
    if mask is None:
        return loss.sum() / depth.size
    m = mask.astype(loss.dtype)
    return (loss * m).sum() / jnp.maximum(m.sum(), 1.0)


def normal_depth_consensus_loss(
    normals: jax.Array,
    depth: jax.Array,
    boundary: jax.Array,
    clamp_value: float = 1e-7,
) -> jax.Array:
    """criteria.py:678-722. normals: (B,H,W,3+), depth/boundary: (B,H,W,1)."""
    gx = _conv3x3(depth, _SOBEL_X)
    gy = _conv3x3(depth, _SOBEL_Y)
    g = jnp.concatenate([gx, gy], axis=-1)
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    n2d = normals[..., :2]
    n2d = n2d / jnp.maximum(jnp.linalg.norm(n2d, axis=-1, keepdims=True), 1e-12)

    prod = (g * n2d).sum(axis=-1, keepdims=True)
    prod = jnp.maximum(1.0 - prod, 0.0)
    prod = jnp.abs(prod * (-jnp.log(jnp.maximum(boundary, clamp_value))))
    return prod.mean()


def sharpnet_loss(
    mask_gt: jax.Array,
    d_pred: jax.Array | None = None,
    d_gt: jax.Array | None = None,
    n_pred: jax.Array | None = None,
    n_gt: jax.Array | None = None,
    b_pred: jax.Array | None = None,
    b_gt: jax.Array | None = None,
    use_boundary: bool = False,
    use_geo_consensus: bool = False,
    use_grad: bool = False,
) -> tuple:
    """Combined SharpNet loss (criteria.py:403-473). Returns the 5-tuple
    (depth, grad, normals, boundary, geo) like the reference forward."""
    if mask_gt.ndim == 3:
        mask_gt = mask_gt[..., None]
    mask_valid = mask_gt[..., :1]

    d_loss = n_loss = grad_loss = b_loss = geo_loss = 0.0
    if d_pred is not None:
        if d_gt.ndim == 3:
            d_gt = d_gt[..., None]
        d_loss = laina_berhu_loss(d_pred, d_gt, mask_valid, clamp_val=1e-7)
        if use_grad:
            grad_loss = spatial_gradients_loss(d_pred, d_gt, mask_valid)
    if n_pred is not None:
        n_loss = normals_loss(n_pred, n_gt, mask_valid)
    if use_boundary and b_pred is not None:
        b_loss = 0.01 * doobnet_loss(b_pred, b_gt, beta=4.0, gamma=0.5)
    if use_geo_consensus:
        db = ndb = 0.0
        if d_pred is not None and b_pred is not None:
            db = depth_boundary_consensus_loss(d_pred, b_pred)
        if n_pred is not None and d_pred is not None and b_pred is not None:
            ndb = normal_depth_consensus_loss(n_pred, d_pred, b_pred)
        geo_loss = db + ndb
    return d_loss, grad_loss, n_loss, b_loss, geo_loss
