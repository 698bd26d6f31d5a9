"""Depth-map back-projection to camera-space point clouds.

Parity surface: /root/reference/depth2pointcloud.py:12-31 (a Blender script
there; a vectorized on-device op here, per the BASELINE.json north star):

    factor = 2 * tan(angle_x / 2)
    ratio  = max(rows, cols)
    z = -depth                        (camera looks down -Z)
    x = -factor * z * (c - cols/2) / ratio      (mirrored X)
    y =  factor * z * (r - rows/2) / ratio

Invalid pixels (outside the clip range) get z = NaN, x = y = 0 — exactly the
reference's np.where semantics — plus a boolean validity mask so jit-side
consumers can avoid NaN propagation.

Also provides the pinhole form used by the reference VNL loss
(criteria.py:905-910): x = u * depth / fx.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def unproject_fov(
    depth: jax.Array,
    angle_x: float,
    clip_start: float = 0.1,
    clip_end: float = 100.0,
) -> tuple[jax.Array, jax.Array]:
    """Back-projects (..., H, W) depth via a horizontal FOV camera model.

    Returns (points (..., H, W, 3), valid (..., H, W) bool).
    """
    factor = 2.0 * math.tan(angle_x / 2.0)
    rows, cols = depth.shape[-2], depth.shape[-1]
    c = jnp.arange(cols, dtype=depth.dtype)
    r = jnp.arange(rows, dtype=depth.dtype)[:, None]
    valid = (depth > clip_start) & (depth < clip_end)
    z = -jnp.where(valid, depth, jnp.nan)
    ratio = float(max(rows, cols))
    x = -jnp.where(valid, factor * z * (c - (cols / 2)) / ratio, 0.0)
    y = jnp.where(valid, factor * z * (r - (rows / 2)) / ratio, 0.0)
    return jnp.stack([x, y, z], axis=-1), valid


def unproject_pinhole(
    depth: jax.Array, fx: float, fy: float, cx: float | None = None,
    cy: float | None = None,
) -> jax.Array:
    """Pinhole back-projection (VNL transfer_xyz, criteria.py:905-910).

    depth: (..., H, W) -> (..., H, W, 3).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    cx = w // 2 if cx is None else cx
    cy = h // 2 if cy is None else cy
    u = jnp.arange(w, dtype=depth.dtype) - cx
    v = (jnp.arange(h, dtype=depth.dtype) - cy)[:, None]
    x = u * jnp.abs(depth) / fx
    y = v * jnp.abs(depth) / fy
    return jnp.stack([x, y, depth], axis=-1)


def write_ply(path, points, colors=None, valid=None) -> int:
    """ASCII PLY writer (depth2pointcloud.py:132-154 format: xyz + RGBA
    uchar). points (N, 3) float; colors (N, 3) uint8 in BGR->RGB like the
    reference (it writes color[2], color[1], color[0]).

    Returns the number of vertices written.
    """
    import numpy as np

    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if valid is not None:
        keep = np.asarray(valid).reshape(-1)
    else:
        keep = ~np.isnan(pts[:, 0])
    pts = pts[keep]
    if colors is not None:
        cols = np.asarray(colors).reshape(-1, 3)[keep].astype(np.uint8)
    else:
        cols = np.full((len(pts), 3), 255, np.uint8)
    lines = [
        "%f %f %f %d %d %d 0\n" % (p[0], p[1], p[2], c[0], c[1], c[2])
        for p, c in zip(pts, cols)
    ]
    header = (
        "ply\nformat ascii 1.0\nelement vertex %d\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\nend_header\n" % len(lines)
    )
    with open(path, "w") as f:
        f.write(header)
        f.writelines(lines)
    return len(lines)
