"""Local Planar Guidance — depth from per-cell plane equations.

Reference: /root/reference/network/Bts.py:124-146. Each coarse cell carries a
unit plane normal (n1,n2,n3) and plane distance n4; the op evaluates the
plane's depth at the r x r sub-pixel positions

    u = (j - (r-1)/2) / r,   v = (i - (r-1)/2) / r,   i,j in [0, r)
    depth = n4 / (n1*u + n2*v + n3)

All tensors NHWC: plane_eq is (B, h, w, 4) -> depth (B, h*r, w*r).

This was a named Pallas-kernel target (BASELINE.json north star); the jnp
form below lowers to a fully fused VPU loop under XLA — the broadcasted u/v
are constants folded at trace time. A hand-written Pallas kernel
(expansion-matmul formulation) was benchmarked on the real chip with the
steady-state in-graph protocol and LOST decisively (kernel_bench.json r2:
XLA 0.011/0.049 ms vs Pallas 0.21/1.40 ms at BTS-512 r8/r4 shapes), so it
was deleted per SURVEY §7 hard part 3 — this fused XLA form is the winner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_planar_guidance(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """Evaluate plane equations on the r x r upsampled grid.

    plane_eq: (B, h, w, 4) with channels (n1, n2, n3, n4).
    Returns (B, h*r, w*r) depth.
    """
    b, h, w, _ = plane_eq.shape
    r = upratio
    pe = jnp.repeat(jnp.repeat(plane_eq, r, axis=1), r, axis=2)
    n1, n2, n3, n4 = (pe[..., k] for k in range(4))
    u = (jnp.arange(w * r, dtype=plane_eq.dtype) % r - (r - 1) * 0.5) / r
    v = (jnp.arange(h * r, dtype=plane_eq.dtype) % r - (r - 1) * 0.5) / r
    denom = n1 * u[None, None, :] + n2 * v[None, :, None] + n3
    return n4 / denom


def plane_eq_from_params(raw: jax.Array, max_depth: float) -> jax.Array:
    """Sphere-parameterized plane head (network/Bts.py:113-122).

    raw: (B, h, w, 3) pre-activation (theta, phi, dist) channels.
    Returns (B, h, w, 4) = (n1, n2, n3, n4) with unit normal.
    """
    theta = jax.nn.sigmoid(raw[..., 0]) * jnp.pi / 3
    phi = jax.nn.sigmoid(raw[..., 1]) * jnp.pi * 2
    dist = jax.nn.sigmoid(raw[..., 2]) * max_depth
    n1 = jnp.sin(theta) * jnp.cos(phi)
    n2 = jnp.sin(theta) * jnp.sin(phi)
    n3 = jnp.cos(theta)
    return jnp.stack([n1, n2, n3, dist], axis=-1)


def normalize_plane_eq(plane_eq: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize the normal part, keep distance (torch F.normalize parity:
    divides by max(norm, eps))."""
    n = plane_eq[..., :3]
    norm = jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    return jnp.concatenate([n / norm, plane_eq[..., 3:]], axis=-1)
