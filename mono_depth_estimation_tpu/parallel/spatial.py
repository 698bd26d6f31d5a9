"""Spatially-sharded convolution with halo exchange.

The framework's analogue of long-context/sequence parallelism (SURVEY §5):
for images too large for one chip's HBM, the H axis is sharded across mesh
devices and convolutions exchange ``k//2`` boundary rows with their
neighbors over ICI (jax.lax.ppermute) before convolving locally — output
is bit-identical to the unsharded 'SAME' convolution.

This is the scalability extension the reference has no counterpart for
(its largest input is 720px); it unlocks eval on multi-K-pixel imagery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_exchange(x_local: jax.Array, pad: int, axis_name: str) -> jax.Array:
    """Prepends/appends ``pad`` rows from the neighbor shards (zeros at the
    outer boundary), turning a local (B, Hs, W, C) block into
    (B, Hs + 2*pad, W, C)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # bottom rows travel DOWN to the next shard (become its top halo)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(x_local[:, -pad:], axis_name, perm=fwd)
    from_below = jax.lax.ppermute(x_local[:, :pad], axis_name, perm=bwd)

    zero = jnp.zeros_like(from_above)
    top = jnp.where(idx == 0, zero, from_above)
    bot = jnp.where(idx == n - 1, zero, from_below)
    return jnp.concatenate([top, x_local, bot], axis=1)


def spatially_sharded_apply(apply_fn, variables, x: jax.Array, mesh: Mesh,
                            axis: str = "data"):
    """Runs a whole NHWC model forward with the image H axis sharded over
    ``axis`` — eval on imagery too large for one chip's HBM.

    This is the production form of the mechanism ``halo_conv2d`` spells out
    by hand: with the input placed P(None, axis) and params replicated, XLA's
    GSPMD partitioner propagates the spatial sharding through every conv /
    pool / resize in the model and inserts the boundary halo exchanges over
    ICI itself. Works for arbitrary stride/dilation stacks (ResNet included),
    which a manual halo pass would have to special-case.

    Args:
        apply_fn: ``lambda variables, x: model.apply(variables, x, ...)``.
        variables: model variables (will be replicated).
        x: (B, H, W, C) with H divisible by the mesh axis size.
        mesh: the device mesh; ``axis`` names the mesh axis to shard H over.

    Returns the forward output (fully addressable).
    """
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    with mesh:
        return jax.jit(apply_fn)(vs, xs)


def halo_conv2d(
    x: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
) -> jax.Array:
    """'SAME' NHWC conv2d with the H axis sharded over ``axis_name``.

    Args:
        x: (B, H, W, Cin) with H divisible by the mesh axis size.
        w: (kh, kw, Cin, Cout), odd kernel.

    Returns (B, H, W, Cout), sharded the same way, numerically identical to
    ``lax.conv_general_dilated(x, w, padding='SAME')``.
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only"
    pad_h, pad_w = kh // 2, kw // 2

    def local_conv(x_local, w):
        x_h = _halo_exchange(x_local, pad_h, axis_name)
        return jax.lax.conv_general_dilated(
            x_h, w,
            window_strides=(1, 1),
            padding=[(0, 0), (pad_w, pad_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local_conv,
        mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(None, axis_name),
    )(x, w)
