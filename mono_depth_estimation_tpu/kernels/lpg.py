"""Pallas TPU kernel for Local Planar Guidance (ops/lpg.py twin).

Layout strategy: the (B, h, w, 4) plane stack is processed per batch row
with the channel dim unpacked into four (h, w) planes resident in VMEM; the
kernel expands each plane-eq cell to its r x r window and evaluates
n4 / (n1*u + n2*v + n3) directly into the (h*r, w*r) output tile — one HBM
read of the 4 planes, one HBM write of the output, all math on the VPU.

The jnp twin (ops/lpg.py) lowers to repeat + broadcast + divide, which XLA
fuses but materializes the repeated (h*r, w*r, 4) intermediate when fusion
caps are hit; the kernel never does.

Grid: one program per batch element; rows are processed whole (w*r lanes),
which keeps the lane dim contiguous. Shapes must satisfy w*r % 128 == 0 for
the un-padded fast path; ops/lpg.local_planar_guidance falls back to jnp
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lpg_kernel(plane_ref, out_ref, *, upratio: int):
    # plane_ref: (1, h, w, 4) VMEM; out_ref: (1, h*r, w*r) VMEM
    r = upratio
    _, h, w, _ = plane_ref.shape
    dtype = plane_ref.dtype

    # Nearest-neighbor r-fold expansion as 0/1 expansion-matrix matmuls —
    # Mosaic has no interleaving shape cast, but the MXU eats these:
    #   rows: (h*r, h) @ (h, w)      cols: (h*r, w) @ (w, w*r)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h * r, h), 0) // r
    row_j = jax.lax.broadcasted_iota(jnp.int32, (h * r, h), 1)
    e_rows = (row_i == row_j).astype(dtype)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (w, w * r), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (w, w * r), 1) // r
    e_cols = (col_i == col_j).astype(dtype)

    def expand(p):  # (h, w) -> (h*r, w*r)
        up = jnp.dot(e_rows, p, preferred_element_type=jnp.float32)
        return jnp.dot(up, e_cols, preferred_element_type=jnp.float32)

    n1e = expand(plane_ref[0, :, :, 0])
    n2e = expand(plane_ref[0, :, :, 1])
    n3e = expand(plane_ref[0, :, :, 2])
    n4e = expand(plane_ref[0, :, :, 3])
    u = jax.lax.broadcasted_iota(jnp.int32, (h * r, w * r), 1) % r
    v = jax.lax.broadcasted_iota(jnp.int32, (h * r, w * r), 0) % r
    uf = (u.astype(n1e.dtype) - (r - 1) * 0.5) / r
    vf = (v.astype(n1e.dtype) - (r - 1) * 0.5) / r
    out_ref[0, :, :] = n4e / (n1e * uf + n2e * vf + n3e)


def _pick_row_block(h: int, w: int, r: int, budget_bytes: int = 2 << 20) -> int:
    """Largest row block whose output tile fits the VMEM budget."""
    hb = h
    while hb > 1 and hb * r * w * r * 4 > budget_bytes:
        hb = (hb + 1) // 2
    while h % hb:
        hb -= 1
    return max(hb, 1)


@functools.partial(jax.jit, static_argnames=("upratio",))
def lpg_pallas(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """(B, h, w, 4) -> (B, h*r, w*r); same math as ops/lpg.py.

    Tiled over batch x row-blocks so the output tile stays within VMEM.
    """
    b, h, w, _ = plane_eq.shape
    r = upratio
    hb = _pick_row_block(h, w, r)
    return pl.pallas_call(
        functools.partial(_lpg_kernel, upratio=r),
        grid=(b, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, w, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb * r, w * r), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * r), plane_eq.dtype),
    )(plane_eq)
