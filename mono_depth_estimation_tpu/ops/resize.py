"""Resize / crop primitives with explicit filter semantics.

The reference mixes three resize flavors the rebuild must reproduce closely
(SURVEY.md §7 "hard parts" #4):

* PIL ``transforms.Resize`` — bilinear with antialias, shorter-side sizing
  (eval transforms, e.g. modules/base_module.py:267-281).
* ``torch.nn.functional.interpolate`` — bilinear without antialias,
  align_corners False (default) or True (DORN, network/Dorn.py:120-127).
* nearest-neighbor up/down scaling (BTS LPG rescales, network/Bts.py:232,246).

All functions take NHWC (or HWC) arrays and are jit-safe for static sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ensure_batched(x):
    if x.ndim == 3:
        return x[None], True
    return x, False


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    antialias: bool = False,
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C)."""
    x, squeeze = _ensure_batched(x)
    h, w = size
    if align_corners:
        out = _resize_align_corners(x, (h, w))
    else:
        out = jax.image.resize(
            x,
            (*x.shape[:-3], h, w, x.shape[-1]),
            method="linear",
            antialias=antialias,
        )
    return out[0] if squeeze else out


def _interp_matrix_np(n_in: int, n_out: int):
    """(n_out, n_in) align-corners bilinear interpolation matrix: two
    nonzeros per row, ``M[i, y0]=1-w`` and ``M[i, y1]=w``. Computed in
    numpy (sizes are compile-time constants) so callers can inspect the
    CONCRETE weights — the bf16-exactness fast path below needs that —
    and XLA still folds the constant into the program."""
    import numpy as np

    if n_out == 1 or n_in == 1:
        # out coord (or the only in coord) is 0: every row reads input 0
        m = np.zeros((n_out, n_in), np.float32)
        m[:, 0] = 1.0
        return m
    yy = np.arange(n_out, dtype=np.float32) * np.float32(
        (n_in - 1) / (n_out - 1)
    )
    y0 = np.clip(np.floor(yy).astype(np.int32), 0, n_in - 1)
    y1 = np.clip(y0 + 1, 0, n_in - 1)
    w = (yy - y0.astype(np.float32))[:, None]
    m = np.zeros((n_out, n_in), np.float32)
    # y0 == y1 on exact-hit rows: (1-w)+w collapses to a single 1 there.
    np.put_along_axis(m, y0[:, None], 1.0 - w, axis=1)
    m[np.arange(n_out), y1] += w[:, 0]
    return m


def _bf16_exact(m) -> bool:
    """True iff every interpolation weight survives the bf16 round trip —
    e.g. any out = 2*in - 1 stage (weights {0, 0.5, 1}) or DORN's
    33x45 -> 257x353 (scale exactly 1/8: weights k/8)."""
    import ml_dtypes
    import numpy as np

    return bool(
        (m == m.astype(ml_dtypes.bfloat16).astype(np.float32)).all()
    )


def _resize_align_corners(
    x: jax.Array, size: tuple[int, int], force: str | None = None
) -> jax.Array:
    """torch F.interpolate(..., align_corners=True) semantics.

    Three implementations, same float math (gather products were
    f32-promoted; the matmuls accumulate f32; the stencil's 0.5 scalings are
    exact), dispatched by backend and geometry:

    * TPU: two small matmuls (separable interpolation,
      ``M_h @ x`` then ``x @ M_w^T``) riding the MXU instead of
      materializing 4 output-sized corner tensors in HBM — the DORN
      headline's 33x45 -> 257x353 x136ch tail drops 14.9 -> 0.95 ms
      (kernel_bench.json), eval 352 -> 481 img/s.
    * CPU (tests, tooling): the 4-corner gather — dense interpolation
      matrices are ~in_dim x more FLOPs than the 4 gathers, a bad trade off
      the MXU. ``force`` ('matmul'/'gather'/'stencil') pins a form for
      tests.

    The choice is made per LOWERING platform (lax.platform_dependent), not
    per trace-time backend, so a multi-platform jax.export artifact gets the
    right form on each platform (tools/export_model.py --platforms). The
    matmuls run at Precision.HIGHEST: default TPU matmul precision truncates
    f32 operands to bf16, which would break the torch align_corners parity
    the gather form (and tests/test_resize.py) pins; the interp matrices are
    tiny so full precision costs nothing against the measured 15x win."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = size

    def _matmul(x):
        mh_np = _interp_matrix_np(in_h, out_h)
        mw_np = _interp_matrix_np(in_w, out_w)
        if (x.dtype == jnp.bfloat16 and _bf16_exact(mh_np)
                and _bf16_exact(mw_np)):
            # 1-pass bf16 fast path (round 4): when every interpolation
            # weight is exactly bf16-representable (all the VNL topdown
            # 2n-1 stages: weights {0,.5,1}; DORN's 1/8-scale headline
            # upsample: weights k/8) and the activations are already bf16,
            # each einsum is a plain bf16 MXU matmul with f32 accumulation
            # — per-pass BIT-EQUAL to the f32 gather on the same bf16
            # inputs (products of exact-bf16 weights are exact in the f32
            # accumulator; zeros add exactly). Only new rounding: the
            # H-pass intermediate rounds to bf16 (<=1 bf16 ulp on
            # doubly-interpolated points vs the f32-intermediate form).
            # The HIGHEST f32 path below costs ~6 MXU passes; this is 1:
            # measured 14.6 -> 4.2 ms on the VNL 193->385 tail, full VNL
            # 78.0 -> 67.7 ms / 205 -> 236 img/s (+15%)
            # (profile_zoo.json resize193to385_only, round 4).
            y = jnp.einsum("oh,...hwc->...owc",
                           jnp.asarray(mh_np, jnp.bfloat16), x)
            return jnp.einsum("pw,...hwc->...hpc",
                              jnp.asarray(mw_np, jnp.bfloat16), y)
        mh, mw = jnp.asarray(mh_np), jnp.asarray(mw_np)
        xf = x.astype(jnp.float32)
        y = jnp.einsum("oh,...hwc->...owc", mh, xf,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("pw,...hwc->...hpc", mw, y,
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(x.dtype)

    if force is None:
        return jax.lax.platform_dependent(
            x, cpu=lambda x: _gather_align_corners(x, size), default=_matmul
        )
    if force == "matmul":
        return _matmul(x)
    if force == "stencil":
        assert out_h == 2 * in_h - 1 and out_w == 2 * in_w - 1, (x.shape, size)
        return _stencil_up2m1(x)
    return _gather_align_corners(x, size)


def _stencil_up2m1(x: jax.Array) -> jax.Array:
    """Align-corners bilinear upsample to (2H-1, 2W-1): the scale is then
    exactly 0.5, so even outputs copy inputs and odd outputs are midpoints —
    a 2-tap stencil, bit-equal to the gather form in f32 (a*0.5 and b*0.5
    are exact power-of-two scalings; W-lerp-then-H matches the gather's
    rounding order; tests/test_resize.py pins equality).

    MEASURED NEGATIVE RESULT on TPU (kept for the record, not dispatched):
    the 193->385 x256ch VNL tail upsample runs 28.1 ms in this form vs
    14.6 ms for the dense-matmul form (profile_zoo.json, round 4) — the
    (W-1, 2, C) -> (2W-2, C) reshape is a lane-dimension interleave, the
    same shuffle whose removal from the DORN ordinal head was worth +18%
    (models/dorn.py). XLA's MXU matmul beats ~96x fewer FLOPs spent in the
    VPU's relayout path. f32 math, cast back."""
    xf = x.astype(jnp.float32)

    def up_h(a):
        head, tail = a[..., :-1, :, :], a[..., 1:, :, :]
        mid = (head + tail) * 0.5
        pairs = jnp.stack([head, mid], axis=-3)  # (..., H-1, 2, W, C)
        merged = pairs.reshape(
            *a.shape[:-3], 2 * (a.shape[-3] - 1), a.shape[-2], a.shape[-1]
        )
        return jnp.concatenate([merged, a[..., -1:, :, :]], axis=-3)

    def up_w(a):
        head, tail = a[..., :, :-1, :], a[..., :, 1:, :]
        mid = (head + tail) * 0.5
        pairs = jnp.stack([head, mid], axis=-2)  # (..., H, W-1, 2, C)
        merged = pairs.reshape(
            *a.shape[:-3], a.shape[-3], 2 * (a.shape[-2] - 1), a.shape[-1]
        )
        return jnp.concatenate([merged, a[..., :, -1:, :]], axis=-2)

    # W first, then H — the gather form's lerp order (horizontal within the
    # row pair, then vertical): keeps the odd-odd midpoints bit-equal
    # (H-first differs by 1 ulp through the non-associative adds)
    return up_h(up_w(xf)).astype(x.dtype)


def _gather_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = size

    def coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.float32)
        scale = (n_in - 1) / (n_out - 1)
        return jnp.arange(n_out, dtype=jnp.float32) * scale

    yy, xx = coords(in_h, out_h), coords(in_w, out_w)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, in_h - 1)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, in_w - 1)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    wy = (yy - y0.astype(jnp.float32))[:, None, None]
    wx = (xx - x0.astype(jnp.float32))[None, :, None]
    rows0, rows1 = jnp.take(x, y0, axis=-3), jnp.take(x, y1, axis=-3)
    p00, p01 = jnp.take(rows0, x0, axis=-2), jnp.take(rows0, x1, axis=-2)
    p10, p11 = jnp.take(rows1, x0, axis=-2), jnp.take(rows1, x1, axis=-2)
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize with torch 'nearest' index math (floor)."""
    x, squeeze = _ensure_batched(x)
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = size
    ys = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    out = jnp.take(jnp.take(x, ys, axis=-3), xs, axis=-2)
    return out[0] if squeeze else out


def center_crop(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Center crop of (..., H, W, C); pads with zeros if smaller (PIL parity)."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = size
    pad_h, pad_w = max(th - h, 0), max(tw - w, 0)
    if pad_h or pad_w:
        cfg = [(0, 0)] * (x.ndim - 3)
        cfg += [
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ]
        x = jnp.pad(x, cfg)
        h, w = x.shape[-3], x.shape[-2]
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return x[..., top : top + th, left : left + tw, :]


def shorter_side_size(h: int, w: int, size: int) -> tuple[int, int]:
    """PIL transforms.Resize(int) target shape: shorter side -> size."""
    if h <= w:
        return size, max(1, int(round(w * size / h)))
    return max(1, int(round(h * size / w))), size


def resize_shorter_side(x: jax.Array, size: int, antialias: bool = True) -> jax.Array:
    """PIL-style shorter-side resize with antialiased bilinear filtering."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, shorter_side_size(h, w, size), antialias=antialias)
