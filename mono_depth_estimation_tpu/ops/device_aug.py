"""Device-side train augmentation: the whole geometric pipeline as ONE
batched affine resample on the TPU.

Why: the production host is the input-pipeline floor. The cv2 fast path
(data/policies_fast.py) costs ~37 CPU-core-ms per 512x512 stdepth sample;
on the single-core hosts these chips front, that caps fed training at
~16 img/s against a 48.3 img/s device step (bench_extra.json fed_train;
48.3 is the round-5-corrected in-graph flagship b16 rate — the 86.9
quoted in rounds 3-4 was the accidental bts_size=64 decoder).
The TPU-first fix is to stop augmenting on the host entirely: the Loader
ships the RAW decoded sample (uint8 rgb + target planes, via the
data/raw_cache.py mmap cache) and the jitted train step applies the
augmentation as a batched gather — per-sample random parameters drawn
in-graph from the step's PRNG key.

The geometry: every policy chain (border crop -> rotate -> resize-shorter
-> random crop -> h-flip) is a composition of affines, so output pixel
(i, j) of sample b reads source point ``A_b @ (j, i, 1)`` — ONE bilinear
resample per sample instead of 5 sequential cv2 passes over 13 planes.
Matrices follow cv2 conventions exactly (getRotationMatrix2D center
``(w/2-0.5, h/2-0.5)``, resize half-pixel mapping ``src = (dst+0.5)/f -
0.5``; pinned against cv2's own composed matrices in
tests/test_device_aug.py).

Parity class: train-only, "statistically equivalent" — the same class as
the cv2 fast path itself (policies_fast.py docstring). Two deliberate
deltas, both quality-improving and train-only:
  * one composed BILINEAR resample instead of per-stage interpolation
    (the cv2 chain rotates with INTER_NEAREST then resizes INTER_LINEAR;
    for the bts scale set {512..720}/461 every resize is an upscale, so
    the composition is near-identical);
  * targets stay float through the aug — the reference quantizes every
    plane through 8-bit PIL images (ToPILImage mul(255).byte(),
    modules/base_module.py train_preprocess), the fast path mirrors that
    with uint8 cv2 kernels; here the gather interpolates the stored
    float values directly.
Val/test transforms are untouched (PIL-exact — those define eval parity).

Reference parity surface: modules/bts.py train_preprocess (rotate 2.5,
scales, 512 crop, flip), modules/base_module.py:210-248 (default chain),
modules/my.py (color jitter) — re-expressed as composed affines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ matrices
# 3x3 homogeneous helpers; points are (x, y, 1) column vectors, cv2 axis
# order (x = column, y = row). All are INVERSE maps: output -> source.

def _translate(tx, ty):
    z, o = jnp.zeros(()), jnp.ones(())
    return jnp.array([[o, z, tx], [z, o, ty], [z, z, o]])


def _scale_inv(f):
    """Inverse of cv2.resize by factor f: src = (dst + 0.5)/f - 0.5."""
    inv = 1.0 / f
    z, o = jnp.zeros(()), jnp.ones(())
    off = 0.5 * inv - 0.5
    return jnp.array([[inv, z, off], [z, inv, off], [z, z, o]])


def _rotate_inv(angle_deg, w, h):
    """Inverse of cv2.warpAffine(getRotationMatrix2D(c, angle, 1)) with
    c = (w/2 - 0.5, h/2 - 0.5) — data/policies_fast.py GeomPipe.rotate."""
    t = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(t), jnp.sin(t)
    cx, cy = w / 2.0 - 0.5, h / 2.0 - 0.5
    # forward M = [[c, s],[-s, c]] about (cx, cy); inverse is its transpose
    a, b = c, -s
    z, o = jnp.zeros(()), jnp.ones(())
    return jnp.array([
        [a, b, cx - a * cx - b * cy],
        [-b, a, cy + b * cx - a * cy],
        [z, z, o],
    ])


def _flip_x(do_flip, w):
    o, z = jnp.ones(()), jnp.zeros(())
    sx = jnp.where(do_flip, -o, o)
    tx = jnp.where(do_flip, w - 1.0, 0.0)
    return jnp.array([[sx, z, tx], [z, o, z], [z, z, o]])


# ------------------------------------------------------------ resampler

def affine_sample(img: jax.Array, mat: jax.Array, out_hw: tuple[int, int],
                  ) -> jax.Array:
    """Bilinear-resample one (H, W, C) image at source points
    ``mat @ (x_out, y_out, 1)``; taps outside the image contribute 0
    (cv2 BORDER_CONSTANT semantics, including partial border pixels)."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    ys, xs = jnp.mgrid[0:oh, 0:ow]
    sx = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    sy = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0).astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating)
          else jnp.float32)
    wy = (sy - y0).astype(wx.dtype)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    flat = img.reshape(h * w, -1)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = flat[idx.reshape(-1)].reshape(oh, ow, -1)
        return vals * valid[..., None].astype(vals.dtype)

    p00 = tap(y0i, x0i)
    p01 = tap(y0i, x0i + 1)
    p10 = tap(y0i + 1, x0i)
    p11 = tap(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def affine_sample_batch(imgs: jax.Array, mats: jax.Array,
                        out_hw: tuple[int, int]) -> jax.Array:
    """(B, H, W, C) x (B, 3, 3) -> (B, oh, ow, C)."""
    return jax.vmap(lambda im, m: affine_sample(im, m, out_hw))(imgs, mats)


# ------------------------------------------------------------ policies

def bts_matrix(angle, s_short, oy, ox, do_flip, src_hw, out_hw,
               border_frac: float = 0.05):
    """Fixed-parameter inverse affine for the BTS chain: border_crop ->
    rotate(angle) -> resize_shorter(s_short) -> crop at (oy, ox) ->
    flip. Pure function of traced scalars (tests pin it against cv2's own
    composed matrices)."""
    h, w = src_hw
    oh, ow = out_hw
    top, left = int(h * border_frac), int(w * border_frac)
    ch = int(h * (1 - border_frac)) - top
    cw = int(w * (1 - border_frac)) - left
    f = jnp.float32(s_short) / jnp.float32(min(ch, cw))
    m = _translate(jnp.float32(left), jnp.float32(top))      # border crop
    m = m @ _rotate_inv(angle, cw, ch)                       # rotate
    m = m @ _scale_inv(f)                                    # resize
    m = m @ _translate(ox, oy)                               # crop
    m = m @ _flip_x(do_flip, float(ow))                      # flip
    return m


def bts_affine_params(key: jax.Array, src_hw: tuple[int, int],
                      out_hw: tuple[int, int],
                      scales=(512, 518, 550, 600, 650, 720),
                      border_frac: float = 0.05,
                      max_angle: float = 2.5):
    """Per-sample inverse affine for the BTS train chain
    (policies_fast.bts_train_fast): border_crop(0.05) -> rotate(+-2.5) ->
    resize_shorter(choice(scales)) -> random crop out_hw -> flip(0.5).
    Returns one (3, 3) matrix; vmap over split keys for a batch."""
    h, w = src_hw
    oh, ow = out_hw
    k_rot, k_s, k_cy, k_cx, k_f = jax.random.split(key, 5)
    top = int(h * border_frac)
    ch = int(h * (1 - border_frac)) - top
    cw = int(w * (1 - border_frac)) - int(w * border_frac)
    angle = jax.random.uniform(k_rot, (), minval=-max_angle, maxval=max_angle)
    s_short = jax.random.choice(k_s, jnp.asarray(scales, jnp.float32))
    f = s_short / jnp.float32(min(ch, cw))
    rh, rw = jnp.round(ch * f), jnp.round(cw * f)  # resized extent
    # random crop offsets in resized space (uniform ints via floats: the
    # host twin uses rng.integers(0, n+1); here uniform*range floored)
    oy = jnp.floor(jax.random.uniform(k_cy, ()) * (rh - oh + 1.0))
    ox = jnp.floor(jax.random.uniform(k_cx, ()) * (rw - ow + 1.0))
    do_flip = jax.random.uniform(k_f, ()) > 0.5
    return bts_matrix(angle, s_short, oy, ox, do_flip, src_hw, out_hw,
                      border_frac)


def default_affine_params(key: jax.Array, src_hw: tuple[int, int],
                          out_hw: tuple[int, int], resize: int,
                          max_angle: float = 5.0):
    """policies_fast.default_train_fast chain (eigen/laina):
    resize_shorter(resize) -> rotate(+-5) -> resize_shorter(resize*s),
    s~U(1,1.5) -> center_crop(out) -> flip(0.5)."""
    h, w = src_hw
    oh, ow = out_hw
    k_s, k_rot, k_f = jax.random.split(key, 3)
    s = jax.random.uniform(k_s, (), minval=1.0, maxval=1.5)
    f1 = jnp.float32(resize) / jnp.float32(min(h, w))
    h1, w1 = jnp.round(h * f1), jnp.round(w * f1)
    angle = jax.random.uniform(k_rot, (), minval=-max_angle, maxval=max_angle)
    # GeomPipe resize_shorter(int(resize*s)) after the rotate
    s2 = jnp.floor(jnp.float32(resize) * s)
    f2 = s2 / jnp.minimum(h1, w1)
    h2, w2 = jnp.round(h1 * f2), jnp.round(w1 * f2)
    # center_crop(out) (GeomPipe.center_crop round semantics)
    oy = jnp.round((h2 - oh) / 2.0)
    ox = jnp.round((w2 - ow) / 2.0)
    do_flip = jax.random.uniform(k_f, ()) > 0.5

    m = _scale_inv(f1)
    m = m @ _rotate_inv(angle, w1, h1)
    m = m @ _scale_inv(f2)
    m = m @ _translate(ox, oy)
    m = m @ _flip_x(do_flip, float(ow))
    return m


def my_color_jitter(key: jax.Array, rgb: jax.Array) -> jax.Array:
    """policies_fast.my_train_fast color aug, batched: with p=0.5 apply
    gamma U(0.9,1.1), brightness U(0.75,1.25), per-channel U(0.9,1.1)."""
    b = rgb.shape[0]
    k_p, k_g, k_b, k_c = jax.random.split(key, 4)
    do = jax.random.uniform(k_p, (b, 1, 1, 1)) > 0.5
    gamma = jax.random.uniform(k_g, (b, 1, 1, 1), minval=0.9, maxval=1.1)
    bright = jax.random.uniform(k_b, (b, 1, 1, 1), minval=0.75, maxval=1.25)
    colors = jax.random.uniform(k_c, (b, 1, 1, 3), minval=0.9, maxval=1.1)
    out = jnp.clip(rgb ** gamma * bright * colors, 0.0, 1.0)
    return jnp.where(do, out, rgb).astype(rgb.dtype)


# policy name -> (params_fn(key, src_hw, out_hw, resize) -> (3,3),
#                 color_fn(key, rgb_batch) or None)
DEVICE_AUG_POLICIES = {
    "bts": (lambda k, s, o, r: bts_affine_params(k, s, o), None),
    "default": (default_affine_params, None),
    "laina": (default_affine_params, None),
    "my": (
        lambda k, s, o, r: bts_affine_params(
            k, s, o, scales=(416, 452, 489, 507, 518, 550, 600, 650, 720)
        ),
        my_color_jitter,
    ),
}


def make_device_augment(policy: str, src_hw: tuple[int, int],
                        out_hw: tuple[int, int], resize: int | None):
    """Returns ``augment((x, y), key) -> (x, y)`` for the jitted train
    step: x (B, src_h, src_w, Cx) float in [0,1] (already dequantized),
    y (B, src_h, src_w, Cy) float. The SAME per-sample affine warps both
    (concatenated: one gather), then the policy's color jitter (if any)
    touches x alone."""
    params_fn, color_fn = DEVICE_AUG_POLICIES[policy]

    def augment(batch, key):
        x, y = batch
        b = x.shape[0]
        k_geo, k_col = jax.random.split(key)
        mats = jax.vmap(
            lambda k: params_fn(k, src_hw, out_hw, resize)
        )(jax.random.split(k_geo, b))
        stacked = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
        out = affine_sample_batch(stacked, mats, out_hw)
        cx = x.shape[-1]
        x_out, y_out = out[..., :cx], out[..., cx:].astype(y.dtype)
        if color_fn is not None:
            x_out = color_fn(k_col, x_out)
        return x_out, y_out

    return augment
