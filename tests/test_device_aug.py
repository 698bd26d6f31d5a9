"""Device-side augmentation (ops/device_aug.py) vs cv2 ground truth.

The claim under test: the composed per-sample affine + one bilinear
resample on device equals the sequential cv2 chain's geometry. The
matrix builders are pinned against cv2's OWN matrices
(getRotationMatrix2D / invertAffineTransform), and the resampler against
cv2.warpAffine(WARP_INVERSE_MAP, INTER_LINEAR, BORDER_CONSTANT).
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_depth_estimation_tpu.ops.device_aug import (
    affine_sample,
    affine_sample_batch,
    bts_matrix,
    make_device_augment,
    my_color_jitter,
)


def _np_mat(m):
    return np.asarray(m, np.float64)


def _cv2_bts_matrix(angle, s_short, oy, ox, flip, src_hw, out_hw,
                    border=0.05):
    """The same composition built from cv2's own primitives."""
    h, w = src_hw
    oh, ow = out_hw
    top, left = int(h * border), int(w * border)
    ch = int(h * (1 - border)) - top
    cw = int(w * (1 - border)) - left
    f = s_short / min(ch, cw)

    t_border = np.array([[1, 0, left], [0, 1, top], [0, 0, 1]], np.float64)
    rot_fwd = np.vstack([
        cv2.getRotationMatrix2D((cw / 2 - 0.5, ch / 2 - 0.5), angle, 1.0),
        [0, 0, 1],
    ])
    rot_inv = np.vstack([
        cv2.invertAffineTransform(rot_fwd[:2]), [0, 0, 1]
    ])
    s_inv = np.array([[1 / f, 0, 0.5 / f - 0.5],
                      [0, 1 / f, 0.5 / f - 0.5],
                      [0, 0, 1]], np.float64)
    t_crop = np.array([[1, 0, ox], [0, 1, oy], [0, 0, 1]], np.float64)
    flip_m = (np.array([[-1, 0, ow - 1], [0, 1, 0], [0, 0, 1]], np.float64)
              if flip else np.eye(3))
    return t_border @ rot_inv @ s_inv @ t_crop @ flip_m


@pytest.mark.parametrize("angle,s,oy,ox,flip", [
    (0.0, 461, 0.0, 0.0, False),       # pure border-crop identity scale
    (2.5, 512, 3.0, 7.0, False),
    (-1.7, 650, 100.0, 42.0, True),
    (2.2, 720, 207.0, 0.0, True),
])
def test_bts_matrix_matches_cv2_composition(angle, s, oy, ox, flip):
    ours = _np_mat(bts_matrix(
        jnp.float32(angle), jnp.float32(s), jnp.float32(oy),
        jnp.float32(ox), jnp.asarray(flip), (512, 512), (512, 512)
    ))
    ref = _cv2_bts_matrix(angle, s, oy, ox, flip, (512, 512), (512, 512))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_affine_sample_matches_cv2_warp():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    mat = _cv2_bts_matrix(2.0, 70, 5.0, 3.0, True, (64, 80), (48, 56))
    ours = np.asarray(affine_sample(
        jnp.asarray(img), jnp.asarray(mat, jnp.float32), (48, 56)
    ))
    ref = cv2.warpAffine(
        img, mat[:2].astype(np.float64), (56, 48),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    # cv2 uses 5-bit fixed-point interpolation weights; 1/32 quantization
    # of the fractional taps bounds the difference
    np.testing.assert_allclose(ours, ref, atol=0.05)
    assert np.mean(np.abs(ours - ref)) < 5e-3


def test_affine_sample_identity_and_flip_exact():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 40, 5)).astype(np.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(affine_sample(jnp.asarray(img), eye, (32, 40))), img
    )
    flip = jnp.asarray(
        [[-1, 0, 39], [0, 1, 0], [0, 0, 1]], jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(affine_sample(jnp.asarray(img), flip, (32, 40))),
        img[:, ::-1],
    )


def test_affine_sample_integer_translate_and_border():
    img = np.arange(24, dtype=np.float32).reshape(4, 6, 1)
    m = jnp.asarray([[1, 0, 2], [0, 1, 1], [0, 0, 1]], jnp.float32)
    out = np.asarray(affine_sample(jnp.asarray(img), m, (4, 6)))[..., 0]
    # out(i, j) = img(i+1, j+2); outside -> 0
    np.testing.assert_array_equal(out[:3, :4], img[1:, 2:, 0])
    assert (out[3:, :] == 0).all() and (out[:, 4:] == 0).all()


def test_make_device_augment_bts_shapes_and_variation():
    aug = make_device_augment("bts", (512, 512), (512, 512), None)
    x = jnp.broadcast_to(
        jnp.linspace(0, 1, 512 * 512 * 3).reshape(512, 512, 3),
        (4, 512, 512, 3),
    ).astype(jnp.float32)
    y = jnp.ones((4, 512, 512, 10), jnp.bfloat16) * 0.5
    xa, ya = jax.jit(aug)((x, y), jax.random.PRNGKey(0))
    assert xa.shape == (4, 512, 512, 3) and xa.dtype == x.dtype
    assert ya.shape == (4, 512, 512, 10) and ya.dtype == y.dtype
    assert np.isfinite(np.asarray(xa, np.float32)).all()
    # identical inputs, per-sample keys -> different crops/rotations
    assert not np.allclose(np.asarray(xa[0], np.float32),
                           np.asarray(xa[1], np.float32))


def test_make_device_augment_my_color_jitter_bounds():
    key = jax.random.PRNGKey(3)
    rgb = jax.random.uniform(key, (8, 16, 16, 3), jnp.float32)
    out = my_color_jitter(key, rgb)
    o = np.asarray(out)
    assert o.shape == rgb.shape
    assert (o >= 0).all() and (o <= 1).all()
    # p=0.5 gate: with 8 samples some stay identical, some change
    same = [np.array_equal(o[i], np.asarray(rgb[i])) for i in range(8)]
    assert any(same) or any(not s for s in same)


def test_affine_sample_batch_vmaps():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (3, 20, 20, 2)).astype(np.float32)
    mats = np.stack([np.eye(3)] * 3).astype(np.float32)
    mats[1, 0, 2] = 1.0  # translate sample 1 only
    out = np.asarray(affine_sample_batch(
        jnp.asarray(imgs), jnp.asarray(mats), (20, 20)
    ))
    np.testing.assert_array_equal(out[0], imgs[0])
    np.testing.assert_array_equal(out[2], imgs[2])
    assert not np.array_equal(out[1], imgs[1])
