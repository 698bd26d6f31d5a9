"""Golden tests for the loss library against direct numpy formulas."""

import jax
import numpy as np
import pytest

from mono_depth_estimation_tpu import losses
from mono_depth_estimation_tpu.losses.stdepth import StdepthLossConfig, stdepth_loss


@pytest.fixture
def maps(rng):
    pred = rng.uniform(0.5, 5.0, size=(2, 12, 12, 1)).astype(np.float32)
    target = rng.uniform(0.5, 5.0, size=(2, 12, 12, 1)).astype(np.float32)
    target[rng.uniform(size=target.shape) < 0.25] = 0.0
    return pred, target


def test_masked_l1_mse(maps):
    pred, target = maps
    m = target > 0
    np.testing.assert_allclose(
        float(losses.masked_l1_loss(pred, target)),
        np.abs(target - pred)[m].mean(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(losses.masked_mse_loss(pred, target)),
        ((target - pred)[m] ** 2).mean(),
        rtol=1e-6,
    )


def test_masked_depth_loss_golden(maps):
    """Eigen loss: scale-inv L2 + gradient matching, numpy transcription."""
    pred, target = maps
    b = pred.shape[0]
    mask = (target > 0).astype(np.float32)
    p = (pred * mask).reshape(b, -1)
    t = (target * mask).reshape(b, -1)
    m = mask.reshape(b, -1)
    d = p - t
    nvalid = m.sum(1)
    depth_error = (
        (nvalid * (d**2).sum(1)).sum() - 0.5 * (d.sum(1) ** 2).sum()
    ) / (nvalid**2).sum()

    p2, t2, m2 = pred[..., 0], target[..., 0], mask[..., 0]
    p_di = p2[:, 1:] - p2[:, :-1]
    t_di = t2[:, 1:] - t2[:, :-1]
    m_di = m2[:, 1:] * m2[:, :-1]
    p_dj = p2[:, :, 1:] - p2[:, :, :-1]
    t_dj = t2[:, :, 1:] - t2[:, :, :-1]
    m_dj = m2[:, :, 1:] * m2[:, :, :-1]
    grad = (m_di * (p_di - t_di) ** 2).sum() / m_di.sum()
    grad += (m_dj * (p_dj - t_dj) ** 2).sum() / m_dj.sum()

    want = depth_error + grad
    got = float(losses.masked_depth_loss(pred, target))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_silog_golden(maps):
    pred, target = maps
    m = target > 1e-2
    d = np.log(pred[m]) - np.log(target[m])
    want = np.sqrt((d**2).mean() - 0.85 * d.mean() ** 2) * 10.0
    got = float(losses.silog_loss(pred, target, 0.85))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_berhu_golden(maps):
    pred, target = maps
    c = 0.2 * (pred - target).max()
    valid = target > 0
    diff = np.abs(target - pred)[valid]
    huber = diff[diff > c]
    want = np.concatenate([diff, huber**2]).mean()
    got = float(losses.berhu_loss(pred, target))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scale_and_shift_recovers_affine(rng):
    target = rng.uniform(1.0, 5.0, size=(2, 16, 16)).astype(np.float32)
    pred = (target - 0.7) / 2.5  # target = 2.5*pred + 0.7
    scale, shift = losses.compute_scale_and_shift(pred, target)
    np.testing.assert_allclose(np.asarray(scale), [2.5, 2.5], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(shift), [0.7, 0.7], rtol=1e-3, atol=1e-4)


def test_midas_loss_zero_for_affine_match(rng):
    target = rng.uniform(1.0, 5.0, size=(2, 16, 16)).astype(np.float32)
    pred = target * 3.0 + 1.0
    # ssi alignment makes the data term vanish
    val = float(losses.midas_loss(pred, target, loss="ssimse", alpha=0.0))
    assert val == pytest.approx(0.0, abs=1e-6)


def test_normalize_prediction_robust_median_mad(rng):
    t = rng.uniform(1.0, 5.0, size=(1, 8, 8)).astype(np.float32)
    out = np.asarray(losses.normalize_prediction_robust(t))
    flat = t.reshape(-1)
    flat_sorted = np.sort(flat)
    med = flat_sorted[(flat.size - 1) // 2]  # torch lower-median
    s = np.abs(t - med).mean()
    np.testing.assert_allclose(out, (t - med) / s, rtol=1e-5)


def test_ord_loss_matches_numpy(rng):
    probs = rng.uniform(0.05, 0.95, size=(2, 4, 4, 8)).astype(np.float32)
    labels = rng.integers(0, 8, size=(2, 4, 4)).astype(np.float32)
    got = float(losses.ord_loss(probs, labels))

    k = np.arange(8)[None, None, None, :]
    le = k <= labels[..., None]
    ll = np.where(le, np.log(probs), np.log(1 - probs))
    want = -ll.sum() / (2 * 4 * 4)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sid_bins_roundtrip():
    bins = losses.SID_PRESETS["nyu"]
    depth = np.linspace(0.05, 9.5, 32).astype(np.float32)
    labels = bins.depth_to_label(depth)
    back = np.asarray(bins.label_to_depth(labels))
    np.testing.assert_allclose(back, depth, rtol=1e-3)  # f32 log/exp roundtrip


def test_wcel_golden(rng):
    c = 10
    bins_gt = rng.integers(0, c, size=(1, 8, 8))
    logits = rng.normal(size=(1, 8, 8, c)).astype(np.float32)
    depth = rng.uniform(0, 2, size=(1, 8, 8)).astype(np.float32)
    depth[depth < 0.5] = 0.0  # some invalid pixels

    # numpy transcription: gaussian row-normalized weights, one_hot @ W,
    # -sum(w * log_softmax) / count(depth > 0)
    w = np.array([[np.exp(-0.2 * (i - j) ** 2) for i in range(c)] for j in range(c)])
    w /= w.sum(axis=1, keepdims=True)
    ex = np.exp(logits - logits.max(axis=-1, keepdims=True))
    log_pred = np.log(ex / ex.sum(axis=-1, keepdims=True))
    one_hot = np.eye(c)[bins_gt]
    pix_w = one_hot @ w
    want = -(pix_w * log_pred).sum() / (depth > 0).sum()

    got = float(losses.wcel_loss(logits, bins_gt, depth, c))
    # golden runs in f64, the op in f32 — tolerance covers the accumulation gap
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_vnl_loss_zero_for_identical_depth(rng):
    cfg = losses.VNLConfig(focal_x=50.0, focal_y=50.0, input_size=(16, 16))
    depth = rng.uniform(0.5, 2.0, size=(1, 16, 16)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    val = float(losses.vnl_loss(depth, depth.copy(), cfg, key))
    assert val == pytest.approx(0.0, abs=1e-5)
    worse = float(
        losses.vnl_loss(depth, depth + rng.normal(0, 0.5, depth.shape).astype(np.float32), cfg, key)
    )
    assert worse > 0.01


def test_stdepth_loss_silma_composite(rng):
    from mono_depth_estimation_tpu.ops.compositing import composite_layers

    cfg = StdepthLossConfig(loss="silma+composite", single_layer=True)
    pred = rng.uniform(0.1, 0.9, size=(2, 16, 16, 10)).astype(np.float32)
    targ = rng.uniform(0.1, 0.9, size=(2, 16, 16, 10)).astype(np.float32)
    # rgba must be the actual composite of the target layers so that a
    # perfect prediction really nulls the composite term
    rgba = np.asarray(
        composite_layers(np.stack([targ[..., :4], targ[..., 4:8]], axis=1))
    )
    total, pred_full, terms = stdepth_loss(pred, targ, rgba, cfg)
    assert set(terms) == {"depth_silog", "color_mae", "composite_mse"}
    np.testing.assert_allclose(
        float(total), sum(float(v) for v in terms.values()), rtol=1e-5
    )
    assert pred_full.shape == (2, 16, 16, 4)
    # perfect prediction nulls every term except silog's x10 sqrt floor
    total0, _, _ = stdepth_loss(targ, targ, rgba, cfg)
    assert float(total0) == pytest.approx(0.0, abs=1e-4)


def test_stdepth_loss_multilayer_shapes(rng):
    cfg = StdepthLossConfig(loss="mae+composite+colorssim", single_layer=False)
    pred = rng.uniform(0.1, 0.9, size=(1, 16, 16, 20)).astype(np.float32)
    targ = rng.uniform(0.1, 0.9, size=(1, 16, 16, 20)).astype(np.float32)
    rgba = rng.uniform(0.1, 0.9, size=(1, 16, 16, 4)).astype(np.float32)
    total, pred_full, terms = stdepth_loss(pred, targ, rgba, cfg)
    assert pred_full.shape == (1, 16, 16, 4)
    assert np.isfinite(float(total))
    assert {"all_mae", "composite_mse", "composite_ssim", "front_ssim", "back_ssim"} <= set(terms)
