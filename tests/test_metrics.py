"""Golden tests for the metric suite against direct numpy masking."""

import numpy as np
import pytest

from mono_depth_estimation_tpu.metrics import compute_metrics


@pytest.fixture
def data(rng):
    pred = rng.uniform(0.5, 5.0, size=(2, 16, 16, 1)).astype(np.float32)
    target = rng.uniform(0.5, 5.0, size=(2, 16, 16, 1)).astype(np.float32)
    # punch holes in the target (invalid pixels)
    target[rng.uniform(size=target.shape) < 0.3] = 0.0
    return pred, target


def _np_golden(pred, target):
    p = np.maximum(pred, 1e-7).ravel()
    t = target.ravel()
    m = t > 0
    p, t = p[m], t[m]
    ratio = np.maximum(p / t, t / p)
    return {
        "delta1": (ratio < 1.25).mean(),
        "delta2": (ratio < 1.25**2).mean(),
        "delta3": (ratio < 1.25**3).mean(),
        "mae": np.abs(p - t).mean(),
        "mse": ((p - t) ** 2).mean(),
        "msle": ((np.log1p(p) - np.log1p(t)) ** 2).mean(),
        "log10": np.abs(np.log10(p) - np.log10(t)).mean(),
        "absrel": (np.abs(p - t) / t).mean(),
        "sqrel": ((p - t) ** 2 / t).mean(),
        "rmse": np.sqrt((p - t) ** 2 / t).mean(),
        "rmse_true": np.sqrt(((p - t) ** 2).mean()),
        "rmsle": np.sqrt(((np.log1p(p) - np.log1p(t)) ** 2).mean()),
    }


def test_masked_metrics_match_numpy(data):
    pred, target = data
    want = _np_golden(pred, target)
    got = compute_metrics(pred, target, list(want.keys()))
    for name, val in want.items():
        np.testing.assert_allclose(
            float(got[name]), val, rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_ssim_perfect_match(data):
    pred, _ = data
    got = compute_metrics(pred, pred.copy(), ["ssim"])
    assert float(got["ssim"]) == pytest.approx(1.0, abs=1e-4)


def test_ssim_degrades_with_noise(rng):
    img = rng.uniform(0.0, 1.0, size=(1, 32, 32, 1)).astype(np.float32)
    img = img + 0.5  # keep target > 0
    noisy = img + rng.normal(0, 0.2, size=img.shape).astype(np.float32)
    got = compute_metrics(noisy, img, ["ssim"])
    assert float(got["ssim"]) < 0.95
