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


def _ssim_golden_cases():
    """Three fixed input pairs + golden SSIM values.

    torchmetrics is not installed here, so the goldens were computed once
    with an independent float64 numpy transcription of
    torchmetrics.functional.image.ssim (v0.11) — reflect-pad + valid conv +
    border crop (which reduces exactly to plain VALID gaussian-window SSIM),
    data_range = max(pred.ptp(), target.ptp()) [per-tensor ranges, max],
    k1=0.01 k2=0.03, 11x11 sigma-1.5 window, mean over the valid map —
    pinning ops/ssim.ssim_metric to the reference's metrics.py:123 behavior.
    """
    rng = np.random.default_rng(42)
    a1 = rng.uniform(0, 1, (1, 24, 32, 1))
    b1 = np.clip(a1 + rng.normal(0, 0.1, a1.shape), 0, 1)
    yy, xx = np.mgrid[0:20, 0:20] / 19.0
    base = np.stack([yy, xx, (yy + xx) / 2], -1)
    a2 = np.stack([base, base[::-1]], 0)
    b2 = np.clip(a2 * 0.9 + 0.05 * rng.normal(size=a2.shape), 0, 2)
    # different per-tensor ranges: catches joint-range data_range inference
    a3 = rng.uniform(0, 1, (1, 16, 16, 1))
    b3 = rng.uniform(0.5, 2.0, (1, 16, 16, 1))
    return [
        (a1, b1, 0.9485642750),
        (a2, b2, 0.7976295167),
        (a3, b3, -0.1419446526),
    ]


@pytest.mark.parametrize("case", range(3))
def test_ssim_metric_torchmetrics_goldens(case):
    from mono_depth_estimation_tpu.ops.ssim import ssim_metric

    pred, target, want = _ssim_golden_cases()[case]
    got = float(ssim_metric(pred.astype(np.float32), target.astype(np.float32)))
    assert got == pytest.approx(want, abs=1e-4), (got, want)
