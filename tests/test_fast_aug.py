"""cv2 fast augmentation path: statistical agreement with the PIL twin
plus the promised speedup."""

import time

import numpy as np
import pytest

from mono_depth_estimation_tpu.data.policies import (
    bts_train_preprocess,
    default_train_preprocess,
)
from mono_depth_estimation_tpu.data.policies_fast import (
    FAST_TRAIN,
    bts_train_fast,
    default_train_fast,
)


@pytest.fixture
def sample():
    # SMOOTH scene: sub-pixel resampling differences between PIL and cv2
    # would zero out correlation on noise inputs
    from mono_depth_estimation_tpu.data.synthetic import _scene

    rng = np.random.default_rng(0)
    rgb, depth = _scene(rng, 240, 320, 1.0)
    d01 = (depth / depth.max()).astype(np.float32)[..., None]
    front = np.concatenate(
        [rgb.astype(np.float32) / 255.0, np.full((240, 320, 1), 0.8, np.float32)],
        axis=-1,
    )
    return rgb, [front, front * 0.5, d01, d01]


def test_bts_fast_statistics(sample):
    """Same random draws -> same geometry; pixel values statistically close
    (resampling filters differ; quantization skipped)."""
    rgb, gt = sample
    a_rgb, a_d = bts_train_preprocess(
        rgb, gt, output_size=(128, 160), rng=np.random.default_rng(7)
    )
    b_rgb, b_d = bts_train_fast(
        rgb, gt, output_size=(128, 160), rng=np.random.default_rng(7)
    )
    assert a_rgb.shape == b_rgb.shape and a_d.shape == b_d.shape
    # identical crops/flips -> means match closely despite filter diffs
    assert abs(a_rgb.mean() - b_rgb.mean()) < 0.02
    assert abs(a_d.mean() - b_d.mean()) < 0.02
    assert np.corrcoef(a_d.ravel(), b_d.ravel())[0, 1] > 0.95


def test_default_fast_scale_semantics(sample):
    """(H, W) metric planes get /s and /255; (H, W, 1) unit planes keep
    their scale — mirroring the PIL twin's shape convention."""
    rng = np.random.default_rng(3)
    metric = rng.uniform(1, 10, (240, 320)).astype(np.float32)
    _, d = default_train_fast(
        sample[0], metric, resize=250, output_size=(228, 304),
        rng=np.random.default_rng(5),
    )
    assert d.max() < 10 / 255.0 + 1e-5
    _, d2 = default_train_fast(
        sample[0], sample[1], resize=250, output_size=(228, 304),
        rng=np.random.default_rng(5),
    )
    assert 0.5 < d2.max() <= 1.0  # unit-range planes keep [0,1]


def test_fast_is_faster(sample):
    rgb, gt = sample

    def run(fn, n=5):
        t0 = time.perf_counter()
        for i in range(n):
            fn(np.random.default_rng(i))
        return (time.perf_counter() - t0) / n

    t_pil = run(lambda r: bts_train_preprocess(rgb, gt, output_size=(128, 160), rng=r))
    t_fast = run(lambda r: bts_train_fast(rgb, gt, output_size=(128, 160), rng=r))
    assert t_fast < t_pil, (t_fast, t_pil)


def test_registry():
    assert set(FAST_TRAIN) == {"default", "laina", "bts", "midas", "my"}
