"""Data layer tests: synthetic scenes, stdepth readers, policies, loader."""

import numpy as np
import pytest

from mono_depth_estimation_tpu.data.base import ConcatDataset
from mono_depth_estimation_tpu.data.loader import Loader
from mono_depth_estimation_tpu.data.policies import (
    POLICIES,
    bts_train_preprocess,
    default_train_preprocess,
    default_val_preprocess,
    midas_test_preprocess,
    vnl_train_preprocess,
)
from mono_depth_estimation_tpu.data.synthetic import (
    SyntheticDepthDataset,
    materialize_stdepth_dir,
)


@pytest.fixture(scope="module")
def stdepth_dir(tmp_path_factory):
    return materialize_stdepth_dir(tmp_path_factory.mktemp("stdepth"), h=64, w=64)


def test_synthetic_deterministic():
    ds = SyntheticDepthDataset(split="train", n_images=4)
    rgb1, d1 = ds.get_raw(0)
    rgb2, d2 = ds.get_raw(0)
    assert rgb1.dtype == np.uint8 and rgb1.shape == (480, 640, 3)
    assert d1.dtype == np.float32
    assert np.array_equal(rgb1, rgb2) and np.array_equal(d1, d2)
    # distinct splits yield distinct scenes
    dv = SyntheticDepthDataset(split="val", n_images=4)
    assert not np.array_equal(dv.get_raw(0)[0], rgb1)


def test_default_policies_shapes():
    ds = SyntheticDepthDataset(split="train", n_images=2, image_size=(256, 320))
    rgb, depth = ds.get_raw(0)
    rng = np.random.default_rng(0)
    r, d = default_train_preprocess(
        rgb, depth, resize=250, output_size=(228, 304), rng=rng
    )
    assert r.shape == (228, 304, 3) and d.shape == (228, 304, 1)
    assert r.dtype == np.float32 and 0 <= r.min() and r.max() <= 1.0
    r, d = default_val_preprocess(rgb, depth, resize=250, output_size=(228, 304))
    assert r.shape == (228, 304, 3) and d.shape == (228, 304, 1)
    # reference /255 semantics: val depth = meters / 255
    assert d.max() <= depth.max() / 255.0 + 1e-5


def test_bts_policy_multichannel(stdepth_dir):
    from mono_depth_estimation_tpu.data.stdepth import (
        SemiTransparentMultiDepthDataset,
        _split_filter,
    )

    ds = SemiTransparentMultiDepthDataset(
        stdepth_dir, resize=64, output_size=(64, 64),
        filter_fn=_split_filter("train"), single_layer=True, split="train",
    )
    rgb, gt = ds.get_raw(0)
    assert rgb.shape == (64, 64, 3) and rgb.dtype == np.uint8
    assert [g.shape[-1] for g in gt] == [4, 4, 1, 1]  # 10 channels total
    rng = np.random.default_rng(0)
    r, d = bts_train_preprocess(rgb, gt, output_size=(32, 32), rng=rng)
    assert r.shape == (32, 32, 3) and d.shape == (32, 32, 10)
    assert 0.0 <= d.min() and d.max() <= 1.0


def test_stdepth_multi_20ch(stdepth_dir):
    from mono_depth_estimation_tpu.data.stdepth import (
        SemiTransparentMultiDepthDataset,
        SemiTransparentMulti2DepthDataset,
        _split_filter,
    )

    ds = SemiTransparentMultiDepthDataset(
        stdepth_dir, resize=64, output_size=(64, 64),
        filter_fn=_split_filter("val"), single_layer=False, split="val",
    )
    assert len(ds) == 2
    rgb, gt = ds.get_raw(0)
    assert sum(g.shape[-1] for g in gt) == 20
    ds2 = SemiTransparentMulti2DepthDataset(
        stdepth_dir, resize=64, output_size=(64, 64),
        filter_fn=_split_filter("test"), split="test",
    )
    rgba, gt2 = ds2.get_raw(0)
    assert rgba.shape[-1] == 4  # RGBA input (stdepth_multi2.py:87-88)
    assert sum(g.shape[-1] for g in gt2) == 10


def test_numpy_compositing_matches_ops(stdepth_dir):
    """The host-side numpy composite must agree with the jnp ops."""
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.data.stdepth import (
        _np_composite,
        _np_depth_sort,
    )
    from mono_depth_estimation_tpu.ops.compositing import (
        composite_layers,
        depth_sort,
    )

    rng = np.random.default_rng(3)
    stack = rng.uniform(0, 1, (3, 8, 8, 5)).astype(np.float32)
    np_out = _np_composite(_np_depth_sort(stack))
    jnp_out = composite_layers(depth_sort(jnp.asarray(stack)[None]))[0]
    assert np.allclose(np_out, np.asarray(jnp_out), atol=1e-6)


def test_vnl_policy_dict():
    ds = SyntheticDepthDataset(split="train", n_images=1, image_size=(480, 640))
    rgb, depth = ds.get_raw(0)
    out = vnl_train_preprocess(rgb, depth, rng=np.random.default_rng(0))
    assert out["A"].shape == (385, 385, 3)
    assert out["B"].shape == (385, 385, 1)
    assert "ratio" in out and "invalid_side" in out
    assert "B_raw" not in out  # train batches stay lean (no restore there)

    # val/test batches carry the raw 512-high restore target
    # (restore_prediction protocol, methods/vnl.py val_outputs)
    from mono_depth_estimation_tpu.data.policies import vnl_val_preprocess

    vout = vnl_val_preprocess(rgb, depth, rng=np.random.default_rng(0))
    assert vout["B_raw"].ndim == 3 and vout["B_raw"].shape[0] == 512
    assert vout["invalid_side"][0] == 0  # structurally zero at val/test


def test_midas_test_dict():
    ds = SyntheticDepthDataset(split="test", n_images=1, image_size=(480, 640))
    rgb, depth = ds.get_raw(0)
    out = midas_test_preprocess(rgb, depth)
    assert out["rgb"].shape == (384, 384, 3)
    assert out["rgb_raw"].shape == (480, 640, 3)
    assert out["depth"].shape == (384, 384, 1)


def test_loader_padding_and_determinism():
    ds = SyntheticDepthDataset(split="train", n_images=5, image_size=(64, 80))

    def tfm(rgb, depth, rng):
        return default_val_preprocess(rgb, depth, resize=48, output_size=(32, 40))

    loader = Loader(ds, batch_size=2, shuffle=True, transform=tfm, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    (rgb, d), mask = batches[-1]
    assert rgb.shape == (2, 32, 40, 3)  # padded to full batch
    assert mask.tolist() == [True, False]
    # same seed/epoch => same order
    loader2 = Loader(ds, batch_size=2, shuffle=True, transform=tfm, num_workers=0)
    (rgb2, _), _ = next(iter(loader2))
    assert np.allclose(batches[0][0][0], rgb2)


def test_concat_dataset_table():
    a = SyntheticDepthDataset(split="train", n_images=3, image_size=(32, 32))
    b = SyntheticDepthDataset(split="val", n_images=2, image_size=(32, 32))
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    seen = sorted(map(tuple, cat.table.tolist()))
    assert seen == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)]


def test_all_policies_registered():
    assert set(POLICIES) == {
        "default", "laina", "bts", "midas", "vnl", "sharpnet", "my",
    }


def test_loader_reshuffles_after_abandoned_epoch():
    """Abandoned iterators (early stop / fast-dev-run) must not replay the
    same shuffle next epoch."""
    ds = SyntheticDepthDataset(split="train", n_images=16, image_size=(16, 16))
    loader = Loader(ds, batch_size=4, shuffle=True, num_workers=0)
    first = next(iter(loader))  # abandon mid-epoch
    second = next(iter(loader))
    assert not np.array_equal(first[0][0], second[0][0])
