"""Device-side uint8 input preproc (ops/preproc.py) — the production input
path: host policies emit uint8 rgb (lossless for PIL policies), jitted
steps dequantize on device."""

import jax
import jax.numpy as jnp
import numpy as np

from mono_depth_estimation_tpu.ops.preproc import (
    UINT8_SAFE_POLICIES,
    cast_targets_host,
    dequantize_images,
    normalize_crop,
    quantize_rgb_u8,
)


def test_normalize_crop_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = np.asarray(normalize_crop(jnp.asarray(img), (32, 40), mean, std))
    ref = (img[:, 4:36, 4:44].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-6)


def test_quantize_dequantize_roundtrip_lossless():
    """PIL-policy output is exactly k/255; u8 re-encode + on-device /255
    must reproduce it bit-for-bit."""
    rng = np.random.default_rng(1)
    k = rng.integers(0, 256, (5, 8, 8, 3))
    x = (k / 255.0).astype(np.float32)
    y = rng.uniform(0, 1, (5, 8, 8, 1)).astype(np.float32)

    fn = quantize_rgb_u8(lambda rgb, depth, rng: (rgb, depth))
    xq, yq = fn(x, y, None)
    assert xq.dtype == np.uint8
    assert yq is y  # target untouched
    back = np.asarray(dequantize_images(jnp.asarray(xq)))
    np.testing.assert_array_equal(back, x)


def test_dequantize_inside_jit_and_tree():
    batch = (
        jnp.asarray(np.arange(12, dtype=np.uint8).reshape(1, 2, 2, 3)),
        jnp.ones((1, 2, 2, 1), jnp.float32) * 7,
        jnp.zeros((1, 4), jnp.int32),
    )
    out = jax.jit(dequantize_images)(batch)
    assert out[0].dtype == jnp.float32
    assert float(out[0].max()) == float(np.float32(11) / np.float32(255))
    assert out[1].dtype == jnp.float32 and float(out[1][0, 0, 0, 0]) == 7
    assert out[2].dtype == jnp.int32  # non-image ints untouched


def test_loader_eval_path_end_to_end():
    """Trainer._loaders wraps the safe policies; a metric step over the u8
    batch must equal the same step over the f32 batch."""
    import argparse

    from mono_depth_estimation_tpu.data.loader import Loader
    from mono_depth_estimation_tpu.data.synthetic import SyntheticDepthDataset
    from mono_depth_estimation_tpu.methods.eigen import EigenMethod
    from mono_depth_estimation_tpu.train.steps import make_metric_step

    assert EigenMethod.POLICY in UINT8_SAFE_POLICIES
    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="",
                           depth_method=None)
    m = argparse.Namespace(name="eigen", learning_rate=1e-4, batch_size=2,
                           ckpt=None, torch_weights=None, pretrained=0,
                           backbone="vgg", loss="eigen")
    method = EigenMethod(g, m)
    ds = SyntheticDepthDataset(split="test", output_size=(48, 64), resize=50,
                               n_images=2, image_size=(96, 128))
    _, _, test_t = method.policy_fns()
    lo_f32 = Loader(ds, 2, transform=test_t, num_workers=0)
    lo_u8 = Loader(ds, 2, transform=quantize_rgb_u8(test_t), num_workers=0)
    (xf, yf), _ = next(iter(lo_f32))
    (xq, yq), _ = next(iter(lo_u8))
    assert xq.dtype == np.uint8
    np.testing.assert_array_equal(xq.astype(np.float32) / 255.0, xf)

    # what the jitted step sees after dequantize == the f32 pipeline
    np.testing.assert_array_equal(
        np.asarray(dequantize_images(jnp.asarray(xq))), xf
    )
    np.testing.assert_array_equal(yq, yf)
    del make_metric_step  # full-step coverage: tests/test_train_loop.py
    del method


def test_cast_targets_host_bit_identical_to_device_cast():
    """The bf16 target-transfer claim (cast_targets_host): ml_dtypes' host
    f32->bf16 cast must equal XLA's on-device convert BIT-FOR-BIT, so
    compressing targets on the host only moves the existing cast in
    train/steps._cast_inputs across the wire."""
    rng = np.random.default_rng(2)
    # adversarial values: rounding ties, denormal-ish, large, exact bf16
    y = np.concatenate([
        rng.uniform(0, 1, 4096).astype(np.float32),
        np.float32([1.0039062, 1.0039063, 0.1, 1e-30, 3e38, 0.5, -0.3]),
    ])
    host = np.asarray(y.astype(jnp.bfloat16))
    device = np.asarray(jax.jit(lambda a: a.astype(jnp.bfloat16))(jnp.asarray(y)))
    np.testing.assert_array_equal(
        host.view(np.uint16), device.view(np.uint16)
    )


def test_cast_targets_host_wrapper_semantics():
    x = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    y = np.ones((2, 2, 1), np.float32) * 0.3
    fn = cast_targets_host(lambda r, d, g: (r, d), jnp.bfloat16)
    xo, yo = fn(x, y, None)
    assert xo is x  # image half untouched
    assert yo.dtype == jnp.bfloat16
    np.testing.assert_array_equal(yo.astype(np.float32),
                                  y.astype(jnp.bfloat16).astype(np.float32))
    # non-tuple (dict-protocol) samples pass through untouched
    d = {"A": y}
    assert cast_targets_host(lambda r, dd, g: d, jnp.bfloat16)(x, y, None) is d
