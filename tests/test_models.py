"""Shape/dtype tests for the Flax model zoo (SURVEY.md §4 test strategy (b)).

Inputs are kept tiny so the suite stays fast on the CPU backend; geometry
constraints (Eigen's fixed 240x320, DORN's /8-aligned sizes) follow the
reference defaults.
"""

import jax
import jax.numpy as jnp
import pytest

KEY = jax.random.PRNGKey(0)


def _init_apply(model, x, **kw):
    variables = model.init(KEY, x, **kw)
    return model.apply(variables, x, **kw)


@pytest.mark.slow
def test_eigen_geometry():
    from mono_depth_estimation_tpu.models.eigen import Eigen

    out = _init_apply(Eigen(), jnp.ones((1, 240, 320, 3)))
    # reference network/Eigen.py:94-98 → (B, 1, 109, 149) NCHW
    assert out.shape == (1, 109, 149, 1)


def test_fcrn_decoders():
    from mono_depth_estimation_tpu.models.fcrn import FCRN

    x = jnp.ones((1, 64, 96, 3))
    for dec in ["upproj", "fasterupproj", "upconv", "deconv2", "deconv3"]:
        m = FCRN(layers=18, decoder=dec, output_size=(64, 96), out_channels=20)
        out = _init_apply(m, x)
        assert out.shape == (1, 64, 96, 20), dec
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid


def test_bts_five_tuple():
    from mono_depth_estimation_tpu.models.bts import BtsModel

    x = jnp.ones((1, 64, 96, 3))
    m = BtsModel(encoder_version="resnet50_bts", out_channels=20)
    d8, d4, d2, r1, final = _init_apply(m, x)
    assert d8.shape == d4.shape == d2.shape == r1.shape == (1, 64, 96, 1)
    assert final.shape == (1, 64, 96, 20)
    # non-residual path scales by max_depth (network/Bts.py:274)
    assert float(final.max()) <= 10.0


def test_bts_image_residuals():
    from mono_depth_estimation_tpu.models.bts import BtsModel

    x = jnp.ones((1, 64, 96, 3)) * 0.5
    m = BtsModel(
        encoder_version="resnet50_bts", out_channels=10, image_residuals=True
    )
    final = _init_apply(m, x)[4]
    assert final.shape == (1, 64, 96, 10)
    # residual head clamps to [0, 1] (network/Bts.py:265-272)
    assert float(final.min()) >= 0.0 and float(final.max()) <= 1.0


def test_dorn_outputs():
    from mono_depth_estimation_tpu.models.dorn import DORN

    m = DORN(ord_num=17, input_size=(33, 41))
    label, prob = _init_apply(m, jnp.ones((1, 33, 41, 3)))
    assert label.shape == (1, 33, 41, 1)
    assert prob.shape == (1, 33, 41, 17)
    assert label.dtype == jnp.int32
    assert int(label.max()) <= 17 and int(label.min()) >= 0


def test_dorn_ordinal_decode_matches_threshold_sum():
    from mono_depth_estimation_tpu.models.dorn import ordinal_regression
    import numpy as np

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 10)).astype("float32"))
    label, prob = ordinal_regression(logits, interleaved=True)
    # P(l>k) = softmax over clamped (even, odd) pairs, index 1
    a = np.clip(np.asarray(logits)[..., 0::2], 1e-8, 1e4)
    b = np.clip(np.asarray(logits)[..., 1::2], 1e-8, 1e4)
    e = np.exp(b - np.maximum(a, b))
    f = np.exp(a - np.maximum(a, b))
    expected = e / (e + f)
    assert np.allclose(np.asarray(prob), expected, atol=1e-6)
    assert np.array_equal(
        np.asarray(label)[..., 0], (expected > 0.5).sum(-1)
    )


def test_dorn_ordinal_halves_layout_matches_interleaved():
    """The halves layout (SceneUnderstandingModule's deinterleaved-pre-resize
    output) must decode identically to the interleaved layout it permutes."""
    from mono_depth_estimation_tpu.models.dorn import ordinal_regression
    import numpy as np

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 5, 7, 12)).astype("float32"))
    halves = jnp.concatenate([logits[..., 0::2], logits[..., 1::2]], axis=-1)
    l_i, p_i = ordinal_regression(logits, interleaved=True)
    l_h, p_h = ordinal_regression(halves, interleaved=False)
    assert np.array_equal(np.asarray(l_i), np.asarray(l_h))
    assert np.array_equal(np.asarray(p_i), np.asarray(p_h))


def test_midas_shape():
    from mono_depth_estimation_tpu.models.midas import MidasNet

    out = _init_apply(MidasNet(features=64), jnp.ones((1, 64, 96, 3)))
    assert out.shape == (1, 64, 96, 7)


@pytest.mark.slow
def test_vnl_logit_softmax():
    from mono_depth_estimation_tpu.models.vnl import MetricDepthModel
    import numpy as np

    m = MetricDepthModel(dec_out_c=25, crop_size=(65, 65))
    logit, softmax = _init_apply(m, jnp.ones((1, 65, 65, 3)))
    assert logit.shape == softmax.shape == (1, 65, 65, 25)
    assert np.allclose(np.asarray(softmax.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_sharpnet_heads():
    from mono_depth_estimation_tpu.models.sharpnet import SharpNet

    m = SharpNet(use_depth=True, use_normals=True, use_boundary=True)
    outs = _init_apply(m, jnp.ones((1, 64, 96, 3)))
    assert outs["depth"].shape == (1, 64, 96, 1)
    assert outs["normals"].shape == (1, 64, 96, 3)
    assert outs["boundary"].shape == (1, 64, 96, 1)
    import numpy as np

    norms = np.linalg.norm(np.asarray(outs["normals"]), axis=-1)
    assert np.allclose(norms[norms > 1e-6], 1.0, atol=1e-4)


@pytest.mark.slow
def test_mynet_shape():
    from mono_depth_estimation_tpu.models.mynet import MyModel

    m = MyModel(input_size=(64, 64), encoder_version="resnet50_bts")
    out = _init_apply(m, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 1)
    assert float(out.max()) <= 10.0 / 3.0 * 1.0 + 1e-6


@pytest.mark.slow
def test_dorn_overlapping_window():
    """Multi-crop averaged inference (modules/dorn.py:109-151): runs under
    jit, preserves shape, and stays within the SID depth range."""
    import argparse

    from mono_depth_estimation_tpu.methods.dorn import DornMethod

    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="nyu",
                           depth_method=None)
    m = argparse.Namespace(
        name="dorn", learning_rate=1e-4, batch_size=1, ckpt=None,
        ord_num=12, alpha=0.02, beta=10.0, discretization="SID",
        input_size=(33, 41), kernel_size=16, pyramid=[4, 8, 12],
        dropout=0.5, weight_decay=5e-4, lr_patience=2,
    )
    method = DornMethod(g, m)
    x = jnp.ones((1, 33, 41, 3))
    model, variables = method.init_variables(KEY, (x, jnp.ones((1, 33, 41, 1))))
    y = jax.jit(
        lambda v, x, r: method.overlapping_window_method(model, v, x, r, crops=4)
    )(variables, x, jax.random.PRNGKey(3))
    assert y.shape == (1, 33, 41, 1)
    assert float(y.min()) >= 0.0199 and float(y.max()) <= 10.01 * 1.5
