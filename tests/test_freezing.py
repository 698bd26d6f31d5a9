"""Parameter-freezing semantics (--freeze_encoder, BTS conv-block fixing)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from mono_depth_estimation_tpu.methods.bts import BtsMethod
from mono_depth_estimation_tpu.methods.base import is_encoder_path


def _bts_method(**over):
    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="", depth_method=None)
    m = argparse.Namespace(
        name="bts", learning_rate=1e-3, batch_size=2, ckpt=None, bts_size=32,
        out_channels=10, image_residuals=False, max_depth=1.0,
        encoder="resnet50_bts", variance_focus=0.85, adam_eps=1e-3,
        weight_decay=1e-2, loss="mae", depth_loss_weight=10.0,
        comp_loss_weight=2.0, fbdiv_loss_weight=0.2, ssim_loss_weight=2.0,
        lr_patience=2, bn_no_track_stats=False, freeze_encoder=False,
        fix_first_conv_blocks=False, fix_first_conv_block=False,
    )
    for k, v in over.items():
        setattr(m, k, v)
    return BtsMethod(g, m)


def test_bts_default_fixing_predicate():
    """Default (no flags): first conv + every encoder BN frozen
    (modules/bts.py:74-78 else-branch always runs — see method docstring)."""
    pred = _bts_method().frozen_predicate()
    assert pred(("ResNetEncoder_0", "Conv_0", "kernel"))
    assert pred(("ResNetEncoder_0", "BatchNorm_0", "scale"))
    assert pred(("ResNetEncoder_0", "BottleneckBlock_3", "BatchNorm_1", "scale"))
    assert not pred(("ResNetEncoder_0", "BottleneckBlock_0", "Conv_1", "kernel"))
    assert not pred(("BtsDecoder_0", "Conv_0", "kernel"))


def test_bts_fix_first_blocks_predicate():
    pred = _bts_method(fix_first_conv_blocks=True).frozen_predicate()
    assert pred(("ResNetEncoder_0", "BottleneckBlock_0", "Conv_1", "kernel"))
    assert pred(("ResNetEncoder_0", "BottleneckBlock_1", "Conv_1", "kernel"))
    assert not pred(("ResNetEncoder_0", "BottleneckBlock_2", "Conv_1", "kernel"))
    dense = _bts_method(
        encoder="densenet161_bts", fix_first_conv_block=True
    ).frozen_predicate()
    assert dense(("DenseNetEncoder_0", "Conv_0", "kernel"))
    assert dense(("DenseNetEncoder_0", "DenseBlock_0", "DenseLayer_0", "Conv_0", "kernel"))
    assert not dense(("DenseNetEncoder_0", "DenseBlock_0", "DenseLayer_1", "Conv_0", "kernel"))


def test_freeze_encoder_zeroes_updates():
    """A frozen-encoder optimizer leaves encoder params bit-identical after
    an update while decoder params move."""
    import optax

    method = _bts_method(freeze_encoder=True)
    assert method.frozen_predicate() is is_encoder_path

    # tiny fake param tree exercising the mask without building the model
    params = {
        "ResNetEncoder_0": {"Conv_0": {"kernel": jnp.ones((3, 3, 3, 8))}},
        "BtsDecoder_0": {"Conv_0": {"kernel": jnp.ones((3, 3, 8, 1))}},
    }
    tx = method.optimizer()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new["ResNetEncoder_0"]["Conv_0"]["kernel"]),
        np.asarray(params["ResNetEncoder_0"]["Conv_0"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(new["BtsDecoder_0"]["Conv_0"]["kernel"]),
        np.asarray(params["BtsDecoder_0"]["Conv_0"]["kernel"]),
    )


def test_vnl_finetune_freezing():
    """--finetune -2: everything frozen except fcn5 + predict
    (modules/vnl.py:167-179)."""
    from mono_depth_estimation_tpu.methods.vnl import VnlMethod

    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="", depth_method=None)
    m = argparse.Namespace(
        name="vnl", learning_rate=1e-4, batch_size=2, ckpt=None, lr_patience=2,
        encoder="resnext50_32x4d_body_stride16",
        enc_dim_in=[64, 256, 512, 1024, 2048], enc_dim_out=[512, 256, 256, 256],
        dec_dim_in=[512, 256, 256, 256, 256, 256],
        dec_dim_out=[256, 256, 256, 256, 256], dec_out_c=10,
        crop_size=(49, 49), scale_decoder_lr=0.1, weight_decay=5e-4,
        depth_min=0.01, depth_max=1.1, focal_x=519.0, focal_y=519.0,
        diff_loss_weight=6, prediction_method="classification",
        init_type="xavier", pretrained=0, freeze_backbone=False,
        finetune=-2, freeze_encoder=False,
    )
    pred = VnlMethod(g, m).frozen_predicate()
    assert pred(("ResNetEncoder_0", "Conv_0", "kernel"))
    assert pred(("ASPPBlock_0", "Conv_0", "kernel"))
    assert pred(("FTBBlock_1", "Conv_0", "kernel"))        # lateral
    assert pred(("Conv_0", "kernel"))                       # decoder top
    assert pred(("FCNTopdownBlock_3", "FTBBlock_0", "Conv_0", "kernel"))
    assert not pred(("FTBBlock_4", "Conv_0", "kernel"))     # fcn5 trains
    assert not pred(("Conv_1", "kernel"))                   # predict trains
