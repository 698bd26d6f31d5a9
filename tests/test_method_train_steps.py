"""One optimizer step through EVERY method's train_loss (tiny shapes).

This is the harness-level guarantee the per-model shape tests can't give:
loss functions, mutable batch_stats plumbing, optimizer param groups, and
freezing masks all compose per method.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_depth_estimation_tpu.methods import METHODS
from mono_depth_estimation_tpu.train.state import TrainState
from mono_depth_estimation_tpu.train.steps import make_train_step

_COMMON = dict(
    learning_rate=1e-4, batch_size=2, ckpt=None, lr_patience=2,
    depth_loss_weight=10.0, comp_loss_weight=2.0, fbdiv_loss_weight=0.2,
    ssim_loss_weight=2.0, freeze_encoder=False,
)


def _batch_depth(h, w, c=1, b=2):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    y = rng.uniform(0.1, 1.0, (b, h, w, c)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


# (method, method-args overrides, batch builder)
CASES = {
    "eigen": (dict(backbone="vgg", pretrained=0, loss="eigen"),
              lambda: _batch_depth(240, 320)),
    # FCRN always emits the method's fixed 240x320 output size
    "laina": (dict(out_channels=10, loss="mae", variance_focus=0.85,
                   decoder="fasterupproj"),
              lambda: _batch_depth(240, 320, c=10)),
    "bts": (dict(bts_size=32, out_channels=10, image_residuals=False,
                 max_depth=1.0, encoder="resnet50_bts", variance_focus=0.85,
                 adam_eps=1e-3, weight_decay=1e-2, loss="silma",
                 bn_no_track_stats=False, fix_first_conv_blocks=False,
                 fix_first_conv_block=False),
            lambda: _batch_depth(64, 96, c=10)),
    "dorn": (dict(ord_num=12, alpha=0.02, beta=10.0, discretization="SID",
                  input_size=(33, 41), kernel_size=16, pyramid=[4, 8, 12],
                  dropout=0.5, weight_decay=5e-4),
             lambda: _batch_depth(33, 41)),
    "midas": (dict(features=64, out_channels=1, loss="ssitrim", alpha=0.5,
                   reduction="batch-based", trim=0.2),
              lambda: _batch_depth(64, 96)),
    "vnl": (dict(encoder="resnext50_32x4d_body_stride16",
                 enc_dim_in=[64, 256, 512, 1024, 2048],
                 enc_dim_out=[512, 256, 256, 256],
                 dec_dim_in=[512, 256, 256, 256, 256, 256],
                 dec_dim_out=[256, 256, 256, 256, 256],
                 dec_out_c=10, crop_size=(49, 49), scale_decoder_lr=0.1,
                 weight_decay=5e-4, depth_min=0.01, depth_max=1.1,
                 focal_x=519.0, focal_y=519.0, diff_loss_weight=6,
                 prediction_method="classification", init_type="xavier",
                 pretrained=0, freeze_backbone=False, finetune=0),
            None),  # dict batch below
    "my": (dict(), lambda: _batch_depth(64, 64)),
    "sharpnet": (dict(weight_decay=5e-5, loss="SharpNetLoss"),
                 lambda: _batch_depth(64, 96)),
}


def _vnl_batch():
    rng = np.random.default_rng(1)
    return {
        "A": jnp.asarray(rng.normal(size=(2, 49, 49, 3)).astype(np.float32)),
        "B": jnp.asarray(rng.uniform(0.05, 1.0, (2, 49, 49, 1)).astype(np.float32)),
        "invalid_side": jnp.zeros((2, 4), jnp.int32),
        "ratio": jnp.ones((2,), jnp.float32),
    }


@pytest.mark.slow
@pytest.mark.parametrize("name", list(CASES))
def test_method_train_step(name):
    over, batch_fn = CASES[name]
    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="nyu",
                           depth_method=None)
    m = argparse.Namespace(name=name, **{**_COMMON, **over})
    if name == "my":
        # MyModel geometry is tied to input_size
        method = METHODS[name](g, m)
        method.output_size = lambda: (64, 64)
        method.build_model = lambda: __import__(
            "mono_depth_estimation_tpu.models.mynet", fromlist=["MyModel"]
        ).MyModel(input_size=(64, 64), encoder_version="resnet50_bts")
    else:
        method = METHODS[name](g, m)

    batch = _vnl_batch() if name == "vnl" else batch_fn()
    model, variables = method.init_variables(jax.random.PRNGKey(0), batch)
    opt = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=opt.init(variables["params"]),
    )
    step = make_train_step(method, model, opt, compute_dtype=None)
    state, loss, y_hat, y, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), (name, float(loss))
    assert int(state.step) == 1
