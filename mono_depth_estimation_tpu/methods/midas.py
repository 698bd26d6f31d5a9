"""MiDaS method (parity: /root/reference/modules/midas.py).

Known reference bug NOT copied: test_step references an undefined ``x``
(modules/midas.py:91) — here the test path uses the dict batch's rgb.
"""

from __future__ import annotations

import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.masked import masked_depth_loss, masked_l1_loss
from mono_depth_estimation_tpu.losses.midas import (
    apply_scale_and_shift,
    midas_loss,
    trimmed_procrustes_loss,
)
from mono_depth_estimation_tpu.methods.base import Method, resize_nhwc
from mono_depth_estimation_tpu.models.midas import MidasNet
from mono_depth_estimation_tpu.train.optim import make_optimizer


class MidasMethod(Method):
    NAME = "midas"
    POLICY = "midas"

    def output_size(self):
        return (384, 384)

    def resize(self):
        return 400

    def build_model(self):
        # out_channels defaults to 1: the reference trains either the hub
        # MiDaS (1-channel) or its scratch MidasNet whose 7-channel stdepth
        # head is incompatible with its own MidasLoss (criteria.py:321-328
        # broadcasts (B,7,H,W) against (B,H,W) targets). The 7-channel head
        # remains available via --out-channels for the stdepth variant.
        return MidasNet(
            features=int(self.method.features),
            out_channels=int(getattr(self.method, "out_channels", 1)),
        )

    def pretrained_source(self):
        # hub ResNeXt101-32x8d-WSL encoder weights (modules/midas.py:16-27)
        return "resnext101_32x8d_wsl"

    def _model_input(self, batch):
        """Train/val batches are (x, y) tuples; TEST batches are the
        pad-to-square dicts from midas_test_preprocess (modules/midas.py:
        152-184) whose network input is 'rgb'. Round-5 fix: without this
        override evaluate.py could not initialize on midas at all — caught
        by the evaluate-level parity certificate."""
        return batch["rgb"] if isinstance(batch, dict) else batch[0]

    def _criterion(self, y_hat, y):
        """Loss switch (modules/midas.py:29-37)."""
        loss_name = self.method.loss
        trim = float(getattr(self.method, "trim", 0.2))
        if loss_name in ["ssil1", "ssimse", "l1", "mse", "trim"]:
            return midas_loss(
                y_hat, y, alpha=self.method.alpha, loss=loss_name,
                reduction=self.method.reduction, trim=trim,
            )
        if loss_name == "eigen":
            return masked_depth_loss(y_hat, y)
        if loss_name == "laina":
            return masked_l1_loss(y_hat, y)
        if loss_name == "ssitrim":
            return trimmed_procrustes_loss(
                y_hat, y, alpha=self.method.alpha,
                reduction=self.method.reduction, trim=trim,
            )
        raise ValueError(f"unknown midas loss: {loss_name}")

    def _scale_shift(self, y_hat, y):
        """Closed-form alignment pre-metrics (modules/midas.py:57-62)."""
        return apply_scale_and_shift(y_hat, y), y

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        y_hat, new_bs = self.apply(model, variables, x, train=True, mutable=True)
        y_hat = y_hat.astype(jnp.float32)
        loss = self._criterion(y_hat, y)
        if "ssi" in self.method.loss:
            y_hat, y = self._scale_shift(y_hat, y)
        return loss, {"batch_stats": new_bs, "y_hat": y_hat, "y": y, "logs": {}}

    def val_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self.apply(model, variables, x, train=False)
        y_hat = y_hat.astype(jnp.float32)
        loss = self._criterion(y_hat, y)
        if "ssi" in self.method.loss:
            y_hat, y = self._scale_shift(y_hat, y)
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat}

    def test_outputs(self, model, variables, batch):
        """Dict batch from midas_test_preprocess: predict on the padded
        square, upsample to 640, crop back to 480x640, compare against the
        raw-resolution depth (modules/midas.py:83-92)."""
        y = batch["depth"]
        y_hat, _ = self.apply(model, variables, batch["rgb"], train=False)
        y_hat = y_hat.astype(jnp.float32)
        if "ssi" in self.method.loss:
            y_hat, y = self._scale_shift(y_hat, y)
        y_hat = resize_nhwc(y_hat, (640, 640))
        y_hat = y_hat[:, 0:480, 0:640, :]
        return {"pairs": [("", y_hat, batch["depth_raw"])], "y_hat": y_hat}

    def optimizer(self):
        # pretrained encoder x0.1, scratch x1 (modules/midas.py:94-101)
        def label_fn(path):
            top = str(path[0]) if path else ""
            return "pretrained" if top.startswith("ResNetEncoder") else "scratch"

        return self.wrap_optimizer(make_optimizer(
            "adam", self.method.learning_rate, label_fn=label_fn,
            groups={"pretrained": {"mult": 0.1}, "scratch": {"mult": 1.0}},
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("midas", help="MiDaS specific parameters")
        Method.add_default_args(parser, name="midas", learning_rate=0.0001, batch_size=8)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--pretrained", default=0, type=int)
        parser.add_argument("--features", default=256, type=int)
        parser.add_argument("--out-channels", default=1, type=int)
        parser.add_argument("--loss", default="ssitrim", type=str,
                            help="[ssitrim, ssimse, ssil1, eigen, laina]")
        parser.add_argument("--data_augmentation", default="midas", type=str)
        parser.add_argument("--alpha", default=0.5, type=float)
        parser.add_argument("--reduction", default="batch-based", type=str)
        parser.add_argument(
            "--trim", default=0.2, type=float,
            help="trimmed-MAE fraction; 0.0 reproduces the reference's "
            "actual (buggy, untrimmed) behavior — see losses/midas.py",
        )
        return parser
