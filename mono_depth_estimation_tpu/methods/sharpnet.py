"""SharpNet method (parity: /root/reference/modules/sharpnet.py:79-163).

The reference leaves SharpNetModule OUT of its registry
(modules/__init__.py:3) and its dataset plumbing references a stale
Floorplan3D enum (modules/sharpnet.py:66-76); this framework registers it
with the standard dataset plumbing — a documented capability improvement.
"""

from __future__ import annotations

import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.masked import (
    berhu_loss,
    laina_berhu_loss,
    masked_l1_loss,
)
from mono_depth_estimation_tpu.methods.base import Method
from mono_depth_estimation_tpu.models.sharpnet import SharpNet
from mono_depth_estimation_tpu.train.optim import make_optimizer


class SharpnetMethod(Method):
    NAME = "sharpnet"
    POLICY = "sharpnet"

    def output_size(self):
        return (240, 320)

    def resize(self):
        return 240

    def build_model(self):
        return SharpNet(use_depth=True)

    def _criterion(self, y_hat, y):
        """Loss switch (modules/sharpnet.py:102-107)."""
        loss_name = self.method.loss
        if loss_name == "berHuLoss":
            return berhu_loss(y_hat, y)
        if loss_name == "L1":
            return masked_l1_loss(y_hat, y)
        if loss_name == "SharpNetLoss":
            # the reference maps 'SharpNetLoss' to LainaBerHuLoss here
            # (modules/sharpnet.py:106-107)
            return laina_berhu_loss(y_hat, y)
        raise ValueError(f"unknown sharpnet loss: {loss_name}")

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        outs, new_bs = self.apply(model, variables, x, train=True, mutable=True)
        y_hat = outs["depth"].astype(jnp.float32)
        loss = self._criterion(y_hat, y)
        return loss, {"batch_stats": new_bs, "y_hat": y_hat, "y": y, "logs": {}}

    def val_outputs(self, model, variables, batch):
        x, y = batch
        outs, _ = self.apply(model, variables, x, train=False)
        y_hat = outs["depth"].astype(jnp.float32)
        loss = self._criterion(y_hat, y)
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat}

    def optimizer(self):
        return self.wrap_optimizer(make_optimizer(
            "adam", self.method.learning_rate,
            weight_decay=float(self.method.weight_decay),
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("sharpnet", help="SharpNet parameters")
        Method.add_default_args(
            parser, name="sharpnet", learning_rate=0.0001, batch_size=16
        )
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--weight_decay", default=5e-5, type=float)
        parser.add_argument("--loss", default="SharpNetLoss", type=str,
                            help="[berHuLoss, L1, SharpNetLoss]")
        parser.add_argument("--data_augmentation", default="sharpnet", type=str)
        return parser
