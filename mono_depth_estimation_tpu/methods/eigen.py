"""Eigen method (parity: /root/reference/modules/eigen.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.masked import masked_depth_loss
from mono_depth_estimation_tpu.methods.base import Method, resize_nhwc
from mono_depth_estimation_tpu.models.eigen import Eigen
from mono_depth_estimation_tpu.train.optim import make_optimizer


class EigenMethod(Method):
    NAME = "eigen"
    POLICY = "default"

    def output_size(self):
        return (240, 320)

    def resize(self):
        return 250

    def build_model(self):
        return Eigen()

    def pretrained_source(self):
        # torchvision vgg19_bn ImageNet features (network/Eigen.py:74)
        return "vgg19_bn"

    def sharding_rules(self):
        # the zoo's largest matmul: the VGG-head FC pair 35840->4096->17024
        # (network/Eigen.py:77-78) runs Megatron column/row-parallel
        from mono_depth_estimation_tpu.parallel.model_sharding import (
            EIGEN_FC_RULES,
        )

        return EIGEN_FC_RULES

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        y_hat, new_bs = self.apply(model, variables, x, train=True, mutable=True)
        # bilinear upsample pred to gt size (modules/eigen.py:28-31)
        y_hat = resize_nhwc(y_hat, (y.shape[1], y.shape[2]))
        loss = masked_depth_loss(y_hat, y)
        return loss, {"batch_stats": new_bs, "y_hat": y_hat, "y": y, "logs": {}}

    def val_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self.apply(model, variables, x, train=False)
        y_hat = resize_nhwc(y_hat, (y.shape[1], y.shape[2]))
        loss = masked_depth_loss(y_hat, y)
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat}

    def test_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self.apply(model, variables, x, train=False)
        # test protocol upsamples everything to 480x640 (modules/eigen.py:45-53)
        y = resize_nhwc(y, (480, 640))
        y_hat = resize_nhwc(y_hat, (480, 640))
        return {"pairs": [("", y_hat, y)], "y_hat": y_hat}

    def optimizer(self):
        # three per-scale groups, all at the same lr (modules/eigen.py:55-62)
        return self.wrap_optimizer(make_optimizer("adam", self.method.learning_rate))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("eigen", help="Eigen specific parameters")
        Method.add_default_args(parser, name="eigen", learning_rate=0.0001, batch_size=8)
        parser.add_argument("--backbone", default="vgg", type=str)
        parser.add_argument("--pretrained", default=1, type=int)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--data_augmentation", default="laina", type=str)
        parser.add_argument("--loss", default="eigen", type=str)
        return parser
