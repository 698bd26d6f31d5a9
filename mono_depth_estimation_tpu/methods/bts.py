"""BTS method for stdepth (parity: /root/reference/modules/bts.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.stdepth import StdepthLossConfig, stdepth_loss
from mono_depth_estimation_tpu.methods.base import Method
from mono_depth_estimation_tpu.models.bts import BtsModel
from mono_depth_estimation_tpu.train.optim import make_optimizer


class BtsMethod(Method):
    NAME = "bts"
    POLICY = "bts"

    def output_size(self):
        return (512, 512)

    def resize(self):
        return 512

    def build_model(self):
        return BtsModel(
            bts_size=self.method.bts_size,
            max_depth=self.method.max_depth,
            out_channels=self.method.out_channels,
            image_residuals=getattr(self.method, "image_residuals", False),
            encoder_version=self.method.encoder,
            frozen_bn=getattr(self.method, "bn_no_track_stats", False),
        )

    def loss_config(self, single_layer=True):
        return StdepthLossConfig(
            loss=self.method.loss,
            single_layer=single_layer,
            variance_focus=self.method.variance_focus,
            depth_loss_weight=self.method.depth_loss_weight,
            comp_loss_weight=self.method.comp_loss_weight,
            fbdiv_loss_weight=self.method.fbdiv_loss_weight,
            ssim_loss_weight=self.method.ssim_loss_weight,
        )

    def _model_input(self, batch):
        # the network consumes rgb only (modules/bts.py:99,104-105)
        return batch[0][..., :3]

    def _rgba(self, x):
        if x.shape[-1] >= 4:
            return x[..., :4]
        ones = jnp.ones((*x.shape[:-1], 1), x.dtype)
        return jnp.concatenate([x, ones], axis=-1)

    def _forward(self, model, variables, x, train, mutable=False):
        # rgb = x[..., :3] (modules/bts.py:99,104-105)
        if train and mutable:
            outs, mut = model.apply(
                variables, x[..., :3], train=True, mutable=["batch_stats"]
            )
            return outs[4], mut.get("batch_stats")
        outs = model.apply(variables, x[..., :3], train=train)
        return outs[4], None

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        y_hat, new_bs = self._forward(model, variables, x, True, mutable=True)
        single = y.shape[-1] == 10
        loss, pred_full, loss_dict = stdepth_loss(
            y_hat, y, self._rgba(x), self.loss_config(single)
        )
        return loss, {
            "batch_stats": new_bs, "y_hat": y_hat, "y": y,
            "pred_full": pred_full, "logs": loss_dict,
        }

    def val_outputs(self, model, variables, batch):
        """Metric groups per modules/bts.py:110-124: bare metrics on the two
        depth channels, then front_/back_/comp_/depth_/fh_depth_ prefixes."""
        x, y = batch
        y_hat, _ = self._forward(model, variables, x, False)
        single = y.shape[-1] == 10
        loss, pred_full, _ = stdepth_loss(
            y_hat, y, self._rgba(x), self.loss_config(single)
        )
        pairs = [
            ("", y_hat[..., 8:10], y[..., 8:10]),
            ("front_", y_hat[..., :4], y[..., :4]),
            ("back_", y_hat[..., 4:8], y[..., 4:8]),
            ("comp_", pred_full, self._rgba(x)),
            ("depth_", y_hat[..., 8:9], y[..., 8:9]),
            ("fh_depth_", y_hat[..., 9:10], y[..., 9:10]),
        ]
        return {"pairs": pairs, "val_loss": loss, "y_hat": y_hat,
                "pred_full": pred_full}

    def test_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self._forward(model, variables, x, False)
        single = y.shape[-1] == 10
        loss, pred_full, _ = stdepth_loss(
            y_hat, y, self._rgba(x), self.loss_config(single)
        )
        return {"pairs": [("", y_hat, y)], "y_hat": y_hat,
                "pred_full": pred_full}

    def frozen_predicate(self):
        """Encoder layer fixing (modules/bts.py:56-87).

        The reference ALWAYS runs the fixing branch (its guard tests key
        presence, and argparse always defines the keys): by default the
        first conv and every encoder BatchNorm affine are frozen;
        --fix_first_conv_block(s) extends to the first one/two conv blocks.
        freeze_encoder freezes the whole encoder.
        """
        base = super().frozen_predicate()
        if base is not None:
            return base  # whole encoder frozen

        is_dense = "densenet" in self.method.encoder
        fix2 = getattr(self.method, "fix_first_conv_blocks", False)
        fix1 = getattr(self.method, "fix_first_conv_block", False)

        def pred(path):
            top = str(path[0]) if path else ""
            if "Encoder" not in top:
                return False
            sub = "/".join(str(p) for p in path[1:])
            if "BatchNorm" in sub:  # '.bn' / 'norm' substrings in the ref
                return True
            if is_dense:
                if sub.startswith("Conv_0/"):  # conv0
                    return True
                if (fix1 or fix2) and sub.startswith("DenseBlock_0/DenseLayer_0/"):
                    return True
                if fix2 and sub.startswith("DenseBlock_0/DenseLayer_1/"):
                    return True
            else:
                if sub.startswith("Conv_0/"):  # conv1
                    return True
                if (fix1 or fix2) and sub.startswith("BottleneckBlock_0/"):
                    return True
                if fix2 and sub.startswith("BottleneckBlock_1/"):
                    return True
            return False

        return pred

    def optimizer(self):
        # AdamW: encoder with weight decay, decoder without
        # (modules/bts.py:139-146)
        def label_fn(path):
            top = str(path[0]) if path else ""
            return "encoder" if ("Encoder" in top) else "decoder"

        return self.wrap_optimizer(make_optimizer(
            "adamw", self.method.learning_rate, label_fn=label_fn,
            groups={
                "encoder": {"weight_decay": self.method.weight_decay},
                "decoder": {"weight_decay": 0.0},
            },
            eps=self.method.adam_eps,
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("bts", help="Bts specific parameters")
        Method.add_default_args(parser, name="bts", learning_rate=0.0001, batch_size=8)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--bts_size", type=int, default=512)
        parser.add_argument("--out-channels", type=int, default=10)
        parser.add_argument("--image-residuals", action="store_true")
        parser.add_argument("--max_depth", type=int, default=1.0)
        parser.add_argument("--encoder", type=str, default="densenet161_bts")
        parser.add_argument("--variance_focus", type=float, default=0.85)
        parser.add_argument("--adam_eps", type=float, default=1e-3)
        parser.add_argument("--weight_decay", type=float, default=1e-2)
        parser.add_argument("--data_augmentation", default="bts", type=str)
        parser.add_argument("--loss", default="silma", type=str)
        parser.add_argument("--fix_first_conv_blocks", action="store_true")
        parser.add_argument("--fix_first_conv_block", action="store_true")
        parser.add_argument("--bn_no_track_stats", action="store_true")
        return parser
