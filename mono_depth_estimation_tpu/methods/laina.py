"""FCRN/Laina method, re-purposed for stdepth (parity: modules/laina.py)."""

from __future__ import annotations

from mono_depth_estimation_tpu.losses.stdepth import StdepthLossConfig, stdepth_loss
from mono_depth_estimation_tpu.methods.base import Method
from mono_depth_estimation_tpu.models.fcrn import FCRN
from mono_depth_estimation_tpu.train.optim import make_optimizer


class LainaMethod(Method):
    NAME = "laina"
    POLICY = "laina"

    def output_size(self):
        return (240, 320)

    def resize(self):
        return 250

    def build_model(self):
        return FCRN(
            layers=50,
            decoder=getattr(self.method, "decoder", "upproj"),
            output_size=self.output_size(),
            out_channels=self.method.out_channels,
        )

    def loss_config(self, single_layer=True):
        return StdepthLossConfig(
            loss=self.method.loss,
            single_layer=single_layer,
            variance_focus=getattr(self.method, "variance_focus", 0.85),
            depth_loss_weight=self.method.depth_loss_weight,
            comp_loss_weight=self.method.comp_loss_weight,
            fbdiv_loss_weight=self.method.fbdiv_loss_weight,
            ssim_loss_weight=self.method.ssim_loss_weight,
        )

    def _rgba(self, x):
        """Input RGBA composite for the stdepth loss; pads alpha=1 when the
        input is plain RGB."""
        import jax.numpy as jnp

        if x.shape[-1] >= 4:
            return x[..., :4]
        ones = jnp.ones((*x.shape[:-1], 1), x.dtype)
        return jnp.concatenate([x, ones], axis=-1)

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        y_hat, new_bs = self.apply(
            model, variables, x[..., :3], train=True, mutable=True
        )
        single = y.shape[-1] == 10
        loss, pred_full, loss_dict = stdepth_loss(
            y_hat, y, self._rgba(x), self.loss_config(single)
        )
        return loss, {
            "batch_stats": new_bs, "y_hat": y_hat, "y": y,
            "pred_full": pred_full, "logs": loss_dict,
        }

    def val_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self.apply(model, variables, x[..., :3], train=False)
        single = y.shape[-1] == 10
        loss, pred_full, _ = stdepth_loss(
            y_hat, y, self._rgba(x), self.loss_config(single)
        )
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat,
                "pred_full": pred_full}

    def optimizer(self):
        # encoder x1, decoder head x10 (network/FCRN.py:373-391)
        def label_fn(path):
            return "1x" if path and str(path[0]).startswith("ResNetEncoder") else "10x"

        return self.wrap_optimizer(make_optimizer(
            "adam", self.method.learning_rate, label_fn=label_fn,
            groups={"1x": {"mult": 1.0}, "10x": {"mult": 10.0}},
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("laina", help="Laina specific parameters")
        Method.add_default_args(parser, name="laina", learning_rate=0.0001, batch_size=16)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--out-channels", default=20, type=int)
        parser.add_argument("--decoder", default="upproj", type=str,
                            help="upproj|fasterupproj|upconv|deconv2|deconv3")
        parser.add_argument("--data_augmentation", default="laina", type=str)
        parser.add_argument("--loss", default="mae+composite", type=str)
        parser.add_argument("--variance_focus", type=float, default=0.85)
        return parser
