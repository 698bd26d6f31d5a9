"""MyNet method (parity: /root/reference/modules/my.py)."""

from __future__ import annotations

from mono_depth_estimation_tpu.losses.midas import midas_loss
from mono_depth_estimation_tpu.methods.base import Method, resize_nhwc
from mono_depth_estimation_tpu.models.mynet import MyModel
from mono_depth_estimation_tpu.train.optim import make_optimizer


class MyMethod(Method):
    NAME = "my"
    POLICY = "my"

    def output_size(self):
        return (384, 384)

    def resize(self):
        return 400

    def build_model(self):
        return MyModel(input_size=self.output_size())

    def _criterion(self, y_hat, y):
        # MidasLoss(alpha=0.5, loss='mse', reduction='batch-based')
        # (modules/my.py:38-39)
        return midas_loss(y_hat, y, alpha=0.5, loss="mse", reduction="batch-based")

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        y_hat, new_bs = self.apply(model, variables, x, train=True, mutable=True)
        loss = self._criterion(y_hat, y)
        return loss, {"batch_stats": new_bs, "y_hat": y_hat, "y": y, "logs": {}}

    def val_outputs(self, model, variables, batch):
        x, y = batch
        y_hat, _ = self.apply(model, variables, x, train=False)
        loss = self._criterion(y_hat, y)
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat}

    def test_outputs(self, model, variables, batch):
        x, y = batch
        x = resize_nhwc(x, self.output_size())
        y_hat, _ = self.apply(model, variables, x, train=False)
        y = resize_nhwc(y, (480, 640))
        y_hat = resize_nhwc(y_hat, (480, 640))
        return {"pairs": [("", y_hat, y)], "y_hat": y_hat}

    def optimizer(self):
        # encoder x1, decoder x10, Adam (modules/my.py:70-81)
        def label_fn(path):
            top = str(path[0]) if path else ""
            return "encoder" if "Encoder" in top else "decoder"

        return self.wrap_optimizer(make_optimizer(
            "adam", self.method.learning_rate, label_fn=label_fn,
            groups={"encoder": {"mult": 1.0}, "decoder": {"mult": 10.0}},
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("my", help="MyModel specific parameters")
        Method.add_default_args(parser, name="my", learning_rate=0.0001, batch_size=16)
        parser.add_argument("--lr_patience", default=2, type=int)
        return parser
