"""VNL method (parity: /root/reference/modules/vnl.py)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.vnl import VNLConfig, model_loss
from mono_depth_estimation_tpu.methods.base import Method, resize_nhwc
from mono_depth_estimation_tpu.models.vnl import MetricDepthModel
from mono_depth_estimation_tpu.train.optim import make_optimizer


class VnlMethod(Method):
    NAME = "vnl"
    POLICY = "vnl"

    def __init__(self, globals_ns, method_ns):
        super().__init__(globals_ns, method_ns)
        c = int(method_ns.dec_out_c)
        self.depth_min_log = float(np.log10(method_ns.depth_min))
        self.depth_bin_interval = float(
            (np.log10(method_ns.depth_max) - np.log10(method_ns.depth_min)) / c
        )
        self.depth_bin_border = jnp.asarray(
            [self.depth_min_log + self.depth_bin_interval * (i + 0.5) for i in range(c)],
            jnp.float32,
        )
        self.vnl_cfg = VNLConfig(
            focal_x=float(method_ns.focal_x),
            focal_y=float(method_ns.focal_y),
            input_size=tuple(method_ns.crop_size),
        )

    def output_size(self):
        return tuple(self.method.crop_size)

    def resize(self):
        return 400

    def build_model(self):
        return MetricDepthModel(
            encoder=self.method.encoder,
            enc_dim_out=tuple(int(v) for v in self.method.enc_dim_out),
            dec_dim_in=tuple(int(v) for v in self.method.dec_dim_in),
            dec_dim_out=tuple(int(v) for v in self.method.dec_dim_out),
            dec_out_c=int(self.method.dec_out_c),
            crop_size=tuple(self.method.crop_size),
        )

    def _model_input(self, batch):
        return batch["A"]

    def pretrained_source(self):
        # ImageNet weights for the configured encoder (network/VNL.py:21-95)
        return str(self.method.encoder)

    # -- bin <-> depth (modules/vnl.py:202-230)
    def depth_to_bins(self, depth):
        c = int(self.method.dec_out_c)
        invalid = depth < 0.0
        d = jnp.clip(depth, self.method.depth_min, self.method.depth_max)
        bins = ((jnp.log10(d) - self.depth_min_log) / self.depth_bin_interval).astype(
            jnp.int32
        )
        bins = jnp.where(bins == c, c - 1, bins)
        bins = jnp.where(invalid, c + 1, bins)
        return bins

    def bins_to_depth(self, depth_bin):
        """(B, H, W, C) softmax -> (B, H, W, 1) depth."""
        depth = jnp.sum(depth_bin * self.depth_bin_border, axis=-1, keepdims=True)
        return 10.0**depth

    def _predicted_depth(self, logits, cls):
        if self.method.prediction_method == "classification":
            return self.bins_to_depth(cls)
        if self.method.prediction_method == "regression":
            return jax.nn.sigmoid(logits[..., :1])
        raise ValueError("Unknown prediction method")

    def train_loss(self, model, variables, batch, rng):
        (logits, cls), mut = model.apply(
            variables, batch["A"], train=True, mutable=["batch_stats"]
        )
        gt_depth = batch["B"][..., 0]
        gt_bins = self.depth_to_bins(gt_depth)
        # the reference's depth_to_bins MUTATES batch['B'] in place
        # (modules/vnl.py:209-215: clamp to [depth_min, depth_max], then
        # invalid (<0) pixels set to -1) and its criterion consumes the
        # MUTATED gt — replicated functionally here (round-5 fix; pinned by
        # tests/test_gradient_parity.py::test_vnl_full_module_gradient_parity)
        invalid = gt_depth < 0.0
        gt_mutated = jnp.where(
            invalid, -1.0,
            jnp.clip(gt_depth, self.method.depth_min, self.method.depth_max),
        )
        loss = model_loss(
            self.bins_to_depth(cls),
            logits,
            gt_bins,
            gt_mutated,
            cfg=self.vnl_cfg,
            dec_out_c=int(self.method.dec_out_c),
            diff_loss_weight=float(self.method.diff_loss_weight),
            key=rng,
        )
        y_hat = self._predicted_depth(logits, cls)
        return loss, {
            "batch_stats": mut.get("batch_stats"), "y_hat": y_hat,
            "y": batch["B"], "logs": {},
        }

    def val_outputs(self, model, variables, batch):
        """restore_prediction protocol (modules/vnl.py:232-246): divide the
        crop-resolution prediction by the stored ratio (= multiply by
        resize_ratio, mapping model scale back to raw depth scale), resize
        to the raw 512-high resolution, and compare against B_raw. The
        reference's per-sample invalid_side crop is structurally zero on
        val/test batches (size_index pinned to 512 -> pad_height == 0,
        data/policies.py _vnl_preprocess), so the restore is jit-static.

        Round-5 fix: this previously MULTIPLIED by the stored ratio
        (1/resize_ratio) and compared against B at crop resolution — the
        prediction landed a factor resize_ratio^2 off the reference's
        raw-scale comparison, skewing every scale-sensitive metric. The
        evaluate-level parity certificate (tests/test_evaluate_parity.py)
        now pins the corrected protocol against the reference's own code."""
        logits, cls = model.apply(variables, batch["A"], train=False)
        y_hat = self._predicted_depth(logits, cls)
        ratio = batch["ratio"].reshape(-1, 1, 1, 1)
        y_hat = y_hat / ratio  # pred / data['ratio'] (modules/vnl.py:236)
        if "B_raw" in batch:
            y = batch["B_raw"]
            y_hat = resize_nhwc(y_hat, tuple(y.shape[1:3]))
        else:  # crop-resolution fallback (no raw target in the batch):
            # compare at raw SCALE anyway — B/ratio == raw depth values
            y = batch["B"] / ratio
        return {"pairs": [("", y_hat, y)], "y_hat": y_hat}

    # decoder stage -> top-level flax module names, in the reference's
    # freezing order [top, fcn1..5, predict] (modules/vnl.py:167-179)
    _DECODER_STAGES = (
        ("Conv_0", "BatchNorm_0"),        # top
        ("FCNTopdownBlock_0",),           # topdown_fcn1
        ("FCNTopdownBlock_1",),
        ("FCNTopdownBlock_2",),
        ("FCNTopdownBlock_3",),
        ("FTBBlock_4",),                  # topdown_fcn5
        ("Conv_1",),                      # topdown_predict
    )

    def frozen_predicate(self):
        """--finetune n in [-1..-5]: freeze the encoder (incl. laterals and
        the ASPP top, which live in the reference's encoder_modules) plus
        all decoder stages except the last |n| (modules/vnl.py:167-179)."""
        base = super().frozen_predicate()
        finetune = int(getattr(self.method, "finetune", 0))
        if finetune not in (-1, -2, -3, -4, -5):
            return base

        frozen_stage_names = set()
        for stage in self._DECODER_STAGES[:finetune]:
            frozen_stage_names.update(stage)
        # encoder_modules in the reference = bottomup + ASPP + lateral FTBs
        encoder_tops = {"ASPPBlock_0", "GlobalPoolBlock_0",
                        "FTBBlock_0", "FTBBlock_1", "FTBBlock_2", "FTBBlock_3"}

        def pred(path):
            top = str(path[0]) if path else ""
            if "Encoder" in top or top in encoder_tops:
                return True
            return top in frozen_stage_names

        return pred

    def optimizer(self):
        # SGD momentum 0.9; encoder x1, decoder x scale_decoder_lr
        # (modules/vnl.py:289-326)
        def label_fn(path):
            top = str(path[0]) if path else ""
            is_enc = top.startswith("ResNetEncoder") or top.startswith(
                "MobileNetV2Encoder"
            )
            return "encoder" if is_enc else "decoder"

        return self.wrap_optimizer(make_optimizer(
            "sgd", self.method.learning_rate, label_fn=label_fn,
            groups={
                "encoder": {"mult": 1.0},
                "decoder": {"mult": float(self.method.scale_decoder_lr)},
            },
            weight_decay=float(self.method.weight_decay),
            momentum=0.9,
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("vnl", help="VNL specific parameters")
        Method.add_default_args(parser, name="vnl", learning_rate=0.0001, batch_size=8)
        parser.add_argument("--weight_decay", default=0.0005, type=float)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--encoder", default="resnext50_32x4d_body_stride16", type=str)
        parser.add_argument("--init_type", default="xavier", type=str)
        parser.add_argument("--pretrained", default=0, type=int)
        parser.add_argument("--enc_dim_in", nargs="+", default=[64, 256, 512, 1024, 2048])
        parser.add_argument("--enc_dim_out", nargs="+", default=[512, 256, 256, 256])
        parser.add_argument("--dec_dim_in", nargs="+", default=[512, 256, 256, 256, 256, 256])
        parser.add_argument("--dec_dim_out", nargs="+", default=[256, 256, 256, 256, 256])
        parser.add_argument("--dec_out_c", default=150, type=int)
        parser.add_argument("--crop_size", default=(385, 385))
        parser.add_argument("--scale_decoder_lr", default=0.1, type=float)
        parser.add_argument("--freeze_backbone", action="store_true")
        parser.add_argument("--depth_min", default=0.01, type=float)
        parser.add_argument("--depth_max", default=1.1, type=float)
        parser.add_argument("--focal_x", default=519.0, type=float)
        parser.add_argument("--focal_y", default=519.0, type=float)
        parser.add_argument("--diff_loss_weight", default=6, type=float)
        parser.add_argument("--prediction_method", default="classification", type=str)
        parser.add_argument("--data_augmentation", default="vnl", type=str)
        parser.add_argument("--loss", default="vnl", type=str)
        parser.add_argument("--finetune", default=0, type=int)
        return parser
