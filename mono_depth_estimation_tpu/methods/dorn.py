"""DORN method (parity: /root/reference/modules/dorn.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.losses.ordinal import SIDBins, ord_loss
from mono_depth_estimation_tpu.methods.base import Method, resize_nhwc
from mono_depth_estimation_tpu.models.dorn import DORN
from mono_depth_estimation_tpu.train.optim import make_optimizer


class DornMethod(Method):
    NAME = "dorn"
    POLICY = "default"

    def __init__(self, globals_ns, method_ns):
        super().__init__(globals_ns, method_ns)
        ds_name = getattr(globals_ns, "ds_name", "nyu")
        # per-dataset alpha/beta overrides (modules/dorn.py:10-71): the CLI
        # passes alpha/beta directly; ds_name only picks documented presets.
        self.bins = SIDBins(
            alpha=float(method_ns.alpha),
            beta=float(method_ns.beta),
            ord_num=int(method_ns.ord_num),
            discretization=method_ns.discretization,
        )
        self.ds_name = ds_name

    def output_size(self):
        return tuple(self.method.input_size)

    def resize(self):
        # shorter side ~ input height (reference feeds 257x353 via laina aug)
        return int(self.method.input_size[0])

    def build_model(self):
        # --pipeline_stages S > 1: eval forwards GPipe layer3's 22 identical
        # dilated blocks over the mesh model axis (models/dorn.py docstring);
        # the Trainer hands us its mesh before init_variables
        pp = max(1, int(getattr(self.globals, "pipeline_stages", 1) or 1))
        mesh = getattr(self, "mesh", None)
        if pp > 1:
            assert mesh is not None, (
                "--pipeline_stages needs the trainer mesh (set method.mesh)"
            )
            assert dict(mesh.shape).get("model", 1) == pp, (
                f"mesh model axis {dict(mesh.shape)} != pipeline_stages {pp}"
            )
        return DORN(
            ord_num=int(self.method.ord_num),
            input_size=tuple(self.method.input_size),
            kernel_size=int(self.method.kernel_size),
            pyramid=tuple(int(p) for p in self.method.pyramid),
            dropout_prob=float(self.method.dropout),
            pipeline_stages=pp if pp > 1 else 0,
            pipeline_mesh=mesh if pp > 1 else None,
        )

    def pretrained_source(self):
        # SceneParsing ResNet-101 (network/Dorn.py:179-228)
        return "dorn_sceneparsing"

    def sharding_rules(self):
        # FullImageEncoder's 2048*h*w -> 512 FC (network/Dorn.py:64) is
        # column-parallel over the model axis
        from mono_depth_estimation_tpu.parallel.model_sharding import (
            DORN_FC_RULES,
        )

        return DORN_FC_RULES

    def _forward(self, model, variables, x, train, rng=None, mutable=False):
        kwargs = {"rngs": {"dropout": rng}} if rng is not None else {}
        if train and mutable:
            (label, prob), mut = model.apply(
                variables, x, train=True, mutable=["batch_stats"], **kwargs
            )
            return label, prob, mut.get("batch_stats")
        label, prob = model.apply(variables, x, train=train, **kwargs)
        return label, prob, None

    def train_loss(self, model, variables, batch, rng):
        x, y = batch
        label, prob, new_bs = self._forward(
            model, variables, x, True, rng=rng, mutable=True
        )
        y_sid = self.bins.depth_to_label(jnp.maximum(y[..., 0], 1e-8))
        loss = ord_loss(prob, y_sid)
        y_hat = self.bins.label_to_depth(label.astype(jnp.float32))
        return loss, {"batch_stats": new_bs, "y_hat": y_hat, "y": y, "logs": {}}

    def val_outputs(self, model, variables, batch):
        x, y = batch
        label, prob, _ = self._forward(model, variables, x, False)
        y_hat = self.bins.label_to_depth(label.astype(jnp.float32))
        y_sid = self.bins.depth_to_label(jnp.maximum(y[..., 0], 1e-8))
        loss = ord_loss(prob, y_sid)
        return {"pairs": [("", y_hat, y)], "val_loss": loss, "y_hat": y_hat}

    def test_outputs(self, model, variables, batch):
        x, y = batch
        label, _, _ = self._forward(model, variables, x, False)
        y_hat = self.bins.label_to_depth(label.astype(jnp.float32))
        # test at 480x640 (modules/dorn.py:176-186)
        x640 = resize_nhwc(x, (480, 640))
        y640 = resize_nhwc(y, (480, 640))
        y_hat = resize_nhwc(y_hat, (480, 640))
        del x640
        return {"pairs": [("", y_hat, y640)], "y_hat": y_hat}

    def overlapping_window_method(self, model, variables, x, rng, crops: int = 20):
        """Multi-crop averaged inference (modules/dorn.py:109-151), vmapped:
        scale the image by s~U(1,1.5), predict whole + ``crops`` random
        windows at native size, average overlaps, resize back."""
        in_h, in_w = x.shape[1], x.shape[2]
        k_s, k_ij = jax.random.split(rng)
        s = jax.random.uniform(k_s, (), minval=1.0, maxval=1.5)
        # static upscaled canvas at max scale; content scaled dynamically is
        # not jit-able — use the fixed 1.25 midpoint canvas like a static
        # grid and fold s into the depth rescale (documented deviation:
        # the reference samples the canvas size dynamically).
        height, width = int(in_h * 1.25), int(in_w * 1.25)
        label, _, _ = self._forward(model, variables, x, False)
        y_hat = self.bins.label_to_depth(label.astype(jnp.float32))
        resized = resize_nhwc(x, (height, width))
        y_acc = resize_nhwc(y_hat, (height, width))
        counts = jnp.ones((x.shape[0], height, width, 1), jnp.float32)

        ij = jax.random.randint(
            k_ij, (crops, 2), 0,
            jnp.array([height - in_h + 1, width - in_w + 1]),
        )

        def crop_one(start):
            return jax.lax.dynamic_slice(
                resized,
                (0, start[0], start[1], 0),
                (x.shape[0], in_h, in_w, x.shape[3]),
            )

        crops_batch = jnp.concatenate([crop_one(ij[q]) for q in range(crops)], 0)
        label_c, _, _ = self._forward(model, variables, crops_batch, False)
        y_crop = self.bins.label_to_depth(label_c.astype(jnp.float32)) * s
        y_crop = y_crop.reshape(crops, x.shape[0], in_h, in_w, 1)

        def add_window(carry, inp):
            y_acc, counts = carry
            start, patch = inp
            pad = jnp.zeros_like(y_acc)
            patch_full = jax.lax.dynamic_update_slice(
                pad, patch, (0, start[0], start[1], 0)
            )
            ones = jax.lax.dynamic_update_slice(
                jnp.zeros_like(counts),
                jnp.ones((x.shape[0], in_h, in_w, 1), jnp.float32),
                (0, start[0], start[1], 0),
            )
            return (y_acc + patch_full, counts + ones), None

        (y_acc, counts), _ = jax.lax.scan(add_window, (y_acc, counts), (ij, y_crop))
        return resize_nhwc(y_acc / counts, (in_h, in_w), method="nearest")

    def optimizer(self):
        # SGD: backbone x1, SceneUnderstanding x10 (modules/dorn.py:188-195)
        def label_fn(path):
            top = str(path[0]) if path else ""
            return "backbone" if top.startswith("ResNetEncoder") else "head"

        return self.wrap_optimizer(make_optimizer(
            "sgd", self.method.learning_rate, label_fn=label_fn,
            groups={"backbone": {"mult": 1.0}, "head": {"mult": 10.0}},
            weight_decay=self.method.weight_decay,
        ))

    @staticmethod
    def add_model_specific_args(subparsers):
        parser = subparsers.add_parser("dorn", help="DORN specific parameters")
        Method.add_default_args(parser, name="dorn", learning_rate=0.0001, batch_size=8)
        parser.add_argument("--pretrained", default=1, type=int)
        parser.add_argument("--lr_patience", default=2, type=int)
        parser.add_argument("--weight_decay", default=0.0005, type=float)
        parser.add_argument("--ord_num", default=68, type=float)
        parser.add_argument("--alpha", default=0.001, type=float)
        parser.add_argument("--beta", default=1.0, type=float)
        parser.add_argument("--input_size", default=(257, 353))
        parser.add_argument("--kernel_size", default=16, type=int)
        parser.add_argument("--pyramid", default=[4, 8, 12], nargs="+")
        parser.add_argument("--batch_norm", default=0, type=int)
        parser.add_argument("--discretization", default="SID", type=str)
        parser.add_argument("--dropout", default=0.5, type=float)
        parser.add_argument("--data_augmentation", default="laina", type=str)
        parser.add_argument("--loss", default="dorn", type=str)
        return parser
