"""Method abstraction — the framework's equivalent of the reference's
LightningModule layer (modules/base_module.py).

A Method bundles, per depth-estimation method:
  * the Flax model and its init
  * a pure, jit-safe ``train_loss(variables, batch, rng)``
  * pure ``val_outputs`` / ``test_outputs`` producing (pred, target[, group
    prefix]) pairs for on-device metric computation (the reference logs the
    same groups, e.g. BTS front_/back_/comp_/depth_/fh_depth_,
    modules/bts.py:110-124)
  * the optax optimizer with reference param-group multipliers
  * dataset plumbing: output_size/resize + the preprocess policy
  * the plateau monitor (all reference methods: 'val_delta1', mode max)

Unlike the reference, step functions are pure and batched — the training
loop jits them once and feeds mesh-sharded batches.
"""

from __future__ import annotations

import argparse
from collections.abc import Callable

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.data import NAME2FUNC
from mono_depth_estimation_tpu.data.base import ConcatDataset
from mono_depth_estimation_tpu.data.policies import POLICIES


class Method:
    NAME = "base"
    POLICY = "default"

    def __init__(self, globals_ns, method_ns):
        self.globals = globals_ns
        self.method = method_ns

    # ---------------------------------------------------------- data
    def output_size(self) -> tuple[int, int]:
        raise NotImplementedError()

    def resize(self) -> int:
        raise NotImplementedError()

    def policy_fns(self):
        """(train, val, test) per-sample transforms bound to this method's
        geometry. Each takes (rgb, depth, rng).

        Train-time augmentation uses the cv2 fast path when available
        (data/policies_fast.py, ~6x per-sample; set MDE_FAST_AUG=0 for the
        literal PIL pipeline). Val/test always use the PIL path — those
        transforms define eval parity."""
        import os

        from mono_depth_estimation_tpu.data.policies_fast import FAST_TRAIN

        train_p, val_p, test_p = POLICIES[self.POLICY]
        if (
            os.environ.get("MDE_FAST_AUG", "1") != "0"
            and self.POLICY in FAST_TRAIN
        ):
            train_p = FAST_TRAIN[self.POLICY]
        out, rs = self.output_size(), self.resize()

        def bind(fn):
            def bound(rgb, depth, rng):
                return fn(rgb, depth, resize=rs, output_size=out, rng=rng)

            return bound

        return bind(train_p), bind(val_p), bind(test_p)

    def build_datasets(self, training, validation, test):
        """Constructs datasets for each role list [(name, args_ns), ...];
        parity with BaseModule.get_dataset (base_module.py:304-322)."""

        def build(role, split):
            ds = [
                NAME2FUNC[name](ns, split, self.output_size(), self.resize())
                for name, ns in role
            ]
            if not getattr(self.globals, "no_raw_cache", False):
                from mono_depth_estimation_tpu.data.raw_cache import (
                    RawDiskCache,
                )

                # decode-once memmap cache for file-backed samples (the
                # torch.load decode is the fed-train bottleneck — see
                # data/raw_cache.py); in-memory/synthetic datasets have no
                # reader.files and pass through untouched
                ds = [
                    RawDiskCache(d)
                    if hasattr(getattr(d, "reader", None), "files")
                    else d
                    for d in ds
                ]
            if len(ds) > 1:
                return ConcatDataset(ds)
            return ds[0] if ds else None

        return build(training, "train"), build(validation, "val"), build(test, "test")

    # ---------------------------------------------------------- model
    def build_model(self):
        raise NotImplementedError()

    def init_variables(self, rng, sample_batch):
        from mono_depth_estimation_tpu.ops.preproc import dequantize_images

        model = self.build_model()
        # loaders may deliver uint8 images (ops/preproc.py device-side path)
        x = dequantize_images(jnp.asarray(self._model_input(sample_batch)))
        # jit the init: unjitted flax init dispatches each op eagerly —
        # thousands of device round trips on a remote/tunneled TPU.
        init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False))
        variables = init_fn(rng, x)
        from mono_depth_estimation_tpu.train.pretrained import (
            apply_method_pretrained,
        )

        variables = apply_method_pretrained(
            self, model, variables, example_shape=(1,) + tuple(x.shape[1:])
        )
        return model, variables

    def pretrained_source(self) -> str | None:
        """Named pretrained-encoder source for --pretrained (the download the
        reference performs, resolved here to a converted local file)."""
        return None

    def sharding_rules(self):
        """Tensor-parallel PartitionSpec rules for this method's large Dense
        layers (parallel/model_sharding.py), applied by the Trainer when the
        mesh has a model axis > 1. Default: none (pure data parallelism)."""
        return []

    def _model_input(self, batch):
        """Extracts the network input from a batch pytree."""
        return batch[0]

    # ---------------------------------------------------------- steps
    def train_loss(self, model, variables, batch, rng):
        """Returns (loss, aux) with aux = {'batch_stats', 'y_hat', 'y',
        'logs': {...}}. Must be pure/jit-safe."""
        raise NotImplementedError()

    def val_outputs(self, model, variables, batch):
        """Returns {'pairs': [(prefix, y_hat, y), ...], 'val_loss': scalar?}.

        y_hat/y are (B, H, W, C) arrays whose metrics the loop computes
        per-sample on device.
        """
        raise NotImplementedError()

    def test_outputs(self, model, variables, batch):
        return self.val_outputs(model, variables, batch)

    def apply(self, model, variables, x, train=False, rng=None, mutable=False):
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train and mutable:
            out, mut = model.apply(
                variables, x, train=True, mutable=["batch_stats"], **kwargs
            )
            return out, mut.get("batch_stats")
        return model.apply(variables, x, train=train, **kwargs), None

    # ---------------------------------------------------------- optim
    def optimizer(self):
        raise NotImplementedError()

    def frozen_predicate(self):
        """Returns predicate(flat param path) -> bool(frozen), or None.

        Covers --freeze_encoder (reference freeze_params on the encoder
        submodule, modules/base_module.py:31-33,89-91). Methods override to
        add their own fixing rules (e.g. BTS conv-block fixing).
        """
        if getattr(self.method, "freeze_encoder", False):
            return is_encoder_path
        return None

    def wrap_optimizer(self, tx):
        """Applies parameter freezing as a final update mask — equivalent to
        the reference's requires_grad=False (and it also suppresses weight
        decay on frozen params, matching torch)."""
        pred = self.frozen_predicate()
        if pred is None:
            return tx
        import optax
        from flax import traverse_util

        def mask_pytree(params):
            flat = traverse_util.flatten_dict(params)
            return traverse_util.unflatten_dict(
                {k: bool(pred(k)) for k in flat}
            )

        return optax.chain(tx, optax.masked(optax.set_to_zero(), mask_pytree))

    def monitor(self) -> tuple[str, str]:
        """(metric name, mode) for the plateau scheduler — every reference
        method monitors val_delta1 with mode 'max'."""
        return "val_delta1", "max"

    def lr_patience(self) -> int:
        return int(getattr(self.method, "lr_patience", 2))

    # ---------------------------------------------------------- args
    @staticmethod
    def add_default_args(parser: argparse.ArgumentParser, name: str,
                         learning_rate: float, batch_size: int, ckpt=None):
        """BaseModule.add_default_args parity (base_module.py:324-334)."""
        parser.add_argument("--name", default=name, type=str)
        parser.add_argument("--learning_rate", default=learning_rate, type=float)
        parser.add_argument("--batch_size", default=batch_size, type=int)
        parser.add_argument("--ckpt", default=ckpt, type=str)
        parser.add_argument(
            "--torch_weights", default=None, type=str,
            help="converted .msgpack (tools/convert_torch_ckpt.py) or raw "
                 "torch .ckpt/.pth to initialize from (full model or "
                 "encoder-only; replaces the reference's weight downloads)",
        )
        parser.add_argument("--freeze_encoder", action="store_true")
        parser.add_argument("--depth-loss-weight", type=float, default=10.0)
        parser.add_argument("--comp-loss-weight", type=float, default=2.0)
        parser.add_argument("--fbdiv-loss-weight", type=float, default=0.2)
        parser.add_argument("--ssim-loss-weight", type=float, default=2.0)

    @staticmethod
    def add_model_specific_args(subparsers):
        raise NotImplementedError()


def is_encoder_path(path: tuple[str, ...]) -> bool:
    top = str(path[0]) if path else ""
    return "Encoder" in top or "VGG19BNFeatures" in top


def resize_nhwc(x: jax.Array, size: tuple[int, int], method: str = "bilinear",
                align_corners: bool = False) -> jax.Array:
    """Shared F.interpolate equivalent for step logic."""
    from mono_depth_estimation_tpu.ops.resize import resize_bilinear, resize_nearest

    if method == "nearest":
        return resize_nearest(x, size)
    return resize_bilinear(x, size, align_corners=align_corners)
