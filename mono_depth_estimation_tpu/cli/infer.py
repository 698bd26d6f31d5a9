"""infer CLI (parity: /root/reference/infer.py).

Test-mode inference that also WRITES predictions: the prediction directory
is derived from the checkpoint path with 'checkpoints' -> 'predictions'
(infer.py:46-47). Each batch writes pred_XXXX.npz (prediction + composited)
plus a visualization png.

Reference bug NOT copied: infer.py:60 uses the nonexistent
``torch.utils.data.Dataloader`` making --inputs dead code; here --inputs
works (directory of .npz/.npy files with 'rgb' and 'gt' entries).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax

from mono_depth_estimation_tpu.cli.common import (
    build_mesh,
    build_parser,
    derive_globals,
    parse_args_into_namespaces,
)
from mono_depth_estimation_tpu.data.base import BaseDataset
from mono_depth_estimation_tpu.methods import get_method
from mono_depth_estimation_tpu.parallel.mesh import shard_batch
from mono_depth_estimation_tpu.train.loop import Trainer


class NpyDataset(BaseDataset):
    """--inputs loader (infer.py:13-24, fixed)."""

    def __init__(self, path, split="test"):
        super().__init__(split)
        self.images = sorted(
            list(Path(path).rglob("*.npy")) + list(Path(path).rglob("*.npz"))
        )

    def get_raw(self, index):
        item = np.load(self.images[index], allow_pickle=True)
        return np.asarray(item["rgb"]), np.asarray(item["gt"])


def main(argv=None):
    parser, commands = build_parser("Runs inference writing predictions")
    parser.add_argument("--inputs", type=str, default=None,
                        help="Path to .npy/.npz files")
    args = parse_args_into_namespaces(parser, commands, argv)
    assert args.test, "Please provide test dataset"
    derive_globals(args)

    ckpt = getattr(args.method, "ckpt", None)
    assert ckpt, "Please provide --ckpt on the method"
    pred_path = Path(str(Path(ckpt).parent).replace("checkpoints", "predictions"))
    pred_path.mkdir(parents=True, exist_ok=True)

    method = get_method(args)
    mesh = build_mesh(args.globals)
    trainer = Trainer(
        method,
        metrics=args.globals.metrics,
        precision=getattr(args.globals, "precision", 16),
        run_name=args.globals.name or "infer",
        worker=args.globals.worker,
        mesh=mesh,
        spatial=getattr(args.globals, "spatial", 1),
    )

    if args.globals.inputs:
        test_ds = NpyDataset(args.globals.inputs)
        _, _, test_fn = method.policy_fns()
        from mono_depth_estimation_tpu.data.loader import Loader

        test_loader = Loader(
            test_ds, trainer.eval_batch_size, transform=lambda r, d, g: test_fn(r, d, g),
            num_workers=args.globals.worker,
        )
    else:
        _, _, test_ds = method.build_datasets([], [], args.test)
        _, _, test_loader = trainer._loaders(None, None, test_ds)

    sample, _ = next(iter(test_loader))
    trainer.setup(sample, restore_ckpt=ckpt)

    from mono_depth_estimation_tpu.viz import save_stdepth_prediction

    from mono_depth_estimation_tpu.ops.preproc import dequantize_images

    @jax.jit
    def outputs_fn(v, b):
        # loaders deliver uint8 images (device-side u8 path); restore f32
        # in-graph exactly like train/steps._cast_inputs does
        out = method.test_outputs(trainer.model, v, dequantize_images(b))
        return out["y_hat"], out.get("pred_full", out["y_hat"])

    results_acc = None
    for bi, (batch, mask) in enumerate(test_loader):
        dbatch = shard_batch(batch, trainer.mesh)
        y_hat_dev, pred_full_dev = outputs_fn(trainer._variables(), dbatch)
        y_hat = np.asarray(y_hat_dev)
        pred_full = np.asarray(pred_full_dev)
        np.savez(
            pred_path / f"pred_{bi:04d}.npz",
            prediction=y_hat, composited=pred_full,
        )
        save_stdepth_prediction(
            pred_path / f"pred_{bi:04d}.png", batch, y_hat, pred_full
        )
        results, _ = trainer._test_step(trainer._variables(), dbatch)
        results = {k: float(np.asarray(v)[mask].mean()) for k, v in results.items()}
        if results_acc is None:
            results_acc = {k: [v] for k, v in results.items()}
        else:
            for k, v in results.items():
                results_acc[k].append(v)

    for key, vals in sorted((results_acc or {}).items()):
        print("{}: {}".format(key, round(float(np.mean(vals)), 3)))
    print(f"Wrote predictions to {pred_path}")


if __name__ == "__main__":
    main()
