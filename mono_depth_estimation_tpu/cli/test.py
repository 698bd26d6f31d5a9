"""Batch-test harness (parity: /root/reference/test.py).

Walks a results tree ``<results>/<method>/<version>``, picks each version's
newest eligible checkpoint from its ``checkpoints/`` subdir, tests it on the
requested Floorplan3D variants / NYU mirror splits, and appends CSV rows
``version,epoch,method,loss,aug,train,test,<metrics...>`` (test.py:96).

Experiment presets --exp1/--exp2 follow test.py:85-90.
"""

from __future__ import annotations

import argparse
import json
from argparse import Namespace
from pathlib import Path

import numpy as np


def get_checkpoint(version_path, min_epoch=1):
    """Newest checkpoint with epoch >= min_epoch (test.py:14-24); supports
    both this framework's epoch=E-val_loss=V.ckpt and bare epoch=E.ckpt."""
    from mono_depth_estimation_tpu.train.checkpoint import parse_ckpt_name

    ckpt_dir = Path(version_path, "checkpoints")
    if not ckpt_dir.exists():
        return None
    entries = []
    for ckpt in ckpt_dir.glob("*"):
        if "last" in ckpt.name:
            if min_epoch == -1:
                return ckpt
            continue
        parsed = parse_ckpt_name(ckpt.name)
        if parsed:
            epoch = parsed[0]
        else:
            try:
                epoch = int(ckpt.name.replace("epoch=", "").replace(".ckpt", ""))
            except ValueError:
                continue
        if epoch >= min_epoch:
            entries.append((epoch, ckpt))
    entries.sort(key=lambda t: t[0])
    return entries[-1][1] if entries else None


def load_hparams(version_path):
    for name in ("hparams.json", "hparams.yaml"):
        p = Path(version_path, name)
        if p.exists():
            if p.suffix == ".json":
                return json.loads(p.read_text())
            import yaml

            return yaml.safe_load(p.read_text())
    return {}


def _dataset_namespace(test_dataset, path, mirrors_only, exclude_mirrors):
    """Maps a test-dataset tag to (name, dataset args)."""
    if test_dataset.startswith("nyu"):
        ds_type = "labeled"
        if mirrors_only:
            ds_type = "mirror"
        elif exclude_mirrors:
            ds_type = "no_mirror"
        return "nyu", Namespace(path=path, type=ds_type, training=False,
                                validation=False, test=True, n_images=-1)
    if test_dataset == "synthetic":
        return "synthetic", Namespace(path="", training=False, validation=False,
                                      test=True, n_images=16)
    # Floorplan3D variants: noreflection/isotropic -> diffuse, mirror -> mirror
    ds_type = "mirror" if test_dataset == "mirror" else "diffuse"
    return "floorplan3d", Namespace(path=path, type=ds_type, training=False,
                                    validation=False, test=True, n_images=-1)


def test_method(method_name, version_path, test_dataset, path, metrics,
                min_epoch, worker, mirrors_only, exclude_mirrors):
    """(test.py:26-40) -> (result dict, checkpoint path) or (None, None)."""
    import jax

    from mono_depth_estimation_tpu.methods import METHODS
    from mono_depth_estimation_tpu.parallel.mesh import make_mesh
    from mono_depth_estimation_tpu.train.loop import Trainer

    checkpoint = get_checkpoint(version_path, min_epoch)
    if not checkpoint or method_name not in METHODS:
        return None, None
    print(f"Testing {method_name} {Path(version_path).name} "
          f"{checkpoint.name} on {test_dataset}")

    hparams = load_hparams(version_path)
    method_hp = hparams.get("method", hparams)
    method_ns = Namespace(**method_hp) if isinstance(method_hp, dict) else Namespace()
    if not hasattr(method_ns, "name"):
        method_ns.name = method_name
    globals_ns = Namespace(metrics=metrics, worker=worker, ds_name="", depth_method=None)
    method = METHODS[method_name](globals_ns, method_ns)

    ds_name, ds_ns = _dataset_namespace(test_dataset, path, mirrors_only,
                                        exclude_mirrors)
    _, _, test_ds = method.build_datasets([], [], [(ds_name, ds_ns)])

    mesh = make_mesh(n_data=min(1, len(jax.devices())) or 1)
    trainer = Trainer(method, metrics=metrics, run_name="batch_test",
                      worker=worker, mesh=mesh)
    _, _, test_loader = trainer._loaders(None, None, test_ds)
    sample, _ = next(iter(test_loader))
    trainer.setup(sample, restore_ckpt=checkpoint)
    result = trainer.test(test_loader)
    return result, checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True, type=str)
    parser.add_argument("--output", required=True, type=str)
    parser.add_argument(
        "--metrics",
        default=["delta1", "delta2", "delta3", "mse", "mae", "rmse", "rmsle",
                 "log10", "absrel", "sqrel"],
        nargs="+",
    )
    parser.add_argument(
        "--methods",
        default=["bts", "vnl", "laina", "eigen", "midas", "dorn"],
        nargs="+",
    )
    parser.add_argument("--path", required=True, type=str)
    parser.add_argument(
        "--test_dataset", default=["noreflection", "isotropic", "mirror"],
        nargs="+",
    )
    parser.add_argument("--min_epoch", default=1, type=int)
    parser.add_argument("--worker", default=6, type=int)
    parser.add_argument("--mirrors_only", action="store_true")
    parser.add_argument("--exclude_mirrors", action="store_true")
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--exp1", action="store_true")
    parser.add_argument("--exp2", action="store_true")
    args = parser.parse_args(argv)

    if args.exp1:
        args.test_dataset = ["noreflection", "isotropic", "mirror"]
        args.metrics = ["delta1", "log10", "rmse", "absrel", "sqrel"]
        args.methods = ["vnl", "midas", "dorn", "eigen", "laina", "bts"]
    if args.exp2:
        args.test_dataset = ["nyu+exclude_mirrors", "nyu+mirrors_only"]

    results_directory = Path(args.results)
    assert results_directory.exists(), f"{results_directory} does not exist!"
    output_file = Path(args.output).absolute()
    assert output_file.parent.exists()

    with open(output_file, "w") as txt_file:
        txt_file.write(
            "version,epoch,method,loss,aug,train,test,{},\n".format(
                ",".join(args.metrics)
            )
        )
        for method_dir in results_directory.glob("*"):
            if method_dir.name not in args.methods:
                continue
            for version in method_dir.glob("*"):
                for test_dataset in args.test_dataset:
                    mirrors_only = "mirrors_only" in test_dataset
                    exclude = "exclude_mirrors" in test_dataset
                    result, ckpt = test_method(
                        method_dir.name, version, test_dataset.split("+")[0],
                        args.path, args.metrics, args.min_epoch, args.worker,
                        mirrors_only or args.mirrors_only,
                        exclude or args.exclude_mirrors,
                    )
                    if not result:
                        continue
                    hp = load_hparams(version)
                    method_hp = hp.get("method", hp)
                    line = "{},{},{},{},{},{},{},".format(
                        version.name, ckpt.name, method_dir.name,
                        method_hp.get("loss", ""),
                        method_hp.get("data_augmentation", ""),
                        method_hp.get("dataset", ""), test_dataset,
                    )
                    for metric in args.metrics:
                        line += "{},".format(round(result.get(metric, float("nan")), 3))
                    txt_file.write(line + "\n")
    print(f"Wrote {output_file}")


if __name__ == "__main__":
    main()
