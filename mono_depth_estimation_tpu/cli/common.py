"""Shared CLI plumbing: the chained-subcommand argv grammar.

Verbatim-compatible with the reference parser (train.py:11-54): argv is
split at known command names; dataset commands are tagged into
training/validation/test role lists via their --training/--validation/--test
flags; the method command lands in args.method. Derived globals ds_name and
depth_method follow train.py:84-85.
"""

from __future__ import annotations

import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace

from mono_depth_estimation_tpu.data import NAME2FUNC
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
from mono_depth_estimation_tpu.methods import METHODS, register_module_specific_arguments

DATASET_COMMANDS = list(NAME2FUNC)
METHOD_COMMANDS = list(METHODS)


def register_dataset_specific_arguments(subparsers):
    from mono_depth_estimation_tpu.data import (
        Floorplan3DDataset,
        NYUDataset,
        SemiTransparentDepthDataset,
        SemiTransparentMulti2DepthDataset,
        SemiTransparentMultiDepthDataset,
        Structured3DDataset,
        SyntheticDepthDataset,
    )

    for ds in (
        NYUDataset,
        Floorplan3DDataset,
        Structured3DDataset,
        SemiTransparentDepthDataset,
        SemiTransparentMultiDepthDataset,
        SemiTransparentMulti2DepthDataset,
        SyntheticDepthDataset,
    ):
        ds.add_dataset_specific_args(subparsers)


def build_parser(description: str) -> tuple[ArgumentParser, object]:
    parser = ArgumentParser(description, formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("--seed", default=None, type=int, help="Random Seed")
    parser.add_argument("--name", default=None, help="Name of the run")
    parser.add_argument(
        "--precision", default=16, type=int,
        help="16 = bf16 compute (TPU-native mixed precision), 32 = float32",
    )
    parser.add_argument(
        "--gpus", type=int, default=1,
        help="Accelerator count (reference flag name; maps to mesh width; "
        "0 = CPU)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="model-axis width of the 2-D ('data','model') mesh; >1 shards "
        "the method's large Dense heads Megatron-style "
        "(parallel/model_sharding.py) — Eigen's VGG FC pair and DORN's "
        "FullImageEncoder FC",
    )
    parser.add_argument(
        "--pipeline_stages", type=int, default=1,
        help="GPipe-pipeline the homogeneous tail of the encoder's deepest "
        "stage over the mesh model axis at EVAL time (DORN: the 22 "
        "identical dilated layer3 blocks; parallel/pipeline.py). >1 lays "
        "the stages out on a (gpus/S, S) mesh; must divide the tail "
        "block count (22 -> 2, 11 or 22)",
    )
    parser.add_argument(
        "--spatial", type=int, default=1,
        help="shard the image H axis over N devices at EVAL time for "
        "images too large for one chip's HBM (GSPMD inserts the conv halo "
        "exchanges; parallel/spatial.py). H must be divisible by N",
    )
    parser.add_argument(
        "--device_aug", action="store_true",
        help="run the TRAIN augmentation batched on-chip inside the jitted "
        "step (ops/device_aug.py: the whole geometric chain as one affine "
        "gather; loaders ship raw cached samples). The fix for hosts whose "
        "CPUs cannot feed the chip through cv2; val/test transforms stay "
        "PIL-exact. Supported policies: bts, default, laina, my",
    )
    parser.add_argument(
        "--shm_loader", action="store_true",
        help="isolate the train-batch producer (decode + aug + collation) "
        "in its own OS process, shipping ready batches through a "
        "shared-memory ring (data/shm_loader.py). The fix for single-core "
        "hosts where the in-process producer contends with the device "
        "runtime's threads",
    )
    parser.add_argument("--dev", action="store_true", help="Fast dev run")
    parser.add_argument("--overfit", action="store_true", help="Overfit 1 batch")
    parser.add_argument("--min_epochs", default=5, type=int)
    parser.add_argument("--max_epochs", default=25, type=int)
    parser.add_argument("--max-train-batches", default=1.0, type=float)
    parser.add_argument(
        "--metrics",
        default=["delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse", "ssim"],
        nargs="+",
    )
    parser.add_argument("--worker", default=8, type=int)
    parser.add_argument(
        "--no_raw_cache", action="store_true",
        help="Disable the decode-once raw-sample disk cache "
        "(data/raw_cache.py). Default on for file-backed datasets: "
        "torch.load of a torchvtk sample costs ~94 ms and holds the GIL, "
        "which caps the fed train loop at ~10 img/s vs the 87 img/s device "
        "step (bench_extra.json fed_train)",
    )
    parser.add_argument("--find_learning_rate", action="store_true")
    parser.add_argument(
        "--save_visualizations", action="store_true",
        help="write val-mosaic figures to runs/<name>/viz (the reference's "
        "W&B visualization cadence, to disk)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize the forward in backward (trade FLOPs for HBM)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() for multi-host (DCN) meshes; "
        "coordinator/process env via standard JAX variables",
    )
    parser.add_argument(
        "--detect_anomaly", action="store_true",
        help="Enables jax_debug_nans (the XLA analogue of torch anomaly "
        "detection)",
    )
    commands = parser.add_subparsers(title="Commands")
    register_dataset_specific_arguments(commands)
    register_module_specific_arguments(commands)
    return parser, commands


def parse_args_into_namespaces(parser, commands, argv=None):
    """Splits argv at command names into per-command namespaces
    (reference train.py:11-54)."""
    argv = list(sys.argv[1:] if argv is None else argv)

    split_argv = [[]]
    for c in argv:
        if c in commands.choices:
            split_argv.append([c])
        else:
            split_argv[-1].append(c)

    args = Namespace()
    args_parsed = parser.parse_args(split_argv.pop(0))
    setattr(args, "globals", args_parsed)

    train_datasets, val_datasets, test_datasets = [], [], []
    while len(split_argv):
        cmd, *args_raw = split_argv.pop(0)
        assert cmd[0].isalpha(), "Command must start with a letter."
        args_parsed = commands.choices[cmd].parse_args(args_raw, namespace=Namespace())
        if cmd in DATASET_COMMANDS:
            if args_parsed.training:
                train_datasets.append((cmd, args_parsed))
            if args_parsed.validation:
                val_datasets.append((cmd, args_parsed))
            if args_parsed.test:
                test_datasets.append((cmd, args_parsed))
        else:
            setattr(
                args, "method" if cmd in METHOD_COMMANDS else cmd, args_parsed
            )
    setattr(args, "training", train_datasets)
    setattr(args, "validation", val_datasets)
    setattr(args, "test", test_datasets)
    assert hasattr(args, "method"), (
        "Please provide the method you want to use: "
        + ", ".join(METHOD_COMMANDS)
    )
    return args


def derive_globals(args):
    """args.ds_name / args.depth_method (reference train.py:84-85)."""
    source = args.validation or args.test or args.training
    if source:
        ns = source[0][1]
        args.ds_name = getattr(ns, "path", "").split("/")[-1]
        args.depth_method = getattr(ns, "depth_method", None)
    else:
        args.ds_name, args.depth_method = "", None
    # expose on globals so methods can reach them
    args.globals.ds_name = args.ds_name
    args.globals.depth_method = args.depth_method
    args.globals.metrics = list(args.globals.metrics)
    return args


def build_mesh(globals_ns):
    """('data','model') mesh from the global flags — the model axis hosts
    either Megatron tensor parallelism (--model_parallel) or the GPipe
    pipeline (--pipeline_stages); clear errors instead of silently dropped
    devices (mesh width must divide --gpus)."""
    import jax

    from mono_depth_estimation_tpu.parallel.mesh import make_mesh

    n_dev = globals_ns.gpus if getattr(globals_ns, "gpus", 1) > 0 else 1
    n_dev = min(n_dev, len(jax.devices()))
    mp = max(1, getattr(globals_ns, "model_parallel", 1))
    pp = max(1, getattr(globals_ns, "pipeline_stages", 1))
    assert mp == 1 or pp == 1, (
        "--model_parallel and --pipeline_stages both claim the mesh model "
        "axis; use one"
    )
    n_model = max(mp, pp)
    assert n_model <= n_dev, (
        f"model-axis width {n_model} exceeds the available device count {n_dev}"
    )
    assert n_dev % n_model == 0, (
        f"--gpus {n_dev} must be divisible by the model-axis width {n_model} "
        f"(the 2-D mesh would silently drop {n_dev % n_model} devices)"
    )
    return make_mesh(n_data=n_dev // n_model, n_model=n_model)


def maybe_init_distributed(args) -> None:
    """Multi-host initialization (SURVEY §2.8 item 1: DCN via
    jax.distributed.initialize + identical mesh construction).

    On a managed cluster (Slurm/MPI/GKE) bare ``initialize()`` auto-detects
    the topology. For manual launches — the analogue of the reference's
    Lightning DDP env:// rendezvous — the standard JAX env triplet
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    is passed through explicitly (this jax version only reads the address
    from the environment by itself). Exercised end-to-end by
    tests/test_distributed.py on two CPU processes."""
    import os

    if getattr(args.globals, "distributed", False) or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        import jax

        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if num is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
                num_processes=int(num),
                process_id=int(pid),
            )
        else:
            jax.distributed.initialize()


def seed_everything(seed: int | None) -> int:
    import random

    import numpy as np

    if seed is None:
        seed = random.randrange(4294967295)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed
