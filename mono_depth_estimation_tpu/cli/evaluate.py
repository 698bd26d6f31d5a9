"""evaluate CLI (parity: /root/reference/evaluate.py).

Runs the method's test protocol on the --test dataset(s) and prints each
``<metric>_epoch`` aggregate as ``<metric>: <value>`` rounded to 3 — the
reference's stdout contract (evaluate.py:34-36).
"""

from __future__ import annotations

import jax

from mono_depth_estimation_tpu.cli.common import (
    build_mesh,
    build_parser,
    derive_globals,
    parse_args_into_namespaces,
)
from mono_depth_estimation_tpu.methods import get_method
from mono_depth_estimation_tpu.train.loop import Trainer


def run_test(args, write_predictions=False):
    derive_globals(args)
    method = get_method(args)
    mesh = build_mesh(args.globals)
    trainer = Trainer(
        method,
        metrics=args.globals.metrics,
        precision=getattr(args.globals, "precision", 16),
        run_name=args.globals.name or "eval",
        worker=args.globals.worker,
        mesh=mesh,
        spatial=getattr(args.globals, "spatial", 1),
    )
    _, _, test_ds = method.build_datasets([], [], args.test)
    _, _, test_loader = trainer._loaders(None, None, test_ds)
    sample, _ = next(iter(test_loader))
    trainer.setup(sample, restore_ckpt=getattr(args.method, "ckpt", None))
    results = trainer.test(test_loader)
    return trainer, results


def main(argv=None):
    parser, commands = build_parser("Evaluates mono depth estimation models")
    args = parse_args_into_namespaces(parser, commands, argv)
    assert args.test, "Please provide test dataset"
    # evaluate.py defaults: no ssim in the metric list (evaluate.py:11)
    _, results = run_test(args)
    for key, value in sorted(results.items()):
        print("{}: {}".format(key, round(value, 3)))
    return results


if __name__ == "__main__":
    main()
