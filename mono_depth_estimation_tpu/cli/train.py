"""train CLI (parity: /root/reference/train.py:56-172).

Keeps the reference behaviors: VALIDATE-prefixed run names trigger a
validation pass before fit (train.py:78-82,168-169), checkpoint auto-resume
by scanning the run's checkpoint dir (train.py:117-121), early stopping on
val_loss with patience 5 (train.py:124-128), val_check_interval=0.2 and
min/max epochs (train.py:132-145), seed management (train.py:96-98), and
hyperparameter logging. The LR finder performs a short exponential sweep
(the Lightning tuner equivalent, train.py:160-166).
"""

from __future__ import annotations

import jax

from mono_depth_estimation_tpu.cli.common import (
    build_mesh,
    build_parser,
    derive_globals,
    maybe_init_distributed,
    parse_args_into_namespaces,
    seed_everything,
)
from mono_depth_estimation_tpu.methods import get_method
from mono_depth_estimation_tpu.train.loop import Trainer


def lr_find(trainer, train_ds, val_ds, num_steps: int = 100,
            beta: float = 0.98, diverge_factor: float = 4.0):
    """Exponential LR sweep on FRESH training batches — the Lightning tuner
    algorithm (train.py:160-166 of the reference): one optimizer step per
    batch at an exponentially increasing lr, an EMA-smoothed loss curve,
    early stop when the smoothed loss exceeds ``diverge_factor`` x its best,
    and the suggestion is the lr at the steepest negative gradient of the
    smoothed curve (Lightning's default 'gradient' suggestion)."""
    import numpy as np

    from mono_depth_estimation_tpu.parallel.mesh import shard_batch
    from mono_depth_estimation_tpu.train.optim import set_learning_rate

    train_loader, _, _ = trainer._loaders(train_ds, val_ds, None)
    batch_iter = iter(train_loader)
    first_batch, _ = next(batch_iter)
    trainer.setup(first_batch)
    lrs = np.logspace(-7, -1, num_steps)
    losses, smoothed = [], []
    ema, best = 0.0, float("inf")
    rng = jax.random.PRNGKey(0)
    batch = first_batch
    for i, lr in enumerate(lrs):
        trainer.state = trainer.state.replace(
            opt_state=set_learning_rate(trainer.state.opt_state, float(lr))
        )
        rng, sr = jax.random.split(rng)
        dbatch = shard_batch(batch, trainer.mesh)
        trainer.state, loss, *_ = trainer._train_step(trainer.state, dbatch, sr)
        loss = float(loss)
        if not np.isfinite(loss):
            break
        losses.append(loss)
        ema = beta * ema + (1.0 - beta) * loss
        corrected = ema / (1.0 - beta ** (i + 1))
        smoothed.append(corrected)
        best = min(best, corrected)
        if corrected > diverge_factor * best:
            break
        try:  # a fresh batch per step, cycling the loader if it runs dry
            batch, _ = next(batch_iter)
        except StopIteration:
            batch_iter = iter(train_loader)
            batch, _ = next(batch_iter)
    smoothed = np.asarray(smoothed)
    if len(smoothed) < 3:
        return float(trainer.method.method.learning_rate)
    grad = np.gradient(smoothed)
    return float(lrs[int(np.argmin(grad))])


def main(argv=None):
    parser, commands = build_parser("Trains mono depth estimation models")
    args = parse_args_into_namespaces(parser, commands, argv)

    name = args.globals.name or "run"
    validate_only_prefix = name.startswith("VALIDATE")
    if not validate_only_prefix:
        assert args.training and args.validation, (
            "Please provide data training AND validation dataset"
        )
    derive_globals(args)

    if args.globals.detect_anomaly:
        print("Enabling nan debugging")
        jax.config.update("jax_debug_nans", True)

    maybe_init_distributed(args)
    args.globals.seed = seed_everything(args.globals.seed)

    ckpt_name = name.replace("VALIDATE", "") if validate_only_prefix else name
    mesh = build_mesh(args.globals)

    method = get_method(args)
    trainer = Trainer(
        method,
        metrics=args.globals.metrics,
        max_epochs=args.globals.max_epochs,
        min_epochs=args.globals.min_epochs,
        val_check_interval=0.2,
        limit_train_batches=getattr(args.globals, "max_train_batches", 1.0),
        fast_dev_run=args.globals.dev,
        overfit_batches=1 if args.globals.overfit else 0,
        precision=args.globals.precision,
        remat=getattr(args.globals, "remat", False),
        save_visualizations=getattr(args.globals, "save_visualizations", False),
        seed=args.globals.seed,
        run_name=ckpt_name,
        worker=args.globals.worker,
        mesh=mesh,
        spatial=getattr(args.globals, "spatial", 1),
        device_aug=getattr(args.globals, "device_aug", False),
        shm_loader=getattr(args.globals, "shm_loader", False),
    )
    trainer.logger.log_hparams(
        {
            "globals": vars(args.globals),
            "method": vars(args.method),
            "random_seed": args.globals.seed,
            "devices": [str(d) for d in jax.devices()],
        }
    )

    train_ds, val_ds, test_ds = method.build_datasets(
        args.training, args.validation, args.test
    )

    if args.globals.find_learning_rate:
        suggested = lr_find(trainer, train_ds, val_ds)
        print("Old learning rate: ", args.method.learning_rate)
        args.method.learning_rate = suggested
        print("Suggested learning rate: ", args.method.learning_rate)
        return args

    if validate_only_prefix:
        train_loader, val_loader, _ = trainer._loaders(train_ds, val_ds, None)
        sample, _ = next(iter(val_loader))
        from mono_depth_estimation_tpu.train.checkpoint import scan_best

        best = scan_best(trainer.ckpt.run_dir)
        trainer.setup(sample, restore_ckpt=best[0] if best else None)
        metrics = trainer.validate(val_loader)
        for k, v in sorted(metrics.items()):
            print(k, round(v, 3))

    trainer.fit(train_ds, val_ds, test_ds)
    if args.test:
        _, _, test_loader = trainer._loaders(None, None, test_ds)
        results = trainer.test(test_loader)
        for k, v in sorted(results.items()):
            print(f"{k}_epoch", round(v, 3))
    return args


if __name__ == "__main__":
    main()
