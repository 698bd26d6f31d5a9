"""The training/eval loop — the framework's pl.Trainer equivalent.

Semantics mirrored from the reference Trainer config (train.py:132-145):
* validation 5x per epoch (val_check_interval=0.2)
* limit_train_batches / fast_dev_run (--dev) / overfit_batches (--overfit)
* min/max epochs; EarlyStopping(val_loss, min, patience=5) (train.py:124-128)
* best-by-val_loss checkpointing with filename-encoded metrics
* per-method plateau LR scheduling on val_delta1 (mode max)
* bf16 compute when precision==16 (replaces AMP O2 — SURVEY §2.8 item 3)

TPU-first behavior: the step functions are jitted once, batches are padded
to static shapes and sharded over the mesh 'data' axis, metric reduction is
per-sample on device and masked on host, and the input pipeline overlaps
host preprocessing with device compute (the loader prefetches in threads).
"""

from __future__ import annotations

import math
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mono_depth_estimation_tpu.data.loader import Loader
from mono_depth_estimation_tpu.metrics.logger import MetricAccumulator
from mono_depth_estimation_tpu.ops.preproc import (
    UINT8_SAFE_POLICIES,
    cast_targets_host,
    dequantize_images,
    quantize_rgb_u8,
)
from mono_depth_estimation_tpu.parallel.mesh import make_mesh, shard_batch
from mono_depth_estimation_tpu.train.checkpoint import CheckpointManager, scan_best
from mono_depth_estimation_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    set_learning_rate,
)
from mono_depth_estimation_tpu.train.state import TrainState
from mono_depth_estimation_tpu.train.steps import make_metric_step, make_train_step
from mono_depth_estimation_tpu.utils.logging import RunLogger


class Trainer:
    def __init__(
        self,
        method,
        metrics=("delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse"),
        max_epochs: int = 25,
        min_epochs: int = 5,
        val_check_interval: float = 0.2,
        limit_train_batches: float = 1.0,
        fast_dev_run: bool = False,
        overfit_batches: int = 0,
        precision: int = 16,
        remat: bool = False,
        seed: int = 0,
        run_name: str = "run",
        checkpoint_root: str = "checkpoints",
        worker: int = 4,
        eval_batch_size: int | None = None,
        mesh=None,
        logger: RunLogger | None = None,
        save_visualizations: bool = False,
        spatial: int = 1,
        device_aug: bool = False,
        shm_loader: bool = False,
    ):
        self.method = method
        self.metric_names = [m for m in metrics if m != "ssim"] + (
            ["ssim"] if "ssim" in metrics else []
        )
        self.max_epochs = max_epochs
        self.min_epochs = min_epochs
        self.val_check_interval = val_check_interval
        self.limit_train_batches = limit_train_batches
        self.fast_dev_run = fast_dev_run
        self.overfit_batches = overfit_batches
        self.seed = seed
        self.worker = worker
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        # --spatial N: eval batches are placed with the image H axis sharded
        # over 'data' (instead of the batch axis) so GSPMD partitions every
        # conv spatially with halo exchanges — large-image eval
        # (parallel/spatial.py is the spelled-out mechanism + tests)
        self.spatial = spatial
        self.compute_dtype = jnp.bfloat16 if precision == 16 else None
        self.remat = remat
        # --device_aug: train augmentation runs batched on-chip inside the
        # jitted step (ops/device_aug.py); the loader ships raw samples.
        # Single-core hosts cannot feed the chip through cv2 (~37 core-ms
        # per 512^2 sample — bench_extra.json fed_train); val/test keep
        # their PIL-exact transforms either way.
        self.device_aug = device_aug
        # --shm_loader: the whole train-batch producer runs in a separate
        # OS process, batches arrive through a shared-memory ring
        # (data/shm_loader.py) — keeps the single host core with the
        # device runtime's threads (BASELINE.md fed-training wall)
        self.shm_loader = shm_loader
        if device_aug:
            from mono_depth_estimation_tpu.ops.device_aug import (
                DEVICE_AUG_POLICIES,
            )

            if method.POLICY not in DEVICE_AUG_POLICIES:
                raise ValueError(
                    f"--device_aug supports policies "
                    f"{sorted(DEVICE_AUG_POLICIES)}, not {method.POLICY!r}"
                )
        # metrics are per-sample (masked on host), so a bigger eval batch
        # changes nothing numerically — only amortizes dispatch overhead
        # (the reference uses batch_size=1, base_module.py:61-78). Default
        # raised 8 -> 32 per device in round 4: the batch-geometry sweep
        # (BASELINE.md) showed eval throughput rising well past b32 on
        # every model (deep low-spatial stages underfill MXU M-tiles at
        # small batches); _eval_bs clamps to the dataset size so tiny val
        # splits don't pay padding compute
        self.eval_batch_size = eval_batch_size or 32 * self.n_devices
        self.run_name = run_name
        self.ckpt = CheckpointManager(Path(checkpoint_root) / run_name)
        self.logger = logger or RunLogger(Path("runs") / run_name)
        monitor, mode = method.monitor()
        self.plateau = PlateauScheduler(
            mode=mode, factor=0.1, patience=method.lr_patience()
        )
        self.plateau_monitor = monitor
        self.early_stop = EarlyStopping(mode="min", patience=5)

        self.model = None
        self.state = None
        self._train_step = None
        self._val_step = None
        self._test_step = None
        self._viz_fn = None
        self.save_visualizations = save_visualizations
        self._viz_count = 0
        self.optimizer = None
        self.global_step = 0

    # ------------------------------------------------------------ setup
    def _loaders(self, train_ds, val_ds, test_ds):
        train_t, val_t, test_t = self.method.policy_fns()
        if self.method.POLICY in UINT8_SAFE_POLICIES:
            # uint8 across the host->device boundary (ops/preproc.py):
            # lossless for PIL policies, 4x fewer transfer bytes
            train_t, val_t, test_t = (
                quantize_rgb_u8(train_t),
                quantize_rgb_u8(val_t),
                quantize_rgb_u8(test_t),
            )
        if self.device_aug:
            # raw samples out of the loader; the step augments on device.
            # get_raw already yields uint8 rgb, so the u8 transfer path
            # holds without the quantize wrapper. A RawDiskCache-wrapped
            # dataset serves zero-copy mmap views of the concatenated
            # targets (raw_cache.concat_gt) — the host's per-sample work
            # becomes one cast/copy into the batch.
            from mono_depth_estimation_tpu.ops.preproc import raw_collate

            train_t = raw_collate
            for d in ([train_ds] if train_ds is not None else []):
                for leaf in getattr(d, "datasets", [d]):
                    if hasattr(leaf, "concat_gt"):
                        leaf.concat_gt = True
                        if self.compute_dtype is not None:
                            # targets stored pre-cast: epoch cost is a
                            # memcpy of half the bytes
                            leaf.set_gt_dtype(self.compute_dtype)
        if self.compute_dtype is not None:
            # float32 targets travel in the compute dtype (bit-identical to
            # the on-device cast in train/steps._cast_inputs; halves the
            # dominant host->HBM bytes — ops/preproc.cast_targets_host)
            train_t, val_t, test_t = (
                cast_targets_host(train_t, self.compute_dtype),
                cast_targets_host(val_t, self.compute_dtype),
                cast_targets_host(test_t, self.compute_dtype),
            )
        bs = int(self.method.method.batch_size)
        bs = max(self.n_devices, (bs // self.n_devices) * self.n_devices)
        train_loader = (
            Loader(train_ds, bs, shuffle=True, transform=train_t,
                   num_workers=self.worker, seed=self.seed)
            if train_ds is not None
            else None
        )
        if train_loader is not None and self.shm_loader:
            from mono_depth_estimation_tpu.data.shm_loader import ShmLoader

            # the child keeps the loader's own worker/prefetch pipeline —
            # stripping it measured 2-4x slower (bench_fed_train shm)
            train_loader = ShmLoader(train_loader, slots=3, copy=True)
        val_loader = (
            Loader(val_ds, self._eval_bs(val_ds), shuffle=False,
                   transform=val_t, num_workers=self.worker, seed=self.seed)
            if val_ds is not None
            else None
        )
        test_loader = (
            Loader(test_ds, self._eval_bs(test_ds), shuffle=False,
                   transform=test_t, num_workers=self.worker, seed=self.seed)
            if test_ds is not None
            else None
        )
        return train_loader, val_loader, test_loader

    def _eval_bs(self, ds) -> int:
        """Eval batch clamped to the dataset (rounded up to a multiple of
        the mesh) so small val/test splits don't pad to the large default;
        metrics are per-sample masked, so the batch size never changes
        results."""
        n = self.n_devices
        try:
            rounded = ((len(ds) + n - 1) // n) * n
        except TypeError:
            return self.eval_batch_size
        return max(n, min(self.eval_batch_size, rounded))

    def setup(self, sample_batch, restore_ckpt: str | None = None):
        """Initializes model/state and jits the steps. sample_batch is one
        host batch (numpy pytree) used for shape-driven init."""
        rng = jax.random.PRNGKey(self.seed)
        # methods that build mesh-aware models (e.g. DORN's pipelined
        # layer3 under --pipeline_stages) read the mesh off the method
        self.method.mesh = self.mesh
        device_aug_fn = None
        if self.device_aug and isinstance(sample_batch, tuple):
            from mono_depth_estimation_tpu.ops.device_aug import (
                make_device_augment,
            )

            x_raw, y_raw = sample_batch
            src_hw = tuple(x_raw.shape[1:3])
            out_hw = tuple(self.method.output_size())
            device_aug_fn = make_device_augment(
                self.method.POLICY, src_hw, out_hw, self.method.resize()
            )
            # the model sees AUGMENTED (out_hw) shapes — init on those
            sample_batch = (
                np.zeros((x_raw.shape[0], *out_hw, x_raw.shape[-1]),
                         x_raw.dtype),
                np.zeros((y_raw.shape[0], *out_hw, y_raw.shape[-1]),
                         np.float32),
            )
        self.model, variables = self.method.init_variables(rng, sample_batch)
        self.optimizer = self.method.optimizer()
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        rules = self.method.sharding_rules()
        if rules and dict(self.mesh.shape).get("model", 1) > 1:
            # Megatron-shard the method's big Dense heads over the model
            # axis; optimizer.init below inherits the placement via
            # zeros_like, so Adam moments are sharded identically
            from mono_depth_estimation_tpu.parallel.model_sharding import (
                shard_params,
            )

            params = shard_params(params, self.mesh, rules)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
        )
        if restore_ckpt:
            self.state = self.ckpt.restore(restore_ckpt, self.state)
        self._train_step = make_train_step(
            self.method, self.model, self.optimizer, self.compute_dtype,
            remat=self.remat, device_aug=device_aug_fn,
        )
        self._val_step = make_metric_step(
            self.method, self.model, self.metric_names, "val", self.compute_dtype
        )
        self._test_step = make_metric_step(
            self.method, self.model, self.metric_names, "test", self.compute_dtype
        )
        n_params = sum(x.size for x in jax.tree.leaves(params))
        self.logger.log({"n_params": n_params, "n_devices": self.n_devices})
        return self.state

    def _variables(self):
        v = {"params": self.state.params}
        if self.state.batch_stats is not None:
            v["batch_stats"] = self.state.batch_stats
        return v

    def _eval_variables(self):
        """Eval-time variables: under the bf16 policy, weights are stored
        bf16 for the forward pass too (halves weight HBM traffic; +35%
        measured on DORN) — the analogue of the reference's AMP O2 fp16
        weights. Master f32 params are untouched. --precision 32 keeps
        f32 eval."""
        v = self._variables()
        if self.compute_dtype is None:
            return v
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            v,
        )

    # ------------------------------------------------------------ eval
    def _shard_eval_batch(self, batch):
        if self.spatial <= 1:
            return shard_batch(batch, self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self.mesh.shape["data"]
        hshard = NamedSharding(self.mesh, P(None, "data"))
        rep = NamedSharding(self.mesh, P())

        def put(a):
            a = np.asarray(a)
            if a.ndim >= 3 and a.shape[1] % n == 0:
                return jax.device_put(a, hshard)
            return jax.device_put(a, rep)

        return jax.tree.map(put, batch)

    def _run_eval(self, loader, step_fn, split: str):
        acc = MetricAccumulator()
        losses = []
        for batch, mask in loader:
            dbatch = self._shard_eval_batch(batch)
            results, extras = step_fn(self._eval_variables(), dbatch)
            results = jax.device_get(results)
            # one vectorized (sum, count) fold per metric per batch — the
            # per-sample masking stays on host (padding masks are host-side)
            # but the accumulation is O(metrics), not O(batch x metrics)
            acc.update_arrays(
                {name: np.asarray(values)[mask] for name, values in results.items()}
            )
            if "val_loss" in extras:
                losses.append(float(extras["val_loss"]))
            if self.fast_dev_run:
                break
        out = acc.averages()
        if losses:
            out["val_loss"] = float(np.mean(losses))
        return out

    def validate(self, val_loader):
        metrics = self._run_eval(val_loader, self._val_step, "val")
        if self.save_visualizations:
            self._save_visualization(next(iter(val_loader))[0])
        return {f"val_{k}" if not k.startswith("val_") else k: v
                for k, v in metrics.items()}

    def _save_visualization(self, batch, nam: str = "val"):
        """Mosaic/row figure for one host batch — the disk analogue of the
        reference's W&B visualization cadence (val passes AND every
        n_train//9 training batches, modules/base_module.py:85-87,286-301)."""
        from mono_depth_estimation_tpu.viz import save_stdepth_prediction

        if self._viz_fn is None:
            self._viz_fn = jax.jit(
                lambda v, b: (
                    lambda o: (o["y_hat"], o.get("pred_full", o["y_hat"]))
                )(self.method.val_outputs(self.model, v, dequantize_images(b)))
            )
        batch = jax.tree.map(
            lambda x: x.astype(np.float32) / 255.0
            if hasattr(x, "dtype") and x.dtype == np.uint8
            # bf16-compressed targets (cast_targets_host) -> f32 for plotting
            else (x.astype(np.float32)
                  if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x),
            batch,
        )
        dbatch = shard_batch(batch, self.mesh)
        y_hat, pred_full = self._viz_fn(self._variables(), dbatch)
        viz_dir = Path(self.logger.run_dir) / "viz"
        viz_dir.mkdir(parents=True, exist_ok=True)
        save_stdepth_prediction(
            viz_dir / f"{nam}_{self._viz_count:04d}.png",
            batch, np.asarray(y_hat), np.asarray(pred_full),
        )
        self._viz_count += 1

    def maybe_save_train_visualization(self, batch, batch_idx: int,
                                       n_train: int) -> None:
        """Reference cadence: a figure every ``n_train // 9`` training
        batches (modules/base_module.py:85-87) when --save_visualizations."""
        if not self.save_visualizations:
            return
        every = max(1, n_train // 9)
        if batch_idx % every == 0:
            self._save_visualization(batch, nam="train")

    def test(self, test_loader):
        return self._run_eval(test_loader, self._test_step, "test")

    # ------------------------------------------------------------ fit
    def fit(self, train_ds, val_ds, test_ds=None, restore: bool = True):
        train_loader, val_loader, _ = self._loaders(train_ds, val_ds, test_ds)
        assert train_loader is not None and val_loader is not None

        sample_batch, _ = next(iter(train_loader))
        restore_path = None
        if restore:
            best = scan_best(self.ckpt.run_dir)
            if best:
                restore_path = best[0]
                print(f"Resuming from {best[0]} (val_loss={best[2]:.4f})")
        self.setup(sample_batch, restore_ckpt=restore_path)

        n_train = len(train_loader)
        if self.limit_train_batches < 1.0:
            n_train = max(1, int(n_train * self.limit_train_batches))
        elif self.limit_train_batches > 1.0:
            n_train = min(n_train, int(self.limit_train_batches))
        if self.overfit_batches:
            n_train = self.overfit_batches
        val_every = max(1, int(math.ceil(n_train * self.val_check_interval)))

        rng = jax.random.PRNGKey(self.seed + 1)
        stop = False
        overfit_cache = None
        for epoch in range(self.max_epochs):
            epoch_t0 = time.time()
            batch_iter = iter(train_loader)
            for b in range(n_train):
                if self.overfit_batches:
                    if overfit_cache is None:
                        overfit_cache = next(batch_iter)
                    batch, mask = overfit_cache
                else:
                    try:
                        batch, mask = next(batch_iter)
                    except StopIteration:
                        break
                rng, step_rng = jax.random.split(rng)
                dbatch = shard_batch(batch, self.mesh)
                self.state, loss, y_hat, y, logs = self._train_step(
                    self.state, dbatch, step_rng
                )
                self.global_step += 1
                self.maybe_save_train_visualization(batch, b, n_train)
                if self.global_step % 50 == 1 or self.fast_dev_run:
                    payload = {"train_loss": float(loss), "epoch": epoch}
                    payload.update({f"train_{k}": float(v) for k, v in logs.items()})
                    self.logger.log(payload, step=self.global_step)

                run_val = ((b + 1) % val_every == 0) or (b + 1 == n_train)
                if run_val or self.fast_dev_run:
                    val_metrics = self.validate(val_loader)
                    val_loss = val_metrics.get("val_loss", float("nan"))
                    if math.isnan(val_loss) and "val_delta1" in val_metrics:
                        # methods that log no val_loss (e.g. VNL, matching
                        # the reference) still get best-checkpointing via a
                        # -delta1 surrogate (lower = better, like a loss)
                        val_loss = -float(val_metrics["val_delta1"])
                    self.logger.log(val_metrics, step=self.global_step)
                    if not math.isnan(val_loss):
                        saved = self.ckpt.save(self.state, epoch, val_loss)
                        if saved is not None:
                            # reference train.py:100 log_model=True uploads
                            # every improved checkpoint as a W&B artifact
                            self.logger.log_artifact(
                                saved, kind="model",
                                metadata={"epoch": epoch,
                                          "val_loss": val_loss},
                            )
                    mon = val_metrics.get(self.plateau_monitor)
                    if mon is not None and self.plateau.step(float(mon)):
                        base_lr = float(self.method.method.learning_rate)
                        new_lr = self.plateau.lr(base_lr)
                        self.state = self.state.replace(
                            opt_state=set_learning_rate(
                                self.state.opt_state, new_lr
                            )
                        )
                        self.logger.log({"lr": new_lr}, step=self.global_step)
                    if epoch + 1 >= self.min_epochs and not math.isnan(val_loss):
                        if self.early_stop.step(val_loss):
                            print(f"Early stopping at epoch {epoch}")
                            stop = True
                if self.fast_dev_run or stop:
                    break
            self.logger.log(
                {"epoch_time_s": time.time() - epoch_t0, "epoch": epoch},
                step=self.global_step,
            )
            if self.fast_dev_run or stop:
                break
        return self.state
