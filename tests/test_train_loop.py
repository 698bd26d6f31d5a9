"""End-to-end training loop tests on the fake 8-device CPU mesh."""

import argparse

import jax
import numpy as np
import pytest

from mono_depth_estimation_tpu.data.synthetic import SyntheticDepthDataset
from mono_depth_estimation_tpu.methods.laina import LainaMethod
from mono_depth_estimation_tpu.models.fcrn import FCRN
from mono_depth_estimation_tpu.parallel.mesh import make_mesh
from mono_depth_estimation_tpu.train.loop import Trainer


class TinyLainaMethod(LainaMethod):
    """Laina with a ResNet-18 encoder and small geometry for fast tests."""

    def output_size(self):
        return (64, 96)

    def resize(self):
        return 70

    def build_model(self):
        return FCRN(
            layers=18, decoder="fasterupproj",
            output_size=self.output_size(),
            out_channels=self.method.out_channels,
        )


def _make_method(**over):
    g = argparse.Namespace(metrics=["delta1", "mae", "rmse"], worker=0)
    m = argparse.Namespace(
        name="laina", learning_rate=1e-3, batch_size=8, ckpt=None,
        out_channels=10, loss="mae+composite", variance_focus=0.85,
        depth_loss_weight=10.0, comp_loss_weight=2.0, fbdiv_loss_weight=0.2,
        ssim_loss_weight=2.0, lr_patience=2, decoder="fasterupproj",
    )
    for k, v in over.items():
        setattr(m, k, v)
    return TinyLainaMethod(g, m)


class _StdepthStyleDataset(SyntheticDepthDataset):
    """Synthetic scenes reshaped into the 10-channel stdepth protocol."""

    def get_raw(self, index):
        rgb, depth = super().get_raw(index)
        h, w = depth.shape
        d01 = (depth / depth.max()).astype(np.float32)[..., None]
        alpha = np.ones((h, w, 1), np.float32)
        front = np.concatenate([rgb.astype(np.float32) / 255.0, alpha], -1)
        back = front * 0.5
        gt = [front, back, d01, d01]
        return rgb, gt


@pytest.mark.slow
def test_fit_fast_dev_run(tmp_path):
    import json

    from mono_depth_estimation_tpu.utils.logging import RunLogger

    method = _make_method()
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    train_ds = _StdepthStyleDataset(split="train", n_images=8, image_size=(96, 128))
    val_ds = _StdepthStyleDataset(split="val", n_images=2, image_size=(96, 128))

    trainer = Trainer(
        method,
        metrics=["delta1", "mae", "rmse"],
        fast_dev_run=True,
        precision=32,
        run_name="test_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
        mesh=mesh,
        logger=RunLogger(tmp_path, use_wandb=False),
    )
    state = trainer.fit(train_ds, val_ds)
    assert int(state.step) == 1
    # checkpoint written with val_loss-encoded name
    ckpts = list((tmp_path / "ckpts" / "test_run").glob("epoch=*val_loss=*.ckpt"))
    assert len(ckpts) == 1
    # ... and recorded as a model artifact (reference log_model=True,
    # train.py:100)
    records = [json.loads(l) for l in
               (tmp_path / "metrics.jsonl").read_text().splitlines()]
    arts = [r for r in records if "_artifact" in r]
    assert len(arts) == 1 and arts[0]["_artifact"] == str(ckpts[0])
    assert arts[0]["kind"] == "model" and "val_loss" in arts[0]


@pytest.mark.slow
def test_fit_bf16_precision_compresses_targets(tmp_path):
    """--precision 16: the loaders ship bf16 targets (cast_targets_host) and
    the fit still runs end-to-end; what the step consumes is bit-identical
    to the f32-shipped path (the step casts to bf16 on device either way)."""
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.utils.logging import RunLogger

    method = _make_method()
    train_ds = _StdepthStyleDataset(split="train", n_images=8,
                                    image_size=(96, 128))
    val_ds = _StdepthStyleDataset(split="val", n_images=2,
                                  image_size=(96, 128))
    trainer = Trainer(
        method,
        metrics=["mae"],
        fast_dev_run=True,
        precision=16,
        run_name="bf16_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
        logger=RunLogger(tmp_path, use_wandb=False),
    )
    train_loader, val_loader, _ = trainer._loaders(train_ds, val_ds, None)
    batch, _ = next(iter(train_loader))
    x, y = batch
    assert y.dtype == jnp.bfloat16  # targets compressed on host
    assert x.dtype == np.uint8     # rgb stays u8 (laina is UINT8_SAFE)
    # one train step + one metric step through the bf16-shipped batch
    # (cheaper than a full fit; the f32 fit path is test_fit_fast_dev_run)
    from mono_depth_estimation_tpu.parallel.mesh import shard_batch

    trainer.setup(batch)
    dbatch = shard_batch(batch, trainer.mesh)
    trainer.state, loss, *_ = trainer._train_step(trainer.state, dbatch,
                                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    vbatch, _ = next(iter(val_loader))
    results, extras = trainer._val_step(trainer._eval_variables(),
                                        shard_batch(vbatch, trainer.mesh))
    assert np.isfinite(float(extras["val_loss"]))


def test_log_artifact_jsonl(tmp_path):
    import json

    from mono_depth_estimation_tpu.utils.logging import RunLogger

    logger = RunLogger(tmp_path, use_wandb=False)
    logger.log_artifact(tmp_path / "x.ckpt", metadata={"epoch": 3,
                                                       "val_loss": 0.5})
    logger.close()
    (rec,) = [json.loads(l) for l in
              (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rec["_artifact"].endswith("x.ckpt")
    assert rec["kind"] == "model" and rec["epoch"] == 3.0


@pytest.mark.slow
def test_lr_find_sweeps_fresh_batches(tmp_path):
    """The Lightning-style LR finder: fresh batch per step, EMA smoothing,
    divergence stop, gradient suggestion inside the swept range."""
    from mono_depth_estimation_tpu.cli.train import lr_find

    method = _make_method(loss="mae")
    train_ds = _StdepthStyleDataset(split="train", n_images=16, image_size=(96, 128))
    val_ds = _StdepthStyleDataset(split="val", n_images=2, image_size=(96, 128))
    trainer = Trainer(
        method,
        metrics=["mae"],
        precision=32,
        run_name="lrfind_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
    )
    trainer.logger.run_dir = tmp_path
    suggested = lr_find(trainer, train_ds, val_ds, num_steps=12)
    assert 1e-8 < suggested < 1.0


@pytest.mark.slow
def test_overfit_reduces_loss(tmp_path):
    method = _make_method(loss="mae")
    train_ds = _StdepthStyleDataset(split="train", n_images=8, image_size=(96, 128))
    val_ds = _StdepthStyleDataset(split="val", n_images=1, image_size=(96, 128))
    trainer = Trainer(
        method,
        metrics=["mae"],
        max_epochs=1,
        min_epochs=1,
        overfit_batches=1,
        limit_train_batches=8,
        val_check_interval=1.0,
        precision=32,
        run_name="overfit_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
    )
    train_loader, _, _ = trainer._loaders(train_ds, None, None)
    batch, _ = next(iter(train_loader))
    trainer.setup(batch)
    rng = jax.random.PRNGKey(0)
    from mono_depth_estimation_tpu.parallel.mesh import shard_batch

    dbatch = shard_batch(batch, trainer.mesh)
    losses = []
    for i in range(8):
        rng, sr = jax.random.split(rng)
        trainer.state, loss, *_ = trainer._train_step(trainer.state, dbatch, sr)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
