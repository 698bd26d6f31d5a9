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


@pytest.mark.xslow
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


@pytest.mark.xslow
def test_fit_device_aug_end_to_end(tmp_path):
    """--device_aug: loaders ship RAW samples (u8 rgb at source size, f32
    gt), the jitted step augments on-chip (ops/device_aug.py), the model
    inits and trains at the method's output geometry, and a full
    fast-dev-run fit (train + val + checkpoint) completes."""
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
        device_aug=True,
        run_name="device_aug_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
        logger=RunLogger(tmp_path, use_wandb=False),
    )
    train_loader, _, _ = trainer._loaders(train_ds, val_ds, None)
    batch, _ = next(iter(train_loader))
    x, y = batch
    assert x.shape[1:] == (96, 128, 3) and x.dtype == np.uint8  # raw ship
    assert y.shape[1:] == (96, 128, 10) and y.dtype == jnp.bfloat16
    state = trainer.fit(train_ds, val_ds)
    assert int(state.step) == 1
    # the step really augmented: model params exist at output geometry
    # (64x96), i.e. init consumed the synthesized out_hw batch
    assert trainer.model.output_size == (64, 96)


@pytest.mark.slow
def test_fit_shm_loader_end_to_end(tmp_path):
    """--shm_loader: the train producer runs in its own OS process
    (data/shm_loader.py) and a fast-dev-run fit (train + val + checkpoint)
    completes with the producer isolated."""
    from mono_depth_estimation_tpu.data.shm_loader import ShmLoader
    from mono_depth_estimation_tpu.utils.logging import RunLogger

    method = _make_method()
    train_ds = _StdepthStyleDataset(split="train", n_images=8,
                                    image_size=(64, 96))
    val_ds = _StdepthStyleDataset(split="val", n_images=2,
                                  image_size=(64, 96))
    trainer = Trainer(
        method,
        metrics=["mae"],
        fast_dev_run=True,
        precision=16,
        shm_loader=True,
        run_name="shm_run",
        checkpoint_root=str(tmp_path / "ckpts"),
        worker=0,
        logger=RunLogger(tmp_path, use_wandb=False),
    )
    train_loader, _, _ = trainer._loaders(train_ds, val_ds, None)
    assert isinstance(train_loader, ShmLoader)
    state = trainer.fit(train_ds, val_ds)
    assert int(state.step) == 1


def test_device_aug_rejects_unsupported_policy():
    method = _make_method()
    method.POLICY = "dorn"
    with pytest.raises(ValueError, match="device_aug supports"):
        Trainer(method, metrics=["mae"], device_aug=True, worker=0)


def test_fused_train_step_matches_sequential():
    """make_fused_train_step(K): one dispatch scanning K batches must
    produce the same TrainState as K make_train_step calls with the same
    per-step keys (dispatch amortization cannot change the math)."""
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import (
        make_fused_train_step,
        make_train_step,
    )

    method = _make_method(batch_size=4)
    rng = np.random.default_rng(0)
    batches = [
        (rng.random((4, 64, 96, 3), np.float32),
         rng.random((4, 64, 96, 10), np.float32))
        for _ in range(2)
    ]
    model, variables = method.init_variables(jax.random.PRNGKey(0), batches[0])
    # SGD, not Adam: Adam's first-step update is +-lr*sign(g-hat), so
    # f32 reduction-order noise on near-zero grad components flips whole
    # updates between the scan-compiled and standalone-compiled bodies —
    # sign amplification, not a fusion bug. SGD keeps the comparison at
    # true float tolerance.
    import optax

    opt = optax.sgd(1e-3)

    def fresh_state():
        # deep-copy: both steps donate their TrainState, which deletes
        # the donated buffers — the two runs must not share arrays
        params = jax.tree.map(jnp.array, variables["params"])
        bs = variables.get("batch_stats")
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.array, bs) if bs else None,
            opt_state=opt.init(params),
        )

    key = jax.random.PRNGKey(7)
    fused = make_fused_train_step(method, model, opt, k=2)
    kbatch = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    st_f, losses, *_ = fused(fresh_state(), kbatch, key)
    assert losses.shape == (2,)

    step = make_train_step(method, model, opt)
    st_s = fresh_state()
    seq_losses = []
    for b, k in zip(batches, jax.random.split(key, 2)):
        st_s, loss, *_ = step(st_s, b, k)
        seq_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    assert int(st_f.step) == int(st_s.step) == 2
    for pf, ps in zip(jax.tree.leaves(st_f.params),
                      jax.tree.leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(pf, np.float32),
                                   np.asarray(ps, np.float32),
                                   atol=1e-6, rtol=1e-5)


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


@pytest.mark.xslow
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
