"""End-to-end CLI driver round-trip on the fake 8-device CPU mesh.

Drives the three public entry points the reference exposes beyond train.py
through one real checkpoint lifecycle (reference call stacks SURVEY.md
§3.1-3.4): ``cli.train`` fits Eigen on the synthetic dataset and writes a
best-by-val_loss checkpoint (train.py:106-121 semantics), ``cli.infer``
restores it and writes pred_XXXX.npz + png (infer.py:46-63), and
``cli.test`` sweeps the results/<method>/<version> tree into the CSV
contract (test.py:96-113).
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

COMMON = ["--worker", "0", "--precision", "32", "--metrics", "delta1",
          "mae", "rmse"]
# small source scenes + 4-image splits: the lifecycle being proven is
# method-agnostic CLI plumbing, and Eigen's 240x320 geometry is fixed, so
# the only CPU-cost knobs are the GT resolution and the image count
DATA = ["synthetic", "--n_images", "4", "--image_size", "120", "160"]
METHOD = ["eigen", "--batch_size", "4", "--pretrained", "0"]


@pytest.mark.xslow
def test_cli_train_infer_batchtest_roundtrip(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)

    # --- train: one epoch, synthetic data, random-init Eigen -------------
    from mono_depth_estimation_tpu.cli.train import main as train_main

    train_main(["--name", "clidrv", "--max_epochs", "1", "--min_epochs", "1",
                *COMMON, *DATA, "--training", "--validation", "--test",
                *METHOD])
    out = capsys.readouterr().out
    assert "val_delta1" in out or "delta1_epoch" in out, out

    ckpts = sorted(Path("checkpoints/clidrv").glob("*.ckpt"))
    assert ckpts, "train CLI wrote no checkpoint"
    assert "val_loss=" in ckpts[-1].name  # filename-encoded monitor value
    hparams = json.loads(Path("runs/clidrv/hparams.json").read_text())
    assert hparams["method"]["name"] == "eigen"

    # --- infer: restore the checkpoint, write predictions ----------------
    from mono_depth_estimation_tpu.cli.infer import main as infer_main

    infer_main(["--name", "clidrv", *COMMON, *DATA, "--test",
                *METHOD, "--ckpt", str(ckpts[-1])])
    out = capsys.readouterr().out
    pred_dir = Path("predictions/clidrv")
    preds = sorted(pred_dir.glob("pred_*.npz"))
    assert preds, f"infer wrote nothing to {pred_dir}: {out}"
    with np.load(preds[0]) as z:
        assert np.isfinite(z["prediction"]).all()
    assert sorted(pred_dir.glob("pred_*.png")), "no visualization written"
    # same stdout contract as cli.evaluate: '<metric>: <value>' lines
    assert "delta1:" in out and "rmse:" in out, out

    # --- batch-test: sweep a results tree into the CSV contract ----------
    from mono_depth_estimation_tpu.cli.test import main as test_main

    version_dir = Path("results/eigen/version_0")
    version_dir.mkdir(parents=True)
    shutil.copytree("checkpoints/clidrv", version_dir / "checkpoints")
    shutil.copy("runs/clidrv/hparams.json", version_dir / "hparams.json")

    test_main(["--results", "results", "--output", "sweep.csv",
               "--path", "", "--methods", "eigen",
               "--test_dataset", "synthetic", "--min_epoch", "0",
               "--worker", "0", "--metrics", "delta1", "mae", "rmse"])
    rows = Path("sweep.csv").read_text().strip().splitlines()
    assert rows[0] == "version,epoch,method,loss,aug,train,test,delta1,mae,rmse,"
    assert len(rows) == 2, rows
    cells = rows[1].split(",")
    assert cells[0] == "version_0" and cells[2] == "eigen"
    assert all(np.isfinite(float(v)) for v in cells[7:10]), rows[1]
