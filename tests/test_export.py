"""AOT serving-artifact export (utils/export_artifact.py, tools/export_model.py).

The reference has no deployment surface beyond re-running the Lightning
test loop (infer.py:26-66); the exported StableHLO artifact is our
TPU-native serving path, so it must (a) round-trip exactly, (b) support a
symbolic batch dimension, and (c) work end-to-end through the CLI with a
real method + checkpoint restore + the standalone predictor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.utils.export_artifact import (
    export_predict,
    load_artifact,
    make_predict_fn,
    save_artifact,
)


class _ToyModel(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(1, (3, 3), padding="SAME")(x)


class _ToyMethod:
    """Minimal Method surface consumed by make_predict_fn."""

    def test_outputs(self, model, variables, batch):
        x, y = batch
        y_hat = model.apply(variables, x, train=False)
        # a GT-dependent term that must be dead-code-eliminated at export
        loss = jnp.mean((y_hat - y) ** 2)
        return {"pairs": [("", y_hat, y)], "y_hat": y_hat, "loss": loss}


def test_export_roundtrip_and_dynamic_batch(tmp_path):
    method, model = _ToyMethod(), _ToyModel()
    x = np.random.default_rng(0).uniform(size=(2, 16, 24, 3)).astype(np.float32)
    y = np.zeros((2, 16, 24, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    exported = export_predict(method, model, variables, (x, y),
                              platforms=("cpu",), dynamic_batch=True)
    out = save_artifact(tmp_path / "art", exported, variables,
                        {"method": "toy", "input_shape": list(x.shape),
                         "input_dtype": "float32"})
    predict, loaded_vars, meta = load_artifact(out)
    assert meta["method"] == "toy" and meta["platforms"] == ["cpu"]

    # a bare model.stablehlo path resolves siblings from its directory
    predict_f, _, meta_f = load_artifact(out / "model.stablehlo")
    assert meta_f["method"] == "toy"

    want = model.apply(variables, jnp.asarray(x), train=False)
    got = predict(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got["y_hat"]), np.asarray(want),
                               atol=1e-6)
    # symbolic batch: the same artifact serves batch 5
    x5 = np.random.default_rng(1).uniform(size=(5, 16, 24, 3)).astype(np.float32)
    got5 = predict(jnp.asarray(x5))
    want5 = model.apply(variables, jnp.asarray(x5), train=False)
    np.testing.assert_allclose(np.asarray(got5["y_hat"]), np.asarray(want5),
                               atol=1e-6)


def test_export_accepts_uint8_input(tmp_path):
    """u8 loader-path inputs dequantize in-graph (ops/preproc semantics)."""
    method, model = _ToyMethod(), _ToyModel()
    xu8 = np.random.default_rng(0).integers(0, 256, (1, 8, 8, 3)).astype(np.uint8)
    y = np.zeros((1, 8, 8, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xu8, jnp.float32))
    exported = export_predict(method, model, variables, (xu8, y),
                              platforms=("cpu",))
    out = save_artifact(tmp_path / "a8", exported, variables, {})
    predict, _, _ = load_artifact(out)
    got = predict(jnp.asarray(xu8))
    want = model.apply(variables, jnp.asarray(xu8, jnp.float32) / 255.0,
                       train=False)
    np.testing.assert_allclose(np.asarray(got["y_hat"]), np.asarray(want),
                               atol=1e-6)


def test_predict_fn_returns_only_serving_outputs():
    method, model = _ToyMethod(), _ToyModel()
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = np.zeros((1, 8, 8, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    predict, _ = make_predict_fn(method, model, (x, y))
    out = predict(variables, jnp.asarray(x))
    assert set(out) == {"y_hat"}  # loss/pairs dropped -> DCE'd when lowered


@pytest.mark.xslow
def test_export_cli_selftest_and_standalone_predict(tmp_path, monkeypatch,
                                                    capsys):
    """Full lifecycle: train a ckpt -> export (restore + selftest) ->
    standalone predict on image/npy inputs."""
    monkeypatch.chdir(tmp_path)
    from mono_depth_estimation_tpu.cli.train import main as train_main

    common = ["--worker", "0", "--precision", "32", "--metrics", "delta1"]
    data = ["synthetic", "--n_images", "4", "--image_size", "120", "160"]
    train_main(["--name", "exp", "--max_epochs", "1", "--min_epochs", "1",
                *common, *data, "--training", "--validation",
                "eigen", "--batch_size", "4", "--pretrained", "0"])
    ckpts = sorted((tmp_path / "checkpoints/exp").glob("*.ckpt"))
    assert ckpts

    from tools.export_model import main as export_main

    art = export_main(["--name", "exp", *common,
                       "--out", str(tmp_path / "art"), "--platforms", "cpu",
                       "--selftest", "--batch", "2",
                       *data, "--test",
                       "eigen", "--batch_size", "2", "--pretrained", "0",
                       "--ckpt", str(ckpts[-1])])
    out = capsys.readouterr().out
    assert "Selftest OK" in out
    assert (art / "model.stablehlo").exists()

    # standalone predictor: a png and an npy through the artifact
    from PIL import Image

    meta_shape = (art / "meta.json").read_text()
    import json as _json

    shape = _json.loads(meta_shape)["input_shape"]
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (60, 90, 3), np.uint8)
    ).save(inputs / "a.png")
    np.save(inputs / "b.npy",
            np.random.default_rng(1).uniform(size=shape[1:]).astype(np.float32))

    from tools.predict import main as predict_main

    predict_main(["--artifact", str(art), "--inputs", str(inputs),
                  "--out", str(tmp_path / "preds")])
    preds = sorted((tmp_path / "preds").glob("pred_*.npy"))
    assert len(preds) == 2
    for p in preds:
        assert np.isfinite(np.load(p)).all()
    assert len(sorted((tmp_path / "preds").glob("pred_*.png"))) == 2
