"""AOT model export for serving (jax.export / StableHLO).

The reference has no deployment story beyond `infer.py` re-running the
Lightning test loop in a full training environment (infer.py:26-66). On
TPU the natural production artifact is an ahead-of-time-lowered program:
`jax.export` serializes the jitted prediction function to versioned
StableHLO that reloads and runs WITHOUT the model code, the method layer,
or a checkpoint directory — only jax and the artifact. That makes the
serving container independent of this framework's Python surface and
freezes the compiled graph against framework drift.

Artifact layout (a directory):
    model.stablehlo   jax.export serialization of predict(variables, x)
    params.msgpack    flax-serialized variables pytree (the weights)
    meta.json         method name, input/output specs, platforms, versions

``predict`` is the method's TEST protocol (`Method.test_outputs`, e.g.
DORN's SID label->depth decode, Eigen's upsample-to-480x640 — the same
math `evaluate.py`/`infer.py` run), with the ground-truth input replaced
by zeros: only `y_hat`/`pred_full` are returned, so XLA dead-code
-eliminates every loss/GT-dependent computation at lowering time.

Inputs may be uint8 (the device-side u8 loader path) or float; the
exported graph dequantizes in-graph (ops/preproc.dequantize_images).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

ARTIFACT_VERSION = 1


def _gt_like(sample_gt, batch_dim):
    """A zeros placeholder with the GT's shape/dtype (traced, not a
    constant — it lowers to one broadcast and is then DCE'd with every
    consumer that doesn't feed y_hat/pred_full). The leading dim follows
    the (possibly symbolic) batch dim of the live input."""
    return jax.tree.map(
        lambda a: jnp.zeros(
            (batch_dim, *np.asarray(a).shape[1:]),
            a.dtype if a.dtype != np.uint8 else jnp.float32,
        ),
        sample_gt,
    )


def make_predict_fn(method, model, sample_batch):
    """predict(variables, x) -> {"y_hat": ..., [\"pred_full\": ...]} using
    the method's test protocol with a zeros GT."""
    from mono_depth_estimation_tpu.ops.preproc import dequantize_images

    if isinstance(sample_batch, dict):
        # dict-batch methods (VNL): the image rides key 'A'
        gt = {k: v for k, v in sample_batch.items() if k != "A"}

        def predict(variables, x):
            batch = dict(_gt_like(gt, x.shape[0]))
            batch["A"] = dequantize_images(x)
            out = method.test_outputs(model, variables, batch)
            keep = {"y_hat": out["y_hat"]}
            if "pred_full" in out:
                keep["pred_full"] = out["pred_full"]
            return keep

        return predict, sample_batch["A"]

    x, y = sample_batch[0], sample_batch[1]

    def predict(variables, x):
        batch = (dequantize_images(x), _gt_like(y, x.shape[0]))
        out = method.test_outputs(model, variables, batch)
        keep = {"y_hat": out["y_hat"]}
        if "pred_full" in out:
            keep["pred_full"] = out["pred_full"]
        return keep

    return predict, x


def export_predict(method, model, variables, sample_batch,
                   platforms=("tpu",), dynamic_batch: bool = False):
    """Lowers predict(variables, x) with jax.export for the given lowering
    platforms ('tpu', 'cpu', 'cuda'; a multi-platform artifact runs on any
    of them). ``dynamic_batch`` exports with a symbolic leading dimension
    so one artifact serves every batch size."""
    from jax import export as jax_export

    predict, x = make_predict_fn(method, model, sample_batch)

    x_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape, np.asarray(a).dtype), x
    )
    if dynamic_batch:
        (b,) = jax_export.symbolic_shape("b")
        x_spec = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct((b, *s.shape[1:]), s.dtype), x_spec
        )
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    return jax_export.export(
        jax.jit(predict), platforms=list(platforms)
    )(var_spec, x_spec)


def save_artifact(out_dir, exported, variables, meta: dict) -> Path:
    from flax import serialization

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "model.stablehlo").write_bytes(exported.serialize())
    (out / "params.msgpack").write_bytes(serialization.to_bytes(variables))
    meta = dict(meta)
    meta.update(
        artifact_version=ARTIFACT_VERSION,
        jax_version=jax.__version__,
        platforms=list(exported.platforms),
        in_avals=[str(a) for a in exported.in_avals],
        out_avals=[str(a) for a in exported.out_avals],
    )
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    return out


def load_artifact(artifact_dir):
    """Returns (predict, variables, meta); ``predict(x)`` runs the exported
    program (weights pre-bound) on the current default platform, which must
    be one of meta['platforms']."""
    from flax import serialization
    from jax import export as jax_export

    d = Path(artifact_dir)
    if d.is_file():  # a bare model.stablehlo path: siblings live next to it
        exported = jax_export.deserialize(d.read_bytes())
        d = d.parent
    else:
        exported = jax_export.deserialize((d / "model.stablehlo").read_bytes())
    variables = serialization.msgpack_restore((d / "params.msgpack").read_bytes())
    meta = json.loads((d / "meta.json").read_text())

    # Run on a platform the artifact was lowered for: the default backend
    # when it qualifies, else the first artifact platform with local devices
    # (e.g. a cpu-only artifact loaded on a TPU machine).
    plats = [p.lower() for p in exported.platforms]
    device = None
    if jax.default_backend() not in plats:
        for p in plats:
            try:
                device = jax.local_devices(backend=p)[0]
                break
            except RuntimeError:
                continue
        else:
            raise ValueError(
                f"artifact platforms {plats} have no local devices "
                f"(default backend: {jax.default_backend()})")

    call = jax.jit(exported.call)

    def predict(x):
        with jax.default_device(device):
            return call(variables, x)

    predict.device = device  # None when the default backend qualifies
    return predict, variables, meta
