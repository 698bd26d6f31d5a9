"""Export a trained method as a standalone AOT serving artifact.

The TPU-native deployment path the reference lacks (its `infer.py` re-runs
the full Lightning test loop in a training environment): this serializes
the jitted prediction function — the method's exact test protocol
(`evaluate.py`/`infer.py` math) — to versioned StableHLO plus a weights
msgpack. The artifact reloads and serves with jax alone; no model code, no
method layer, no checkpoint tree (utils/export_artifact.py).

Same chained argv grammar as the other drivers. A --test dataset supplies
the input/GT specs (and the selftest batch); without one, --input-size /
--in-channels / --gt-size synthesize them.

    python tools/export_model.py --name run1 --out artifacts/bts \
        --platforms tpu cpu --selftest synthetic --n_images 2 --test \
        bts --ckpt checkpoints/run1/epoch=3-val_loss=0.012345.ckpt

    python tools/predict.py --artifact artifacts/bts --inputs imgs/ --out preds/
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.cli.common import (
    build_parser,
    derive_globals,
    parse_args_into_namespaces,
)
from mono_depth_estimation_tpu.methods import get_method
from mono_depth_estimation_tpu.utils.export_artifact import (
    export_predict,
    load_artifact,
    save_artifact,
)


def _sample_batch(args):
    """One host batch: from the --test dataset when given, else synthesized
    from the shape flags (tuple-batch methods only)."""
    if args.test:
        method = get_method(args)
        _, _, test_ds = method.build_datasets([], [], args.test)
        from mono_depth_estimation_tpu.data.loader import Loader
        from mono_depth_estimation_tpu.ops.preproc import (
            UINT8_SAFE_POLICIES,
            quantize_rgb_u8,
        )

        _, _, test_t = method.policy_fns()
        if method.POLICY in UINT8_SAFE_POLICIES:
            test_t = quantize_rgb_u8(test_t)  # u8 serving inputs (loop.py)
        loader = Loader(test_ds, args.globals.batch, transform=test_t,
                        num_workers=0)
        batch, _ = next(iter(loader))
        return method, batch
    method = get_method(args)
    b = args.globals.batch
    h, w = args.globals.input_size
    gh, gw, gc = args.globals.gt_size
    x = np.zeros((b, h, w, args.globals.in_channels), np.float32)
    y = np.zeros((b, gh or h, gw or w, gc), np.float32)
    return method, (x, y)


def main(argv=None):
    parser, commands = build_parser("Exports a method as an AOT serving artifact")
    parser.add_argument("--out", required=True, help="Artifact directory")
    parser.add_argument("--platforms", nargs="+", default=["tpu"],
                        choices=["tpu", "cpu", "cuda"],
                        help="Lowering platforms baked into the artifact")
    parser.add_argument("--dynamic-batch", action="store_true",
                        help="Symbolic leading dim: one artifact, any batch")
    parser.add_argument("--selftest", action="store_true",
                        help="Reload the artifact and check it against the "
                        "live model on the sample batch")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--input-size", type=int, nargs=2, default=(480, 640))
    parser.add_argument("--in-channels", type=int, default=3)
    parser.add_argument("--gt-size", type=int, nargs=3, default=(0, 0, 1),
                        metavar=("H", "W", "C"),
                        help="GT spec when no --test dataset (0 0 -> input size)")
    args = parse_args_into_namespaces(parser, commands, argv)
    derive_globals(args)

    method, batch = _sample_batch(args)
    model, variables = method.init_variables(jax.random.PRNGKey(0), batch)

    ckpt = getattr(args.method, "ckpt", None)
    if ckpt:
        # restore through a full TrainState template (the on-disk layout)
        from mono_depth_estimation_tpu.train.checkpoint import restore_variables
        from mono_depth_estimation_tpu.train.state import TrainState

        optimizer = method.optimizer()
        template = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            opt_state=optimizer.init(variables["params"]),
        )
        state = restore_variables(ckpt, template)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats

    if args.globals.precision == 16:
        # the eval bf16-weights policy (train/loop.Trainer._eval_variables)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )

    exported = export_predict(
        method, model, variables, batch,
        platforms=args.globals.platforms,
        dynamic_batch=args.globals.dynamic_batch,
    )
    x_sample = batch["A"] if isinstance(batch, dict) else batch[0]
    out = save_artifact(args.globals.out, exported, variables, {
        "method": args.method.name if hasattr(args.method, "name")
        else type(method).__name__,
        "ckpt": str(ckpt) if ckpt else None,
        "precision": args.globals.precision,
        "input_shape": list(np.asarray(x_sample).shape),
        "input_dtype": str(np.asarray(x_sample).dtype),
        "dynamic_batch": bool(args.globals.dynamic_batch),
    })
    blob = (out / "model.stablehlo").stat().st_size
    print(f"Exported {out} (stablehlo {blob/1e6:.2f} MB, "
          f"platforms {list(exported.platforms)})")

    if args.globals.selftest:
        predict, _, _ = load_artifact(out)
        x = batch["A"] if isinstance(batch, dict) else batch[0]
        got = predict(jnp.asarray(x))
        from mono_depth_estimation_tpu.utils.export_artifact import make_predict_fn

        ref_fn, _ = make_predict_fn(method, model, batch)
        # same platform as the artifact ran on, else cross-platform f32
        # noise (TPU matmuls vs CPU) dominates the comparison
        with jax.default_device(predict.device):
            want = jax.jit(ref_fn)(variables, jnp.asarray(x))
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
                atol=1e-5, rtol=1e-5)
        print(f"Selftest OK: artifact == live model on {k!r}")
    return out


if __name__ == "__main__":
    main()
