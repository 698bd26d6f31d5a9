#!/usr/bin/env python
"""PyTorch checkpoint -> Flax variables converter (CLI).

The conversion core lives in mono_depth_estimation_tpu/utils/torch_convert.py
(see its docstring for the tensor-kind rules). This front-end converts

* full models:     --method bts --ckpt lightning.ckpt --out bts.msgpack
* encoders only:   --encoder dorn_sceneparsing --ckpt resnet101.pth \
                       --out weights/dorn_sceneparsing.msgpack

Encoder-only outputs are what ``--pretrained 1`` resolves at train time
(train/pretrained.py) — the local stand-in for the reference's weight
downloads (network/Dorn.py:179-228, network/FCRN.py:297-347, etc.).
ImageNet classifier heads the encoder lacks are dropped via --skip-prefixes
(default: 'fc.' 'classifier.').
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mono_depth_estimation_tpu.utils.torch_convert import (  # noqa: E402,F401
    REORDERERS,
    classify_flax_leaf,
    convert_sequential,
    convert_tensor,
    load_torch_state_dict,
    reorder_vnl_keys,
)


def build_encoder(name: str):
    """Encoder template model + a representative input shape for init."""
    from mono_depth_estimation_tpu.models.encoders.densenet import (
        DENSENET_PRESETS,
        DenseNetEncoder,
    )
    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )

    if name == "dorn_sceneparsing":
        return ResNetEncoder(config=RESNET_PRESETS["dorn_resnet101"])
    if name in RESNET_PRESETS:
        return ResNetEncoder(config=RESNET_PRESETS[name])
    if name in DENSENET_PRESETS:
        return DenseNetEncoder(config=DENSENET_PRESETS[name])
    if name == "vgg19_bn":
        from mono_depth_estimation_tpu.models.encoders.vgg import VGG19BNFeatures

        return VGG19BNFeatures()
    raise SystemExit(
        f"unknown encoder '{name}'; known: dorn_sceneparsing, vgg19_bn, "
        f"{sorted(RESNET_PRESETS)}, {sorted(DENSENET_PRESETS)}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch .ckpt/.pth file")
    tgt = ap.add_mutually_exclusive_group(required=True)
    tgt.add_argument("--method", help="full-model method name (bts, ...)")
    tgt.add_argument("--encoder", help="encoder-only preset "
                                       "(dorn_sceneparsing, resnet50, "
                                       "densenet161, vgg19_bn, ...)")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--reorder", choices=list(REORDERERS), default=None,
                    help="architecture-specific key reordering (e.g. vnl)")
    ap.add_argument("--skip-prefixes", nargs="*",
                    default=["fc.", "classifier."],
                    help="torch keys to drop (classifier heads the target "
                         "model lacks)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    jax.config.update("jax_platforms", "cpu")

    if args.method:
        from mono_depth_estimation_tpu.models import MODELS

        model = MODELS[args.method]()
    else:
        model = build_encoder(args.encoder)

    x = jnp.ones((1, args.height, args.width, 3), jnp.float32)
    # NOTE: init must stay EAGER — jit canonicalizes (sorts) dict keys in
    # its output pytree, which destroys the module-creation order the
    # sequential alignment relies on.
    template = model.init(jax.random.PRNGKey(0), x, train=False)
    sd = load_torch_state_dict(args.ckpt, skip_prefixes=tuple(args.skip_prefixes))
    if args.reorder:
        sd = REORDERERS[args.reorder](sd)
    variables = convert_sequential(sd, template)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.to_bytes(variables))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
