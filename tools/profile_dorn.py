"""Stage-ablation profile of the headline DORN model (bench.py's metric).

Same slope-timed protocol as tools/profile_zoo.py. Stages:
  full          — whole model (label+prob), reference eval geometry
  encoder_tapN  — ResNet-101 dilated backbone prefix (dead-code-eliminated
                  suffix), tap4 = the 2048-ch 33x45 feature the scene
                  module consumes
  scene_only    — SceneUnderstandingModule on a fixed backbone feature
  head_only     — ordinal decode on fixed full-res logits, SHIPPED halves
                  layout (the resize lives in scene_only's tail)
  head_only_interleaved — same decode on the pre-fix interleaved layout,
                  kept so the 'head 5.6 -> 0.8 ms' claim in BASELINE.md
                  stays reproducible (ADVICE r3 #1)
Also sweeps the headline batch size under the corrected protocol (the
round-2 sweep's b16 sweet spot carried a 26/n ms dispatch floor).

Usage: python tools/profile_dorn.py [stages sweep]
Writes: profile_dorn.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import bench
from tools.profile_zoo import steady_ms

SIZE = (257, 353)


def build(batch):
    from mono_depth_estimation_tpu.models.dorn import DORN

    model = DORN(ord_num=68, input_size=SIZE)
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *SIZE, 3)))
    )
    return model, variables


def profile_stages(batch=16):
    from mono_depth_estimation_tpu.models.dorn import (
        SceneUnderstandingModule,
        ordinal_regression,
    )
    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )

    model, variables = build(batch)
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*SIZE, 3),
        batch,
    )

    def subvars(name):
        v = {"params": variables["params"][name]}
        bs = variables.get("batch_stats", {})
        if name in bs:  # the scene module's ASPP is conv+relu, no BN
            v["batch_stats"] = bs[name]
        return v

    enc = ResNetEncoder(config=RESNET_PRESETS["dorn_resnet101"])
    enc_vars = subvars("ResNetEncoder_0")
    n_taps = len(enc.apply(
        enc_vars, jnp.ones((1, *SIZE, 3), jnp.bfloat16), train=False
    ))
    for i in range(n_taps):
        out[f"encoder_to_tap{i}"] = steady_ms(
            lambda v, x, i=i: enc.apply(v, x, train=False)[i],
            enc_vars, (*SIZE, 3), batch,
        )

    scene = SceneUnderstandingModule(ord_num=68, size=SIZE)
    sc_vars = subvars("SceneUnderstandingModule_0")
    feat_shape = (SIZE[0] // 8 + 1, SIZE[1] // 8 + 1, 2048)  # 33x45x2048
    out["scene_only"] = steady_ms(
        lambda v, x: scene.apply(v, x, train=False), sc_vars, feat_shape,
        batch,
    )

    out["head_only"] = steady_ms(
        lambda v, x: ordinal_regression(x, interleaved=False), {},
        (*SIZE, 136), batch,
    )
    out["head_only_interleaved"] = steady_ms(
        lambda v, x: ordinal_regression(x, interleaved=True), {},
        (*SIZE, 136), batch,
    )
    return out


def sweep_batch():
    out = {}
    for b in (8, 16, 32):
        ips, roof = bench.bench_jax_dorn_steady(batch=b, with_roofline=True)
        out[f"b{b}"] = {"images_per_sec": round(ips, 1),
                        "mfu": round(roof["mfu"], 4),
                        "bw_util": round(roof["bw_util"], 4)}
        print(f"b{b}", out[f"b{b}"], flush=True)
    return out


def main():
    which = sys.argv[1:] or ["stages", "sweep"]
    res = {}
    for name in which:
        fn = {"stages": profile_stages, "sweep": sweep_batch}[name]
        try:
            res[name] = fn()
        except Exception as e:
            res[name] = {"error": str(e)[:300]}
        print(name, json.dumps(res[name], indent=1), flush=True)
    Path(__file__).parent.parent.joinpath("profile_dorn.json").write_text(
        json.dumps(res, indent=1)
    )


if __name__ == "__main__":
    main()
