"""Ablation profiler for the three zoo models VERDICT r2 flagged as
"neither compute- nor bandwidth-bound" (Eigen 38.5% MFU/31% BW, FCRN
32.2%/57%, MyNet 23.1%/51%): times SUB-GRAPHS of each model with the same
steady-state in-graph-scan harness bench.py uses, so the idle time can be
attributed to a stage instead of guessed.

Round 4 added the last two close-outs (VERDICT r3 task #4): vnl (ASPP /
topdown decoder / full-res 150-bin head + the resize stage whose bf16
fast path bought +15%) and midas (ResNeXt-101-WSL backbone vs scratch
projections + 4 fusion blocks + head).

Usage:  python tools/profile_zoo.py [eigen fcrn mynet vnl midas]
Writes: profile_zoo.json {model: {stage: {ms_per_batch, mfu, bw_util}}}
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

import bench  # _roofline_from_cost, _bf16_params


def steady_ms(fn, variables, in_shape, batch):
    """Overhead-free ms/batch for fn(variables, x): in-graph scan over
    distinct batches (base + per-step random scalar — fresh inputs defeat
    XLA loop-invariant hoisting and the tunnel's (program, inputs)
    memoization at O(1) harness cost), timed with bench._slope_time so the
    constant ~26 ms per-dispatch tunnel cost cancels. The round-2 version's
    full-tensor in-graph RNG *and* single-n timing both inflated small
    stages (see tools/calibrate_harness.py)."""

    def make_run(n):
        def run(variables, base, key):
            def body(carry, k):
                x = base + jax.random.uniform(k, (), jnp.bfloat16)
                out = fn(variables, x)
                tot = sum(
                    o.astype(jnp.float32).sum()
                    for o in jax.tree_util.tree_leaves(out)
                )
                return carry + tot, None

            total, _ = jax.lax.scan(
                body, jnp.float32(0), jax.random.split(key, n)
            )
            return total

        return run

    base = jax.random.uniform(
        jax.random.PRNGKey(0), (batch, *in_shape), jnp.bfloat16
    )
    dt, compiled, _ = bench._slope_time(make_run, (variables, base))
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    return {
        "ms_per_batch": round(dt * 1e3, 3),
        "images_per_sec": round(batch / dt, 1),
        "mfu": round(roof["mfu"], 4),
        "bw_util": round(roof["bw_util"], 4),
        "bytes_gb": round(roof["bytes_gb"], 3),
    }


def steady_ms_multi(fn, variables, in_shapes, batch):
    """steady_ms for stages with SEVERAL inputs (decoder-only stages fed by
    fixed encoder taps): one base per shape, same per-step scalar added to
    each (fresh inputs, O(1) harness cost), slope-timed."""

    def make_run(n):
        def run(variables, bases, key):
            def body(carry, k):
                c = jax.random.uniform(k, (), jnp.bfloat16)
                out = fn(variables, *[b + c for b in bases])
                tot = sum(
                    o.astype(jnp.float32).sum()
                    for o in jax.tree_util.tree_leaves(out)
                )
                return carry + tot, None

            total, _ = jax.lax.scan(
                body, jnp.float32(0), jax.random.split(key, n)
            )
            return total

        return run

    bases = tuple(
        jax.random.uniform(jax.random.PRNGKey(i), (batch, *s), jnp.bfloat16)
        for i, s in enumerate(in_shapes)
    )
    dt, compiled, _ = bench._slope_time(make_run, (variables, bases))
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    return {
        "ms_per_batch": round(dt * 1e3, 3),
        "images_per_sec": round(batch / dt, 1),
        "mfu": round(roof["mfu"], 4),
        "bw_util": round(roof["bw_util"], 4),
        "bytes_gb": round(roof["bytes_gb"], 3),
    }


def profile_eigen(batch=32):
    from mono_depth_estimation_tpu.models.eigen import (
        Eigen,
        EigenScale1,
        EigenScale2,
        EigenScale3,
    )
    from mono_depth_estimation_tpu.models.encoders.vgg import VGG19BNFeatures

    size = (240, 320)
    model = Eigen()
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*size, 3), batch
    )

    # stage taps: run the model's own submodules with sliced variables
    s1_vars = {"params": variables["params"]["EigenScale1_0"]}
    if "batch_stats" in variables:
        s1_vars["batch_stats"] = variables["batch_stats"]["EigenScale1_0"]
    s1 = EigenScale1()
    out["scale1_vgg_fc_deconv"] = steady_ms(
        lambda v, x: s1.apply(v, x, train=False), s1_vars, (*size, 3), batch
    )

    vgg = VGG19BNFeatures()
    vgg_vars = {"params": s1_vars["params"]["VGG19BNFeatures_0"]}
    if "batch_stats" in s1_vars:
        vgg_vars["batch_stats"] = s1_vars["batch_stats"]["VGG19BNFeatures_0"]
    out["vgg_features_only"] = steady_ms(
        lambda v, x: vgg.apply(v, x, train=False), vgg_vars, (*size, 3), batch
    )

    # scale2+scale3 with a fixed coarse input
    s2, s3 = EigenScale2(), EigenScale3()
    s2_vars = {"params": variables["params"]["EigenScale2_0"]}
    s3_vars = {"params": variables["params"]["EigenScale3_0"]}

    def tail(v, x):
        coarse = jnp.ones((x.shape[0], 55, 75, 64), x.dtype)
        mid = s2.apply(v["s2"], x, coarse, train=False)
        return s3.apply(v["s3"], x, mid, train=False)

    out["scale2_scale3"] = steady_ms(
        tail, {"s2": s2_vars, "s3": s3_vars}, (*size, 3), batch
    )
    return out


def profile_fcrn(batch=32):
    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )
    from mono_depth_estimation_tpu.models.fcrn import FCRN

    size = (240, 320)
    model = FCRN(layers=50, decoder="upproj", output_size=(120, 160),
                 out_channels=1)
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*size, 3), batch
    )

    enc = ResNetEncoder(config=RESNET_PRESETS["resnet50"])
    enc_vars = {"params": variables["params"]["ResNetEncoder_0"]}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]["ResNetEncoder_0"]
    out["encoder_only"] = steady_ms(
        lambda v, x: enc.apply(v, x, train=False)[-1], enc_vars, (*size, 3),
        batch,
    )
    # prefix ablation: summing only feats[i] dead-code-eliminates everything
    # after tap i, so tap_i - tap_{i-1} prices each ResNet stage
    n_taps = len(enc.apply(
        enc_vars, jnp.ones((1, *size, 3), jnp.bfloat16), train=False
    ))
    for i in range(n_taps):
        out[f"encoder_to_tap{i}"] = steady_ms(
            lambda v, x, i=i: enc.apply(v, x, train=False)[i],
            enc_vars, (*size, 3), batch,
        )

    # decoder cost = full - encoder_only: with the slope protocol the
    # constant dispatch cost cancels, so the subtraction is meaningful.
    return out


def profile_mynet(batch=16):
    from mono_depth_estimation_tpu.models.bts import BTS_ENCODERS
    from mono_depth_estimation_tpu.models.encoders.densenet import (
        DENSENET_PRESETS,
        DenseNetEncoder,
    )
    from mono_depth_estimation_tpu.models.mynet import MyModel

    size = (384, 384)
    model = MyModel(input_size=size)
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*size, 3), batch
    )

    _, name = BTS_ENCODERS["densenet161_bts"]
    enc = DenseNetEncoder(config=DENSENET_PRESETS[name])
    enc_vars = {"params": variables["params"]["DenseNetEncoder_0"]}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]["DenseNetEncoder_0"]
    out["encoder_only"] = steady_ms(
        lambda v, x: [f.sum() for f in enc.apply(v, x, train=False)],
        enc_vars, (*size, 3), batch,
    )
    for i in range(5):
        out[f"encoder_to_tap{i}"] = steady_ms(
            lambda v, x, i=i: enc.apply(v, x, train=False)[i],
            enc_vars, (*size, 3), batch,
        )

    # the Weighter's NHWC->NCHW transpose+Dense is a suspect: time it alone
    # on the three (B, 192, 192, 64) branch maps
    from mono_depth_estimation_tpu.models.mynet import Weighter

    wt = Weighter(size)
    wt_vars = {"params": variables["params"]["Weighter_0"]}
    if "batch_stats" in variables:
        wt_vars["batch_stats"] = variables["batch_stats"]["Weighter_0"]

    def weighter_only(v, x):
        # x: (B, 192, 192, 64); reuse it as all three branches
        return wt.apply(v, (x, x, x), train=False)

    out["weighter_only"] = steady_ms(
        weighter_only, wt_vars, (size[0] // 2, size[1] // 2, 64), batch
    )
    return out


def profile_vnl(batch=16):
    """VNL (the last zoo model without a documented roofline bound:
    205.5 img/s at 37.3% MFU / 53% BW). Suspect: the decoder tail runs at
    HALF and FULL 385x385 resolution (fcn_last_block + the dilated 3x3
    256->150 predict head, VNL.py:317-327,376-388)."""
    from flax import linen as nn

    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )
    from mono_depth_estimation_tpu.models.vnl import (
        VNL_ENCODERS,
        Conv,
        FTBBlock,
        MetricDepthModel,
    )
    from mono_depth_estimation_tpu.ops.resize import resize_bilinear

    size = (385, 385)
    model = MetricDepthModel(crop_size=size)
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*size, 3),
        batch,
    )

    _, preset = VNL_ENCODERS[model.encoder]
    enc = ResNetEncoder(config=RESNET_PRESETS[preset])
    enc_vars = {"params": variables["params"]["ResNetEncoder_0"]}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]["ResNetEncoder_0"]
    n_taps = len(enc.apply(
        enc_vars, jnp.ones((1, *size, 3), jnp.bfloat16), train=False
    ))
    for i in range(n_taps):
        out[f"encoder_to_tap{i}"] = steady_ms(
            lambda v, x, i=i: enc.apply(v, x, train=False)[i],
            enc_vars, (*size, 3), batch,
        )

    # Full/half-resolution tail as fresh-init modules (timing only — conv
    # speed does not depend on weight values): FTB @193, resize to 385,
    # dilated predict head + softmax, exactly the model's last four ops.
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, t, train=False):
            t = FTBBlock(256)(t, train=train)
            t = resize_bilinear(t, size, align_corners=True)
            logit = Conv(150, kernel=3, dilation=2, use_bias=True)(t)
            return logit, jax.nn.softmax(logit, axis=-1)

    tail = Tail()
    half = (193, 193, 256)
    tail_vars = bench._bf16_params(
        jax.jit(lambda r, x: tail.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.ones((1, *half))
        )
    )
    out["fullres_tail"] = steady_ms(
        lambda v, x: tail.apply(v, x, train=False), tail_vars, half, batch
    )

    # ASPP alone (res5 -> 5-branch dilated pyramid, VNL.py:260-285) and the
    # COMPLETE post-encoder decoder (ASPP + FTB laterals + 4 FCN topdown +
    # fcn_last_block + 150-bin head, VNL.py:539-669) on fixed taps — so
    # full = encoder_to_tap4 + decoder_only and every stage is attributed
    # (VERDICT r3 task #4). Fresh-init params: conv timing is
    # weight-value-independent.
    from mono_depth_estimation_tpu.models.common import BatchNorm
    from mono_depth_estimation_tpu.models.vnl import (
        ASPPBlock,
        FCNTopdownBlock,
    )

    res5 = (25, 25, 2048)  # 385/16, dilated layer4 (stride-16 body)
    aspp = ASPPBlock(512, (2, 4, 6))
    aspp_vars = bench._bf16_params(
        jax.jit(lambda r, x: aspp.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.ones((1, *res5))
        )
    )
    out["aspp_only"] = steady_ms(
        lambda v, x: aspp.apply(v, x, train=False), aspp_vars, res5, batch
    )

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, res2, res3, res4, res5, train=False):
            top = ASPPBlock(512, (2, 4, 6))(res5, train=train)
            laterals = [top]
            for dim, tap in zip((512, 256, 256, 256),
                                (res5, res4, res3, res2)):
                laterals.append(FTBBlock(dim)(tap, train=train))
            t = Conv(512, kernel=1)(laterals[0])
            t = BatchNorm(epsilon=0.5)(t, train=train)
            for i in range(4):
                t = FCNTopdownBlock(256)(laterals[i + 1], t, train=train)
            t = resize_bilinear(t, (193, 193), align_corners=True)
            t = FTBBlock(256)(t, train=train)
            t = resize_bilinear(t, size, align_corners=True)
            logit = Conv(150, kernel=3, dilation=2, use_bias=True)(t)
            return logit, jax.nn.softmax(logit, axis=-1)

    dec = Decoder()
    tap_shapes = [(97, 97, 256), (49, 49, 512), (25, 25, 1024), res5]
    dec_vars = bench._bf16_params(
        jax.jit(lambda r, *xs: dec.init(r, *xs, train=False))(
            jax.random.PRNGKey(0),
            *[jnp.ones((1, *s)) for s in tap_shapes],
        )
    )
    out["decoder_only"] = steady_ms_multi(
        lambda v, *xs: dec.apply(v, *xs, train=False), dec_vars, tap_shapes,
        batch,
    )

    # the tail's three ops separately, so its 44%-MFU mix is attributed:
    # dilated 3x3 256->150 head + softmax at full 385 res, the FTB at 193,
    # and the bare align-corners resize 193->385
    head = Conv(150, kernel=3, dilation=2, use_bias=True)
    head_vars = bench._bf16_params(
        jax.jit(lambda r, x: head.init(r, x))(
            jax.random.PRNGKey(0), jnp.ones((1, 385, 385, 256))
        )
    )
    out["head_conv_softmax_only"] = steady_ms(
        lambda v, x: jax.nn.softmax(head.apply(v, x), axis=-1), head_vars,
        (385, 385, 256), batch,
    )
    ftb = FTBBlock(256)
    ftb_vars = bench._bf16_params(
        jax.jit(lambda r, x: ftb.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.ones((1, 193, 193, 256))
        )
    )
    out["ftb193_only"] = steady_ms(
        lambda v, x: ftb.apply(v, x, train=False), ftb_vars,
        (193, 193, 256), batch,
    )
    out["resize193to385_only"] = steady_ms(
        lambda v, x: resize_bilinear(x, size, align_corners=True), {},
        (193, 193, 256), batch,
    )
    return out


def profile_midas(batch=16):
    """MiDaS (222.9 img/s at 24.8% MFU / 80% BW — bandwidth-bound but never
    stage-attributed; VERDICT r3 task #4): ResNeXt101-WSL backbone vs the
    scratch projections + 4 FeatureFusionBlocks + head
    (/root/reference/network/MiDaS.py:114-229)."""
    from flax import linen as nn_  # local alias; nn imported below

    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )
    from mono_depth_estimation_tpu.models.midas import (
        FeatureFusionBlock,
        MidasNet,
    )
    from mono_depth_estimation_tpu.models.common import Conv as MConv
    from mono_depth_estimation_tpu.ops.resize import resize_bilinear

    size = (384, 384)
    model = MidasNet()
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    out = {}
    out["full"] = steady_ms(
        lambda v, x: model.apply(v, x, train=False), variables, (*size, 3),
        batch,
    )

    enc = ResNetEncoder(config=RESNET_PRESETS["resnext101_wsl"])
    enc_vars = {"params": variables["params"]["ResNetEncoder_0"]}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]["ResNetEncoder_0"]
    n_taps = len(enc.apply(
        enc_vars, jnp.ones((1, *size, 3), jnp.bfloat16), train=False
    ))
    for i in range(n_taps):
        out[f"encoder_to_tap{i}"] = steady_ms(
            lambda v, x, i=i: enc.apply(v, x, train=False)[i],
            enc_vars, (*size, 3), batch,
        )

    # decoder on fixed taps: scratch 3x3 projections + 4 fusions + head
    # (full = encoder_to_tap4 + decoder_only); plus the fusion path and the
    # full-res head alone, so the decoder splits into its two halves
    class Decoder(nn_.Module):
        @nn_.compact
        def __call__(self, l1, l2, l3, l4):
            rn = [MConv(256, kernel=3)(t) for t in (l1, l2, l3, l4)]
            path = FeatureFusionBlock(256)(rn[3])
            path = FeatureFusionBlock(256)(path, rn[2])
            path = FeatureFusionBlock(256)(path, rn[1])
            path = FeatureFusionBlock(256)(path, rn[0])
            h = MConv(128, kernel=3, use_bias=True)(path)
            h = resize_bilinear(h, size, align_corners=False)
            h = MConv(32, kernel=3, use_bias=True)(h)
            h = nn_.relu(h)
            h = MConv(7, kernel=1, use_bias=True)(h)
            return nn_.sigmoid(h)

    tap_shapes = [(96, 96, 256), (48, 48, 512), (24, 24, 1024),
                  (12, 12, 2048)]
    dec = Decoder()
    dec_vars = bench._bf16_params(
        jax.jit(lambda r, *xs: dec.init(r, *xs))(
            jax.random.PRNGKey(0), *[jnp.ones((1, *s)) for s in tap_shapes]
        )
    )
    out["decoder_only"] = steady_ms_multi(
        lambda v, *xs: dec.apply(v, *xs), dec_vars, tap_shapes, batch
    )

    class Head(nn_.Module):
        @nn_.compact
        def __call__(self, path):
            h = MConv(128, kernel=3, use_bias=True)(path)
            h = resize_bilinear(h, size, align_corners=False)
            h = MConv(32, kernel=3, use_bias=True)(h)
            h = nn_.relu(h)
            h = MConv(7, kernel=1, use_bias=True)(h)
            return nn_.sigmoid(h)

    head = Head()
    head_in = (192, 192, 256)
    head_vars = bench._bf16_params(
        jax.jit(lambda r, x: head.init(r, x))(
            jax.random.PRNGKey(0), jnp.ones((1, *head_in))
        )
    )
    out["head_only"] = steady_ms(
        lambda v, x: head.apply(v, x), head_vars, head_in, batch
    )
    return out


def main():
    which = sys.argv[1:] or ["eigen", "fcrn", "mynet", "vnl", "midas"]
    res = {}
    for name in which:
        fn = {"eigen": profile_eigen,
              "fcrn": profile_fcrn, "mynet": profile_mynet,
              "vnl": profile_vnl, "midas": profile_midas}[name]
        try:
            res[name] = fn()
        except Exception as e:
            res[name] = {"error": str(e)[:300]}
        print(name, json.dumps(res[name], indent=1), flush=True)
    record = Path(__file__).parent.parent / "profile_zoo.json"
    if record.exists():  # merge: a partial rerun keeps the other models
        merged = json.loads(record.read_text())
        # only merge SUCCESSFUL entries: a failed partial rerun must not
        # overwrite a previously good measurement (ADVICE r3 #3)
        for name, entry in res.items():
            if "error" not in entry or name not in merged:
                merged[name] = entry
        res = merged
    record.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
