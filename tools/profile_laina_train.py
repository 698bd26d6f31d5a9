"""Ablation profiler for the laina/FCRN TRAIN step anomaly.

bench_extra.json zoo_train: laina 240x320 b16 trains at 35.9 img/s with
MFU 1.95%, while its eval runs 1937 img/s (b32, MFU 33.8%). A train step
is ~3x the forward FLOPs, so ~600 img/s is the expected order — the step
is ~16x slower than its own roofline. This script times gradient
sub-graphs with the same in-graph-scan protocol as bench.py to attribute
the idle time to a stage (encoder bwd, decoder bwd, head, loss).

Usage:  python tools/profile_laina_train.py
Writes: profile_laina.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench  # _roofline_from_cost

BATCH = 16
SIZE = (240, 320)


def steady_grad_ms(loss_fn, variables, in_shape, batch=BATCH, n=3):
    """Median ms/batch for value_and_grad(loss_fn) over n in-graph random
    batches (bench._steady_train_method protocol, minus the optimizer)."""

    def run(variables, key):
        def body(carry, k):
            x = jax.random.uniform(k, (batch, *in_shape), jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(variables, x)
            gsum = sum(
                g.astype(jnp.float32).sum()
                for g in jax.tree_util.tree_leaves(grads)
            )
            return carry + loss + gsum, None

        total, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, n))
        return total

    compiled = jax.jit(run).lower(variables, jax.random.PRNGKey(1)).compile()
    _ = np.asarray(compiled(variables, jax.random.PRNGKey(1)))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(compiled(variables, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    return {
        "ms_per_batch": round(dt * 1e3, 3),
        "images_per_sec": round(batch / dt, 1),
        "mfu": round(roof["mfu"], 4),
        "bw_util": round(roof["bw_util"], 4),
        "bytes_gb": round(roof["bytes_gb"], 3),
    }


def main():
    from mono_depth_estimation_tpu.models.encoders.resnet import (
        RESNET_PRESETS,
        ResNetEncoder,
    )
    from mono_depth_estimation_tpu.models.fcrn import FCRN

    out = {}

    # --- full model, bf16 compute like the train step, sum-loss grads
    model = FCRN(layers=50, decoder="upproj", output_size=SIZE,
                 out_channels=20)
    init = jax.jit(lambda r, x: model.init(r, x, train=True))
    variables = init(jax.random.PRNGKey(0), jnp.ones((1, *SIZE, 3)))
    params = variables["params"]
    bs = variables.get("batch_stats")

    def full_loss(params, x):
        y, _ = model.apply(
            {"params": params, **({"batch_stats": bs} if bs else {})},
            x.astype(jnp.bfloat16), train=True,
            mutable=["batch_stats"] if bs else [],
        )
        return y.astype(jnp.float32).mean()

    out["full_model_grads"] = steady_grad_ms(full_loss, params, (*SIZE, 3))

    # --- encoder-only grads
    enc = ResNetEncoder(config=RESNET_PRESETS["resnet50"])
    enc_vars = enc.init(jax.random.PRNGKey(0), jnp.ones((1, *SIZE, 3)),
                        train=True)
    enc_params, enc_bs = enc_vars["params"], enc_vars.get("batch_stats")

    def enc_loss(params, x):
        feats = enc.apply(
            {"params": params, **({"batch_stats": enc_bs} if enc_bs else {})},
            x.astype(jnp.bfloat16), train=True,
            mutable=["batch_stats"] if enc_bs else [],
        )[0]
        leaves = feats if isinstance(feats, (list, tuple)) else [feats]
        return sum(f.astype(jnp.float32).mean() for f in leaves)

    out["encoder_grads"] = steady_grad_ms(enc_loss, enc_params, (*SIZE, 3))

    # --- decoder-only grads: feed the bottleneck shape (H/32, W/32, 1024
    # after the FCRN 1x1 compress — replicate by running the full model from
    # a frozen encoder: grads w.r.t. decoder params only.
    dec_keys = [k for k in params if not k.startswith("ResNetEncoder")]
    dec_params = {k: params[k] for k in dec_keys}
    frozen = {k: params[k] for k in params if k.startswith("ResNetEncoder")}

    def dec_loss(dp, x):
        merged = {**frozen, **dp}
        y, _ = model.apply(
            {"params": merged, **({"batch_stats": bs} if bs else {})},
            x.astype(jnp.bfloat16), train=True,
            mutable=["batch_stats"] if bs else [],
        )
        return y.astype(jnp.float32).mean()

    out["decoder_grads_only"] = steady_grad_ms(dec_loss, dec_params,
                                               (*SIZE, 3))

    # --- decoder variants: is the phase-decomposed upproj backward the
    # problem, or any deconv-ish decoder?
    for dec in ("upconv", "deconv2"):
        m2 = FCRN(layers=50, decoder=dec, output_size=SIZE, out_channels=20)
        v2 = jax.jit(lambda r, x, m2=m2: m2.init(r, x, train=True))(
            jax.random.PRNGKey(0), jnp.ones((1, *SIZE, 3))
        )
        p2, bs2 = v2["params"], v2.get("batch_stats")

        def l2(params, x, m2=m2, bs2=bs2):
            y, _ = m2.apply(
                {"params": params,
                 **({"batch_stats": bs2} if bs2 else {})},
                x.astype(jnp.bfloat16), train=True,
                mutable=["batch_stats"] if bs2 else [],
            )
            return y.astype(jnp.float32).mean()

        out[f"full_model_grads_{dec}"] = steady_grad_ms(l2, p2, (*SIZE, 3))

    for k, v in out.items():
        print(k, json.dumps(v), flush=True)
    Path(__file__).parent.parent.joinpath("profile_laina.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
