#!/usr/bin/env python
"""Microbenchmarks: Pallas kernels vs the XLA lowering of their jnp twins.

Run on the real chip; results land in kernel_bench.json so ops can pick the
winner per shape class (SURVEY §7 hard part 3: "benchmarked against the
lowered-jnp version, keep the winner").

Timing protocol (same as bench.py's steady-state model numbers): ONE jitted
lax.scan runs the op over N in-graph-generated distinct inputs — the
tunneled runtime memoizes repeated (program, input) executions and reports
async completion unreliably, and its ~30 ms per-dispatch round trip buried
sub-ms kernels when each call was dispatched separately (the round-1
numbers all sat at the tunnel floor). A host readback of the accumulated
sum syncs each measurement; the in-graph input generation is measured
separately (overhead arm) and subtracted.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N_ITERS = 30
REPS = 3


def _steady_ms(make_input, fn, n=N_ITERS, reps=REPS):
    """Median per-iteration seconds of fn over n distinct in-graph inputs."""

    @jax.jit
    def run(key):
        def body(carry, k):
            x = make_input(k)
            y = fn(x)
            return carry + y.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, n))
        return tot

    _ = np.asarray(run(jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(run(jax.random.PRNGKey(1 + i)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n * 1e3


def bench_pair(name, make_input, fn_xla, fn_pallas, results):
    """Times both arms + the input-generation overhead arm; records net ms."""
    # overhead arm sums the full generated input so XLA can't narrow the
    # random generation away
    t_over = _steady_ms(make_input, lambda x: jax.tree.leaves(x)[0])
    t_xla = _steady_ms(make_input, fn_xla)
    t_pal = _steady_ms(make_input, fn_pallas)
    net_xla = max(t_xla - t_over, 0.0)
    net_pal = max(t_pal - t_over, 0.0)
    results[name] = {
        "xla_ms": round(net_xla, 4),
        "pallas_ms": round(net_pal, 4),
        "overhead_ms": round(t_over, 4),
        "winner": "pallas" if net_pal < net_xla else "xla",
    }


def bench_lpg(results):
    """Flagship shapes: BTS-512 decoder LPG heads (models/bts.py:177-201).

    The Pallas kernel was deleted after losing to this XLA form on-chip
    (r2 decision: XLA 0.011/0.049 ms vs Pallas 0.206/1.402 ms at r8/r4);
    this now records the winner's timing for regression tracking."""
    from mono_depth_estimation_tpu.ops.lpg import local_planar_guidance

    b = 8
    for r, h, w in [(8, 64, 64), (4, 128, 128), (2, 256, 256)]:
        def make(k, h=h, w=w):
            p = jax.random.normal(k, (b, h, w, 4), jnp.float32)
            return p.at[..., 2].add(2.0)

        t_over = _steady_ms(make, lambda x: x)
        t_xla = _steady_ms(make, lambda p, r=r: local_planar_guidance(p, r))
        results[f"lpg_r{r}_{h}x{w}"] = {
            "xla_ms": round(max(t_xla - t_over, 0.0), 4),
            "overhead_ms": round(t_over, 4),
            "winner": "xla (pallas kernel deleted after r2 benchmark)",
        }


def bench_preproc(results):
    """Device-side u8 normalize+crop (ops/preproc.py) — the XLA form that
    beat the deleted Pallas kernel (r2 decision: XLA fused to ~0 ms vs
    Pallas 0.107 ms at 16x540x720)."""
    from mono_depth_estimation_tpu.ops.preproc import normalize_crop

    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
    for b, h, w, th, tw in [(16, 540, 720, 512, 512)]:
        def make(k, h=h, w=w, b=b):
            return jax.random.randint(k, (b, h, w, 3), 0, 256, jnp.int32).astype(
                jnp.uint8
            )

        t_over = _steady_ms(make, lambda x: x)
        t_xla = _steady_ms(make, lambda x: normalize_crop(x, (th, tw), mean, std))
        results[f"normcrop_{h}x{w}->{th}x{tw}"] = {
            "xla_ms": round(max(t_xla - t_over, 0.0), 4),
            "overhead_ms": round(t_over, 4),
            "winner": "xla (pallas kernel deleted after r2 benchmark)",
        }


def bench_upproj(results):
    """Fused phase-decomposed up-projection vs the literal zero-unpool+conv
    (ops/upproj.py; FCRN decoder stages at 240x320 flagship geometry)."""
    from mono_depth_estimation_tpu.ops.upproj import (
        upproj_conv,
        upproj_conv_reference,
    )

    b = 8
    for h, w, cin, cout in [(8, 10, 1024, 512), (32, 40, 256, 128)]:
        def make(k, h=h, w=w, cin=cin, cout=cout):
            kx, kw = jax.random.split(k)
            return (
                jax.random.normal(kx, (b, h, w, cin), jnp.float32),
                jax.random.normal(kw, (5, 5, cin, cout), jnp.float32) * 0.01,
            )

        bench_pair(
            f"upproj_{h}x{w}_{cin}->{cout}", make,
            lambda xw: upproj_conv_reference(*xw),
            lambda xw: upproj_conv(*xw),
            results,
        )
    # label semantics: here 'pallas' column = the fused rewrite (no kernel)
    for k in list(results):
        if k.startswith("upproj"):
            results[k]["note"] = "pallas_ms column is the fused-phase rewrite"


def bench_upconv(results):
    """Fused input-dilated nearest-up+conv vs the literal upsample+conv
    (ops/upconv.py; the five BTS-512 decoder upconv stages, bf16 batch 32).
    A 4-phase-convs decomposition and a padded-single-conv+slice variant
    were also measured during the r2 decision and lose to the dilated form
    at every shape (see ops/upconv.py docstring)."""
    from mono_depth_estimation_tpu.ops.upconv import (
        upconv_nearest_conv,
        upconv_nearest_conv_reference,
    )

    b = 32
    for tag, hw, cin, cout in [
        ("up5", 16, 2208, 512), ("up4", 32, 512, 256), ("up3", 64, 128, 128),
        ("up2", 128, 128, 64), ("up1", 256, 64, 32),
    ]:
        def make(k, hw=hw, cin=cin, cout=cout):
            kx, kw = jax.random.split(k)
            return (
                jax.random.uniform(kx, (b, hw, hw, cin), jnp.bfloat16),
                jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.02,
            )

        bench_pair(
            f"upconv_{tag}_{hw}x{hw}_{cin}->{cout}", make,
            lambda xw: upconv_nearest_conv_reference(*xw),
            lambda xw: upconv_nearest_conv(*xw),
            results,
        )
    for k in list(results):
        if k.startswith("upconv"):
            results[k]["note"] = "pallas_ms column is the fused dilated form"


def bench_resize(results):
    """align-corners bilinear resize: the r1 gather form (four output-sized
    corner tensors via jnp.take) vs the matmul form shipped in
    ops/resize.py (two interpolation matmuls on the MXU). Shapes: the DORN
    headline tail (33x45 -> 257x353, 136ch, b16) and the FCRN output head.
    The matmul form won end-to-end too: DORN eval 351.8 -> 481.2 img/s @ b8."""
    from mono_depth_estimation_tpu.ops.resize import resize_bilinear

    def gather_form(x, size):
        in_h, in_w = x.shape[-3], x.shape[-2]
        out_h, out_w = size
        yy = jnp.arange(out_h, dtype=jnp.float32) * ((in_h - 1) / (out_h - 1))
        xx = jnp.arange(out_w, dtype=jnp.float32) * ((in_w - 1) / (out_w - 1))
        y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, in_h - 1)
        y1 = jnp.clip(y0 + 1, 0, in_h - 1)
        x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, in_w - 1)
        x1 = jnp.clip(x0 + 1, 0, in_w - 1)
        wy = (yy - y0.astype(jnp.float32))[:, None, None]
        wx = (xx - x0.astype(jnp.float32))[None, :, None]
        rows0, rows1 = jnp.take(x, y0, axis=-3), jnp.take(x, y1, axis=-3)
        p00, p01 = jnp.take(rows0, x0, axis=-2), jnp.take(rows0, x1, axis=-2)
        p10, p11 = jnp.take(rows1, x0, axis=-2), jnp.take(rows1, x1, axis=-2)
        top = p00 * (1 - wx) + p01 * wx
        bot = p10 * (1 - wx) + p11 * wx
        return (top * (1 - wy) + bot * wy).astype(x.dtype)

    for tag, in_hw, out_hw, c, b in [
        ("dorn_tail", (33, 45), (257, 353), 136, 16),
        ("fcrn_head", (120, 160), (240, 320), 1, 32),
    ]:
        def make(k, in_hw=in_hw, c=c, b=b):
            return (jax.random.uniform(k, (b, *in_hw, c), jnp.bfloat16),)

        bench_pair(
            f"resize_ac_{tag}_{in_hw[0]}x{in_hw[1]}->{out_hw[0]}x{out_hw[1]}",
            make,
            lambda xs, out_hw=out_hw: gather_form(xs[0], out_hw),
            lambda xs, out_hw=out_hw: resize_bilinear(
                xs[0], out_hw, align_corners=True
            ),
            results,
        )
    for k in list(results):
        if k.startswith("resize_ac"):
            results[k]["note"] = (
                "xla_ms = r1 gather form, pallas_ms = matmul form "
                "(both XLA; ops/resize.py ships the matmul form)"
            )


def main():
    out = {}
    for bench in (bench_lpg, bench_preproc, bench_upproj, bench_upconv,
                  bench_resize):
        try:
            bench(out)
        except Exception as e:  # record partial results + the failure
            out[bench.__name__ + "_error"] = str(e)[:300]
    path = Path(__file__).resolve().parents[1] / "kernel_bench.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
