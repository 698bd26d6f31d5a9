"""Experiment: forms of the DORN ASPP dilated 3x3 conv (2048 -> 512 at
33x45, the SceneUnderstandingModule's FLOPs bulk — Dorn.py:83-128).

profile_dorn.json puts scene_only at 55% MFU / 27% BW — neither bound.
Hypothesis: XLA's direct lowering of heavily dilated convs (d=12 spans 25
of the 33 rows) leaves MXU idle; a 9-tap shifted-slice concat + single
matmul may tile better. Forms, all computing the same zero-padded SAME
conv:

  direct   — lax.conv_general_dilated, rhs_dilation=d (what ConvRelu does)
  tapsum   — 9 shifted slices, each through a 1x1 matmul, summed
  concat   — 9 shifted slices concatenated channel-wise, ONE (9*2048, 512)
             einsum
  dense1x1 — a 1x1 2048->512 conv (pure-matmul speed reference, 1/9 FLOPs)

Usage: python tools/exp_dilated_conv.py
Writes: exp_dilated_conv.json
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
import numpy as np

from bench import _slope_time

B, H, W, CIN, COUT = 16, 33, 45, 2048, 512


def direct(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(d, d), (d, d)],
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _shifts(x, d):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return [
        jax.lax.dynamic_slice(xp, (0, i * d, j * d, 0), (b, h, w, c))
        for i in range(3)
        for j in range(3)
    ]


def tapsum(x, w, d):
    out = None
    for t, xs in enumerate(_shifts(x, d)):
        y = jnp.einsum("bhwc,cf->bhwf", xs, w[t // 3, t % 3])
        out = y if out is None else out + y
    return out


def concat(x, w, d):
    xs = jnp.concatenate(_shifts(x, d), axis=-1)
    wf = w.reshape(9 * w.shape[2], w.shape[3])
    return jnp.einsum("bhwc,cf->bhwf", xs, wf)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)) * 0.01, jnp.bfloat16)
    w1 = w[1, 1]

    # exactness first (f32, small) — all forms are the same conv
    xf = jnp.asarray(rng.normal(size=(1, H, W, 64)), jnp.float32)
    wf = jnp.asarray(rng.normal(size=(3, 3, 64, 8)), jnp.float32)
    for d in (4, 12):
        ref = direct(xf, wf, d)
        for name, fn in (("tapsum", tapsum), ("concat", concat)):
            err = float(jnp.max(jnp.abs(fn(xf, wf, d) - ref)))
            assert err < 1e-3, (name, d, err)
    print("exactness OK", flush=True)

    def timed(fn, wt):  # fn(x, w) -> out; weights travel as an argument
        def make_run(n):
            def run(w_, x_, key):
                def body(carry, k):
                    xi = x_ + jax.random.uniform(k, (), x_.dtype)
                    # abs() before the reduce: a plain sum of a matmul output
                    # is algebraically factorable (sum(x@w) == sum_rows(x) @
                    # sum_cols(w)) and XLA DOES factor it — the 1x1 einsum
                    # form timed 0.045 ms (1100 TFLOP/s, impossible) before
                    # this guard; the conv forms were not rewritten.
                    y = jnp.abs(fn(xi, w_).astype(jnp.float32))
                    return carry + y.sum(), None

                tot, _ = jax.lax.scan(body, jnp.float32(0),
                                      jax.random.split(key, n))
                return tot

            return run

        dt, _, _ = _slope_time(make_run, (wt, x))
        return dt * 1e3  # ms per batch

    res = {}
    for d in (4, 8, 12):
        res[f"direct_d{d}"] = round(
            timed(lambda xx, ww, d=d: direct(xx, ww, d), w), 3)
        res[f"tapsum_d{d}"] = round(
            timed(lambda xx, ww, d=d: tapsum(xx, ww, d), w), 3)
        res[f"concat_d{d}"] = round(
            timed(lambda xx, ww, d=d: concat(xx, ww, d), w), 3)
        print({k: v for k, v in res.items() if k.endswith(f"d{d}")},
              flush=True)
    res["dense1x1"] = round(
        timed(lambda xx, ww: jnp.einsum("bhwc,cf->bhwf", xx, ww), w1), 3)
    res["direct_d1"] = round(
        timed(lambda xx, ww: direct(xx, ww, 1), w), 3)
    print(res, flush=True)
    Path(__file__).parent.parent.joinpath("exp_dilated_conv.json").write_text(
        json.dumps(res, indent=1)
    )


if __name__ == "__main__":
    main()
