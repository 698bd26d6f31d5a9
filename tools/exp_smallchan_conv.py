"""Experiment: can a 5x5 stride-1 conv with 64 in/out channels (Eigen
scale2/3's hot op, profile_zoo.json: 22.8% MFU) beat XLA's direct form on
TPU via a layout change?

Candidates, all computing the same function (within bf16 rounding):
  direct    — lax.conv_general_dilated NHWC, the form the model uses today
  s2d       — space-to-depth: pack 2x2 pixels into channels (64->256, full
              128-lane tiles), run an equivalent 3x3 conv on the packed
              grid with a structurally-zero-padded kernel (1.44x the FLOPs
              at ~2x the lane utilization), unpack
  im2col    — extract 5x5 patches and contract as one (BHW, 1600)@(1600,64)
              matmul

Shapes: the Eigen scale3 interior conv (B=32, 109x149, 64->64) and the
scale2 one (B=32, 55x75, 64->64 with 160-ch first conv checked separately).
Timed with bench._slope_time (dispatch floor cancels).
"""

from __future__ import annotations

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench


def direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def pack_s2d_kernel(w_np: np.ndarray) -> np.ndarray:
    """Scatter a (5,5,C,Co) kernel into the (3,3,4C,4Co) packed form.

    Packed pixel (i,j) holds original (2i+di, 2j+dj), di/dj in {0,1}. An
    output at (2i+do, 2j+dj) needs original rows 2i+do-2 .. 2i+do+2 —
    contained in packed rows i-1..i+1, so one 3x3 packed conv computes all
    four phases. Input tap (kh,kw) for output phase (do,dj) reads original
    (2i+do+kh-2, 2j+dj+kw-2) = packed row i + (do+kh-2+2)//2 - 1 with
    in-phase (do+kh)%2 (same for columns)."""
    c, co = w_np.shape[2], w_np.shape[3]
    kk = np.zeros((3, 3, 4 * c, 4 * co), w_np.dtype)
    for do in range(2):
        for dj in range(2):
            for kh in range(5):
                for kw in range(5):
                    pr, ir = divmod(do + kh, 2)  # (r+2)//2, (r+2)%2
                    ps, ic = divmod(dj + kw, 2)
                    kk[pr, ps,
                       (ir * 2 + ic) * c:(ir * 2 + ic + 1) * c,
                       (do * 2 + dj) * co:(do * 2 + dj + 1) * co] += \
                        w_np[kh, kw]
    return kk


def s2d_conv(x, kkj):
    """5x5 SAME conv via space-to-depth + one 3x3 packed conv (kernel
    pre-packed by pack_s2d_kernel), then depth-to-space."""
    b, h, w_, c4 = x.shape[0], x.shape[1], x.shape[2], kkj.shape[2]
    c = c4 // 4
    co = kkj.shape[3] // 4
    ph, pw = (h + 1) // 2 * 2, (w_ + 1) // 2 * 2
    xp = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w_), (0, 0)))
    xp = xp.reshape(b, ph // 2, 2, pw // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(b, ph // 2, pw // 2, 4 * c)
    yp = jax.lax.conv_general_dilated(
        xp, kkj, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    yp = yp.reshape(b, ph // 2, pw // 2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return yp.reshape(b, ph, pw, co)[:, :h, :w_, :]


def im2col_conv(x, w):
    b, h, w_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    cols = jnp.stack(
        [xp[:, i:i + h, j:j + w_, :] for i in range(5) for j in range(5)],
        axis=3,
    )  # (B, H, W, 25, C)
    cols = cols.reshape(b, h, w_, 25 * c)
    wm = w.reshape(25 * c, -1)
    return jnp.einsum("bhwk,ko->bhwo", cols, wm)


def time_form(fn, x, w):
    def make_run(n):
        def run(w, base, key):
            def body(carry, k):
                xx = base + jax.random.uniform(k, (), base.dtype)
                return carry + fn(xx, w).astype(jnp.float32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, n))
            return tot

        return run

    dt, compiled, _ = bench._slope_time(make_run, (w, x))
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    return {"ms": round(dt * 1e3, 3), "mfu": round(roof["mfu"], 4),
            "bw_util": round(roof["bw_util"], 4)}


def main():
    res = {}
    key = jax.random.PRNGKey(0)
    for tag, (hw, cin, cout) in {
        "scale3_109x149_64to64": ((109, 149), 64, 64),
        "scale2_55x75_64to64": ((55, 75), 64, 64),
    }.items():
        x = jax.random.uniform(key, (32, *hw, cin), jnp.bfloat16)
        w_np = (np.asarray(
            jax.random.normal(key, (5, 5, cin, cout), jnp.float32)) * 0.05)
        w = jnp.asarray(w_np, jnp.bfloat16)
        kkj = jnp.asarray(pack_s2d_kernel(w_np), jnp.bfloat16)
        # correctness first
        y0 = np.asarray(direct_conv(x, w).astype(jnp.float32))
        y1 = np.asarray(s2d_conv(x, kkj).astype(jnp.float32))
        y2 = np.asarray(im2col_conv(x, w).astype(jnp.float32))
        err1 = float(np.max(np.abs(y0 - y1)))
        err2 = float(np.max(np.abs(y0 - y2)))
        res[tag] = {
            "s2d_max_err": err1, "im2col_max_err": err2,
            "direct": time_form(direct_conv, x, w),
            "s2d": time_form(s2d_conv, x, kkj),
            "im2col": time_form(im2col_conv, x, w),
        }
        print(tag, json.dumps(res[tag], indent=1), flush=True)
    Path(__file__).parent.parent.joinpath("exp_smallchan_conv.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
