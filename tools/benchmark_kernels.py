#!/usr/bin/env python
"""Microbenchmarks: Pallas kernels vs the XLA lowering of their jnp twins.

Run on the real chip; results append to kernel_bench.json so ops can pick
the winner per shape class. Timing uses per-call sync with a host readback
(the tunneled runtime memoizes repeated executions and reports async
completion unreliably — see bench.py).
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


def timeit(fn, inputs, iters=5):
    """Median per-call seconds; fresh input per call + host readback."""
    fn = jax.jit(fn)
    _ = np.asarray(fn(inputs[0]).sum())  # compile
    times = []
    for x in inputs[1 : 1 + iters]:
        t0 = time.perf_counter()
        _ = np.asarray(fn(x).sum())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_lpg():
    from mono_depth_estimation_tpu.kernels.lpg import lpg_pallas
    from mono_depth_estimation_tpu.ops.lpg import local_planar_guidance

    results = {}
    for r, h, w in [(8, 64, 64), (4, 128, 128)]:
        b = 8
        keys = [jax.random.PRNGKey(i) for i in range(10)]
        planes = [
            jax.random.normal(k, (b, h, w, 4), jnp.float32)
            .at[..., 2].add(2.0)
            for k in keys
        ]
        t_xla = timeit(lambda p, r=r: local_planar_guidance(p, r), planes)
        t_pal = timeit(lambda p, r=r: lpg_pallas(p, r), planes)
        results[f"lpg_r{r}_{h}x{w}"] = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "winner": "pallas" if t_pal < t_xla else "xla",
        }
    return results


def bench_preproc():
    from mono_depth_estimation_tpu.kernels.preproc import (
        normalize_crop_pallas,
        normalize_crop_reference,
    )

    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
    results = {}
    for h, w, th, tw in [(540, 720, 512, 512)]:
        b = 16
        imgs = [
            jax.random.randint(jax.random.PRNGKey(i), (b, h, w, 3), 0, 256, jnp.int32)
            .astype(jnp.uint8)
            for i in range(10)
        ]
        t_xla = timeit(
            lambda x: normalize_crop_reference(x, (th, tw), mean, std), imgs
        )
        t_pal = timeit(
            lambda x: normalize_crop_pallas(x, (th, tw), mean, std), imgs
        )
        results[f"normcrop_{h}x{w}->{th}x{tw}"] = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "winner": "pallas" if t_pal < t_xla else "xla",
        }
    return results


def main():
    out = {}
    for bench in (bench_lpg, bench_preproc):
        try:
            out.update(bench())
        except Exception as e:  # record partial results + the failure
            out[bench.__name__ + "_error"] = str(e)[:300]
    path = Path(__file__).resolve().parents[1] / "kernel_bench.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
