"""Calibrate the steady-state harness's per-dispatch floor.

Hypothesis (round 3): a compiled scan of n batches pays ONE tunnel
dispatch (~tens of ms); dividing wall time by n leaves an additive
~overhead/n per batch that dominates small stages (profile_zoo.json's
encoder_to_tap0 = 6.1 ms at 0.97% MFU). Measure a near-null stage and a
real model at several n; the fitted intercept is the dispatch floor and
the slope is the true per-batch device time.
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


def timed(fn_body, base, n):
    def run(base, key):
        def body(carry, k):
            x = base + jax.random.uniform(k, (), jnp.bfloat16)
            return carry + fn_body(x), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, n))
        return total

    compiled = jax.jit(run).lower(base, jax.random.PRNGKey(1)).compile()
    _ = np.asarray(compiled(base, jax.random.PRNGKey(1)))
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(compiled(base, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    res = {}
    base_small = jax.random.uniform(jax.random.PRNGKey(0), (32, 240, 320, 3),
                                    jnp.bfloat16)

    # near-null device work: one pass over the input
    for n in (6, 24, 96):
        res[f"null_n{n}_total_ms"] = round(
            timed(lambda x: x.astype(jnp.float32).sum(), base_small, n) * 1e3,
            3)

    # FCRN full model (the profile's 16.6 ms/batch @ n=6)
    from mono_depth_estimation_tpu.models.fcrn import FCRN
    import bench

    model = FCRN(layers=50, decoder="upproj", output_size=(120, 160),
                 out_channels=1)
    init = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = bench._bf16_params(
        init(jax.random.PRNGKey(0), jnp.ones((1, 240, 320, 3))))

    def fcrn_body(x):
        out = model.apply(variables, x, train=False)
        return out.astype(jnp.float32).sum()

    for n in (6, 24, 96):
        t = timed(fcrn_body, base_small, n)
        res[f"fcrn_n{n}_total_ms"] = round(t * 1e3, 3)
        res[f"fcrn_n{n}_ms_per_batch"] = round(t / n * 1e3, 3)

    print(json.dumps(res, indent=1))
    Path(__file__).parent.parent.joinpath("calibrate_harness.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
