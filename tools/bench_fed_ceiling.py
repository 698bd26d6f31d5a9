"""Consumer-only ceiling for fed training (VERDICT r3 task #5 close-out).

Times the EXACT fed-training consumer loop — one dispatched train step per
batch, donated TrainState, flagship BTS-dn161 512x512 b16 bf16 — but with
DEVICE-RESIDENT pre-staged batches: no loader, no host aug, no host->HBM
transfer. Whatever this measures is the hard ceiling ANY input pipeline
design can reach in this runtime; if the best fed number already sits at
that ceiling, producer isolation (data/shm_loader.py) cannot help HERE and
the remaining gap to the in-graph 48.3 img/s (round-5-corrected flagship
b16 rate; 86.9 in rounds 3-4 was the accidental bts_size=64 decoder) is
the tunnel's per-dispatch cost, not host contention.

Writes bench_extra.json["fed_consumer_ceiling"].
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

import bench
from mono_depth_estimation_tpu.cli.common import (
    build_parser,
    derive_globals,
    parse_args_into_namespaces,
)
from mono_depth_estimation_tpu.methods import get_method
from mono_depth_estimation_tpu.parallel.mesh import make_mesh, shard_batch
from mono_depth_estimation_tpu.train.state import TrainState
from mono_depth_estimation_tpu.train.steps import make_train_step


def main(batch=16, size=512, steps_per_epoch=16, epochs=2):
    parser, cmds = build_parser("bench")
    args = parse_args_into_namespaces(
        parser, cmds, ["--name", "bench", "bts", "--batch_size", str(batch)]
    )
    derive_globals(args)
    method = get_method(args)
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    host = (
        rng.uniform(0, 1, (batch, size, size, 4)).astype(np.float32),
        rng.uniform(0, 1, (batch, size, size, 10)).astype(np.float32),
    )
    model, variables = method.init_variables(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, host)
    )
    optimizer = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(variables["params"]),
    )
    train_step = make_train_step(method, model, optimizer, jnp.bfloat16)

    # K distinct DEVICE-RESIDENT batches, reused round-robin. The donated
    # state differs every step, so the tunnel's (program, inputs)
    # memoization cannot fire even on reused batches.
    ks = 4
    dev_batches = []
    for i in range(ks):
        b = (host[0] + np.float32(i) / 7.0, host[1])
        dev_batches.append(shard_batch(b, mesh))
    jax.block_until_ready(dev_batches)

    def epoch(state, rng):
        loss = None
        for s in range(steps_per_epoch):
            rng, k = jax.random.split(rng)
            state, loss, *_ = train_step(state, dev_batches[s % ks], k)
            # per-step HOST READBACK: the tunnel acknowledges async
            # dispatch unreliably (CLAUDE.md) — an end-of-epoch
            # block_until_ready returned after 16.2 ms/step, faster than
            # the step's own compute (impossible); the readback forces
            # real execution and matches what any correct consumer that
            # inspects its loss pays
            _ = float(loss)
        return state, rng, loss

    rng_j = jax.random.PRNGKey(1)
    state, rng_j, loss = epoch(state, rng_j)  # warm/compile

    t0 = time.perf_counter()
    for _ in range(epochs):
        state, rng_j, loss = epoch(state, rng_j)
    dt = time.perf_counter() - t0
    ips = epochs * steps_per_epoch * batch / dt

    rec = {
        "images_per_sec": round(ips, 2),
        "ms_per_dispatched_step": round(1e3 * dt / (epochs * steps_per_epoch), 1),
        "batch": batch,
        "note": "device-resident batches, donated state, one dispatch/step "
                "— the hard consumer ceiling for ANY fed pipeline here; "
                "in-graph scan comparison point is 48.3 img/s "
                "(round-5-corrected bts_size=512 flagship b16)",
    }
    extra = (
        json.loads(bench.EXTRA_FILE.read_text())
        if bench.EXTRA_FILE.exists()
        else {}
    )
    extra["fed_consumer_ceiling"] = rec
    bench.EXTRA_FILE.write_text(json.dumps(extra))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
