"""bf16 STORAGE on the flagship train step (VERDICT r4 task #3 / weak #6),
plus the post-fusion traffic interval for the same step (task #8).

Two measured variants of the BTS-dn161 512x512 b32 train step (loss +
grads + AdamW), both with bf16 COMPUTE (the production policy —
train/steps.py casts inputs to bf16 and models compute at input dtype):

  * baseline   — params/grads/moments stored f32 (the shipped step)
  * bf16_store — params stored bf16 with an f32 master in the carry:
    forward+backward read bf16 params and write bf16 grads (half the
    param-side traffic); the optimizer updates the f32 master and re-casts.

Traffic accounting (why a small effect is expected up front): the flagship
has ~47M params -> ~188 MB f32. Per step the param-side bytes are roughly
2 reads (fwd+bwd) + grad write/read + 2 moments read/write + master
read/write ~ 9 x 188 MB ~ 1.7 GB; at ~3 steps/s that is ~5 GB/s of the
v5e's 819 GB/s — under 1%. The step's bytes are ACTIVATION-dominated at
512^2 b32, and activations are already bf16 under the compute policy, so
bf16 param storage can only move the needle by the param-side share.
The measurement below decides; either outcome is recorded.

Writes bench_extra.json["bf16_train_storage"] and
["bts_train_postfusion"].
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _build(batch):
    import jax
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.methods import get_method

    parser, cmds = build_parser("bench-bf16")
    args = parse_args_into_namespaces(parser, cmds, ["--name", "bench", "bts"])
    derive_globals(args)
    method = get_method(args)
    h, w = 512, 512
    host = (
        jnp.ones((batch, h, w, 4), jnp.float32),
        jnp.full((batch, h, w, 10), 0.5, jnp.float32),
    )
    model, variables = method.init_variables(jax.random.PRNGKey(0), host)
    optimizer = method.optimizer()
    return method, model, optimizer, variables, (h, w)


def bench_baseline(batch: int = 32, remat: bool = False):
    import jax
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step

    method, model, optimizer, variables, (h, w) = _build(batch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(variables["params"]),
    )
    train_step = make_train_step(method, model, optimizer, jnp.bfloat16,
                                 remat=remat)
    base_x = jax.random.uniform(jax.random.PRNGKey(3), (batch, h, w, 4),
                                jnp.float32)
    base_y = jax.random.uniform(jax.random.PRNGKey(4), (batch, h, w, 10),
                                jnp.float32, minval=0.1, maxval=1.0)

    def make_run(n):
        def run(state, base_x, base_y, key):
            def body(carry, k):
                st, _ = carry
                kc, ks = jax.random.split(k)
                c = jax.random.uniform(kc, (), jnp.float32)
                st, loss, *_ = train_step(st, (base_x + c, base_y + c), ks)
                return (st, loss), None

            (state, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jax.random.split(key, n)
            )
            return state, loss

        return run

    dt, compiled, _ = bench._slope_time(make_run, (state, base_x, base_y),
                                        n1=3, n2=9, donate=True)
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    post = bench._postfusion_traffic_bytes(compiled)
    return batch / dt, dt, roof, post


def bench_bf16_storage(batch: int = 32, remat: bool = False):
    """params stored bf16, f32 master in the carry; same scan protocol."""
    import jax
    import jax.numpy as jnp
    import optax

    from mono_depth_estimation_tpu.train.steps import _cast_inputs

    method, model, optimizer, variables, (h, w) = _build(batch)
    master = variables["params"]
    params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), master)
    bs = variables.get("batch_stats")
    opt_state = optimizer.init(master)
    carry0 = (params16, master, opt_state, bs)

    def step(carry, batch_t, rng):
        params16, master, opt_state, bs = carry
        batch_c = _cast_inputs(batch_t, jnp.bfloat16)

        def loss_fn(p):
            v = {"params": p}
            if bs is not None:
                v["batch_stats"] = bs
            loss, aux = method.train_loss(model, v, batch_c, rng)
            return loss.astype(jnp.float32), aux

        if remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params16
        )
        g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = optimizer.update(g32, opt_state, master)
        master = optax.apply_updates(master, updates)
        params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), master)
        new_bs = aux.get("batch_stats") or bs
        return (params16, master, opt_state, new_bs), loss

    base_x = jax.random.uniform(jax.random.PRNGKey(3), (batch, h, w, 4),
                                jnp.float32)
    base_y = jax.random.uniform(jax.random.PRNGKey(4), (batch, h, w, 10),
                                jnp.float32, minval=0.1, maxval=1.0)

    def make_run(n):
        def run(carry, base_x, base_y, key):
            def body(c_, k):
                carry, _ = c_
                kc, ks = jax.random.split(k)
                c = jax.random.uniform(kc, (), jnp.float32)
                carry, loss = step(carry, (base_x + c, base_y + c), ks)
                return (carry, loss), None

            (carry, loss), _ = jax.lax.scan(
                body, (carry, jnp.float32(0)), jax.random.split(key, n)
            )
            return carry, loss

        return run

    dt, compiled, _ = bench._slope_time(make_run, (carry0, base_x, base_y),
                                        n1=3, n2=9, donate=True)
    roof = bench._roofline_from_cost(compiled, dt, n_iters=1)
    return batch / dt, dt, roof


def _flush(key, value):
    extra = (json.loads(bench.EXTRA_FILE.read_text())
             if bench.EXTRA_FILE.exists() else {})
    node = extra.setdefault("bf16_train_storage", {})
    if key == "bts_train_postfusion":
        extra[key] = value
    else:
        node[key] = value
    bench.EXTRA_FILE.write_text(json.dumps(extra))


def main():
    out = {}

    # HONEST flagship geometry chain (bts_size=512 — see bench.py
    # bench_bts_train_steady's round-5 correction): b32 plain does NOT fit
    # (24.4G of 15.75G); fall through remat and smaller batches. Failed
    # attempts must not pin their device buffers: keep only the message
    # (a held traceback references the frame's state/base arrays in HBM).
    import gc

    last_msg = None
    for batch, remat in ((32, True), (16, False), (16, True), (8, False)):
        try:
            ips0, dt0, roof0, post0 = bench_baseline(batch, remat=remat)
            break
        except Exception as e:
            if bench._is_oom(e):
                print(f"baseline b{batch} remat={remat}: OOM", flush=True)
                last_msg = str(e)[:200]
                del e
                gc.collect()
                continue
            raise
    else:
        raise RuntimeError(f"no flagship train geometry fits: {last_msg}")
    base_row = {
        "images_per_sec": round(ips0, 1), "batch": batch, "remat": remat,
        "mfu": round(roof0["mfu"], 4),
        "hbm_bw_util": round(roof0["bw_util"], 4),
    }
    if "bw_util_logical" in roof0:
        base_row["hbm_bw_util_logical"] = round(roof0["bw_util_logical"], 4)
    print("baseline:", json.dumps(base_row), flush=True)
    out["baseline"] = base_row
    _flush("baseline", base_row)

    if post0 is not None:
        post_util = post0 / dt0 / 819e9
        pf = {
            "postfusion_bytes_gb": round(post0 / 1e9, 3),
            "postfusion_bw_util": round(post_util, 4),
            "logical_bytes_gb": round(roof0.get("bytes_gb", 0.0), 3),
            "note": "post-fusion HLO traffic estimate "
                    "(bench._postfusion_traffic_bytes): interval for the "
                    "flagship b32 train step is [postfusion_bw_util, "
                    "min(1, logical)] of the 819 GB/s roofline",
        }
        print("postfusion:", json.dumps(pf), flush=True)
        out_pf = pf
    else:
        out_pf = {"note": "backend does not export optimized HLO text"}
        print("postfusion: unavailable", flush=True)
    _flush("bts_train_postfusion", out_pf)

    try:
        ips1, dt1, roof1 = bench_bf16_storage(batch, remat=remat)
    except Exception as e:
        if bench._is_oom(e):
            # the extra bf16 param copy tips the 512^2 b32 footprint over
            # the 16G chip: that is itself the (negative) result
            out["bf16_store"] = {"error": "RESOURCE_EXHAUSTED",
                                 "note": "extra bf16 param copy overflows "
                                         "HBM at 512^2 b32"}
            out["verdict"] = (
                "negative result: bf16 param storage cannot even compile at "
                "the flagship geometry (adds a param-sized bf16 copy to a "
                "footprint already near the 16G ceiling), and the addressable"
                " param-side traffic is <1% of step bytes (docstring)"
            )
            _flush("bf16_store", out["bf16_store"])
            _flush("verdict", out["verdict"])
            print("bf16_store: OOM ->", out["verdict"], flush=True)
            return
        raise
    b16_row = {
        "images_per_sec": round(ips1, 1), "batch": batch,
        "mfu": round(roof1["mfu"], 4),
        "hbm_bw_util": round(roof1["bw_util"], 4),
        "speedup_vs_baseline": round(ips1 / ips0, 4),
    }
    if "bw_util_logical" in roof1:
        b16_row["hbm_bw_util_logical"] = round(roof1["bw_util_logical"], 4)
    print("bf16_store:", json.dumps(b16_row), flush=True)
    out["bf16_store"] = b16_row
    out["verdict"] = (
        "adopt" if ips1 > ips0 * 1.03 else
        "negative result: within noise/worse — param-side traffic is the "
        "only term halved and it is <1% of the step's bytes at 512^2 b32 "
        "(see module docstring accounting)"
    )
    _flush("bf16_store", b16_row)
    _flush("verdict", out["verdict"])
    print("verdict:", out["verdict"], flush=True)


if __name__ == "__main__":
    main()
