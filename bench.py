"""Benchmark: eval throughput (images/sec/chip) vs the PyTorch reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.json config 4): DORN — deep-stem dilated ResNet-101 +
SceneUnderstanding + ordinal decode — eval forward at its native 257x353,
bf16 on TPU, batch 16 (the measured throughput sweet spot; the torch-CPU
baseline is batch-insensitive). The baseline is the REFERENCE CODE ITSELF on
CPU (vendored torch ResNet, /root/reference/network/Dorn.py), measured once
and cached in bench_baseline.json (--remeasure-baseline to refresh;
round-4 remeasured median 0.4538 img/s). Reference torch-CPU baselines for
the OTHER seven families live in bench_baseline.json["zoo"]
(tools/bench_torch_cpu_zoo.py, via the vendored torchvision-compatible
encoders in tests/vendored_torch_encoders.py).

Additional absolute numbers (flagship BTS-dn161 512x512 eval/train, the
full zoo eval+train sweeps) are kept in bench_extra.json for the record.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mono_depth_estimation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

BATCH = 8
SHAPE = (257, 353)


def _bf16_params(variables):
    """bf16 weight storage for eval (halves weight HBM reads; +35% measured)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
WARMUP = 3
ITERS = 10
BASELINE_FILE = Path(__file__).parent / "bench_baseline.json"
EXTRA_FILE = Path(__file__).parent / "bench_extra.json"


def bench_jax_dorn() -> float:
    import jax
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.models.dorn import DORN

    model = DORN(ord_num=68, input_size=SHAPE)
    x32 = jnp.ones((1, *SHAPE, 3), jnp.float32)
    init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False))
    variables = init_fn(jax.random.PRNGKey(0), x32)
    variables = _bf16_params(variables)

    # a FRESH input for every call: the tunneled runtime memoizes
    # (program, inputs) pairs, so any repeat would fake a huge speedup
    xs = [
        jax.random.uniform(jax.random.PRNGKey(i), (BATCH, *SHAPE, 3), jnp.bfloat16)
        for i in range(WARMUP + ITERS)
    ]

    @jax.jit
    def forward(variables, x):
        label, prob = model.apply(variables, x, train=False)
        return label

    import numpy as np

    for i in range(WARMUP):
        _ = np.asarray(forward(variables, xs[i]).sum())
    # per-call sync with a host readback: async dispatch over the tunneled
    # runtime reports completion unreliably, which faked >1 PFLOP/s numbers
    times = []
    for x in xs[WARMUP:]:
        t0 = time.perf_counter()
        _ = np.asarray(forward(variables, x).sum())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return BATCH / dt


def _slope_time(make_run, args, n1=6, n2=30, reps=3, donate=False):
    """Overhead-free steady-state sec/iteration on the tunneled runtime.

    Round-3 finding (tools/calibrate_harness.py): every dispatched call pays
    a CONSTANT ~26 ms (tunnel round trip + scalar readback) regardless of the
    scan length n — a near-null body costs 26.2/26.4/28.0 ms total at
    n=6/24/96. The round-2 harnesses divided one call's wall time by n, so
    every number carried an additive 26/n ms per batch: ~3% on the 179 ms
    flagship, but 27% on FCRN eval (16.6 ms measured vs 12.0 true) and
    DOMINANT on profiler sub-stages. Compiling the same scan body at two
    lengths and fitting sec/iter from the difference cancels the constant
    exactly.

    make_run(n) -> run(*args, key) returning a scalar (readback) when
    donate=False, or (state, scalar) with args[0] donated when donate=True.
    Returns (sec_per_iter, compiled_long, overhead_seconds).
    """
    import jax
    import numpy as np

    totals = {}
    compiled_long = None
    args = list(args)
    for n in (n1, n2):
        jitted = jax.jit(make_run(n), donate_argnums=(0,) if donate else ())
        compiled = jitted.lower(*args, jax.random.PRNGKey(1)).compile()

        def call(i):
            out = compiled(*args, jax.random.PRNGKey(2 + i))
            if donate:
                args[0], loss = out
                _ = float(loss)
            else:
                _ = np.asarray(out)

        call(-1)  # warm (also re-materializes donated state)
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            call(i)
            times.append(time.perf_counter() - t0)
        totals[n] = float(np.median(times))
        if n == n2:
            compiled_long = compiled
    dt = (totals[n2] - totals[n1]) / (n2 - n1)
    return dt, compiled_long, totals[n1] - n1 * dt


def bench_jax_dorn_steady(batch: int = BATCH, with_roofline: bool = False):
    """Steady-state on-chip throughput: a jitted lax.scan runs the forward
    over n distinct in-graph batches (base + per-iter random scalar: fresh
    inputs defeat CSE/memoization at O(1) harness cost), timed with the
    two-point slope protocol (_slope_time) so the constant per-dispatch
    tunnel cost cancels."""
    import jax
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.models.dorn import DORN

    model = DORN(ord_num=68, input_size=SHAPE)
    init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False))
    variables = _bf16_params(init_fn(jax.random.PRNGKey(0), jnp.ones((1, *SHAPE, 3))))
    base = jax.random.uniform(jax.random.PRNGKey(0), (batch, *SHAPE, 3),
                              jnp.bfloat16)

    def make_run(n):
        def run(variables, base, key):
            def body(carry, k):
                x = base + jax.random.uniform(k, (), jnp.bfloat16)
                label, _ = model.apply(variables, x, train=False)
                return carry + label.sum(), None

            total, _ = jax.lax.scan(body, jnp.int32(0),
                                    jax.random.split(key, n))
            return total

        return run

    dt, compiled, _ = _slope_time(make_run, (variables, base))
    ips = batch / dt
    if with_roofline:
        return ips, _roofline_from_cost(compiled, dt, n_iters=1)
    return ips


def _mfu_from_cost(compiled, sec_per_iter: float, n_iters: int = 1) -> float:
    """Model FLOPs utilization vs the v5e's 197 bf16 TFLOP/s peak, from the
    compiled program's own cost model (lowered-HLO flops / wall time)."""
    return _roofline_from_cost(compiled, sec_per_iter, n_iters)["mfu"]


_HLO_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

# pure aliases / bookkeeping: no write of their own AND reads through them
# resolve to buffers we can't track, so skip both sides (slight under-count)
_HLO_TRANSPARENT_OPS = {
    "tuple", "get-tuple-element", "bitcast", "bitcast-convert", "after-all",
    "partition-id", "replica-id",
}
# produce no write we should bill the program for (inputs exist already,
# constants are preloaded) — but READING them as an operand is real traffic
_HLO_NO_WRITE_OPS = _HLO_TRANSPARENT_OPS | {"parameter", "constant"}


def _hlo_shape_bytes(segment: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", segment):
        bpe = _HLO_DTYPE_BYTES.get(m.group(1))
        if bpe is None:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * bpe
    return total


def _postfusion_traffic_bytes(compiled) -> float | None:
    """Crude POST-FUSION HBM traffic estimate from the optimized HLO text
    (VERDICT r4 task #8's "known-fusion subtraction").

    The compiler cost model's "bytes accessed" is LOGICAL — it counts every
    operand/output of every op even when XLA fuses the op away and the
    buffer never exists in HBM. After optimization, fused elementwise
    chains live INSIDE fusion computations; only the fusion's own inputs
    and outputs move through HBM. So: sum output + operand bytes over the
    TOP-LEVEL instructions of executed computations (entry, while
    bodies/conds, conditional branches), skipping pure aliases — and skip
    everything inside computations that are only kFused/reducer bodies
    (referenced via calls=/to_apply=). One read per consumer, one write per
    producer; reduction-operand reads and conv/dot operands count at their
    full size. Still crude (no cache reuse, no double-buffering, while
    bodies counted once — the cost model's convention), but it subtracts
    exactly the traffic fusion provably removed. Returns None if the
    backend can't export HLO text."""
    try:
        txt = compiled.as_text()
    except Exception:
        return None
    if not txt or "ENTRY" not in txt:
        return None

    # computation name -> list of instruction lines
    comps: dict[str, list[str]] = {}
    cur = None
    for line in txt.splitlines():
        stripped = line.strip()
        m = re.match(r"(?:ENTRY\s+)?%([-\w\.]+)\s*\(.*\)\s*->\s*.*\{", stripped)
        if m and not stripped.startswith("%param"):
            cur = m.group(1)
            comps[cur] = []
            continue
        if stripped == "}":
            cur = None
            continue
        if cur is not None and stripped.startswith("%"):
            comps[cur].append(stripped)
        elif cur is not None and stripped.startswith("ROOT %"):
            comps[cur].append(stripped[len("ROOT "):])

    # computations executed inline at top level vs bodies folded into ops
    called_not_toplevel = set()
    toplevel_called = set()
    for lines in comps.values():
        for ln in lines:
            for attr, bucket in (
                ("calls", called_not_toplevel),
                ("to_apply", called_not_toplevel),
                ("body", toplevel_called),
                ("condition", toplevel_called),
                ("true_computation", toplevel_called),
                ("false_computation", toplevel_called),
            ):
                for m in re.finditer(rf"{attr}=%([-\w\.]+)", ln):
                    bucket.add(m.group(1))
            for m in re.finditer(r"branch_computations=\{([^}]*)\}", ln):
                for name in re.findall(r"%([-\w\.]+)", m.group(1)):
                    toplevel_called.add(name)

    # output bytes + opcode of every defined instruction (operand lookups)
    out_bytes: dict[str, int] = {}
    opcode_of: dict[str, str] = {}
    inst_re = re.compile(r"^(?:ROOT\s+)?%([-\w\.]+)\s*=\s*([^=]*?)\s([\w\-]+)\(")
    for lines in comps.values():
        for ln in lines:
            m = inst_re.match(ln)
            if not m:
                continue
            name, shape_seg, opcode = m.groups()
            out_bytes[name] = _hlo_shape_bytes(shape_seg)
            opcode_of[name] = opcode

    executed = {
        c for c in comps
        if c not in called_not_toplevel or c in toplevel_called
    }
    total = 0
    for comp in executed:
        for ln in comps[comp]:
            m = inst_re.match(ln)
            if not m:
                continue
            name, shape_seg, opcode = m.groups()
            if opcode in _HLO_NO_WRITE_OPS:
                continue  # no write to bill; reads of these are billed below
            # strip attribute tails so calls=/metadata= names aren't
            # mistaken for operands
            body = ln.split(", metadata=")[0]
            body = re.sub(r"(calls|to_apply|body|condition|true_computation|"
                          r"false_computation)=%[-\w\.]+", "", body)
            body = re.sub(r"branch_computations=\{[^}]*\}", "", body)
            ops = re.findall(r"%([-\w\.]+)", body)
            traffic = out_bytes.get(name, 0)  # the write
            for o in ops[1:]:  # ops[0] is the instruction's own name
                if opcode_of.get(o) in _HLO_TRANSPARENT_OPS:
                    continue  # alias read: underlying buffer untracked
                traffic += out_bytes.get(o, 0)
            total += traffic
    return float(total)


def _roofline_from_cost(compiled, sec_per_iter: float, n_iters: int = 1) -> dict:
    """MFU (of 197 bf16 TFLOP/s) + HBM bandwidth utilization (of 819 GB/s)
    from the compiled program's cost model. For HBM-bound models (BTS's
    DenseNet concat stacks — BASELINE.md roofline) bw_util is the number that
    says how close the program is to its own speed-of-light; MFU alone
    understates kernel quality there.

    Corrected model (VERDICT r3 weak #6 / task #8): the compiler's "bytes
    accessed" are LOGICAL — every operand+output of every op, counted even
    when XLA fuses the op into its producer and the buffer never touches
    HBM — so the raw ratio can exceed 1.0 (round-3 zoo_train: laina 1.44,
    vnl 1.29). Reported ``bw_util`` is therefore capped at 1.0; whenever the
    cap binds, the physically impossible excess is PROOF that XLA fused away
    at least (1 - 1/logical) of the logical traffic, and the uncapped value
    is kept in ``bw_util_logical`` so the record still shows it. Rows where
    the cap does not bind are unchanged (their logical bytes are an upper
    bound on traffic, so bw_util is an upper bound on true utilization)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not hasattr(ca, "get") or sec_per_iter <= 0:
        return {"mfu": 0.0, "bytes_gb": 0.0, "bw_util": 0.0}
    fl = float(ca.get("flops", 0.0)) / n_iters
    by = float(ca.get("bytes accessed", 0.0)) / n_iters
    util = by / sec_per_iter / 819e9 if by > 0 else 0.0
    out = {
        "mfu": fl / sec_per_iter / 197e12 if fl > 0 else 0.0,
        "bytes_gb": by / 1e9,
        "bw_util": min(util, 1.0),
    }
    if util > 1.0:
        out["bw_util_logical"] = util
        out["min_fused_fraction"] = 1.0 - 1.0 / util
    return out


def bench_jax_bts_steady(b: int = 128) -> tuple[float, float]:
    """Flagship BTS-DenseNet-161 512x512 eval, steady state (in-graph scan
    over distinct random batches). Returns (images/sec, roofline).

    Batch 128 is the round-4 measured throughput optimum: the r1-r3 sweeps
    stopped at 32 (184 img/s), but throughput KEEPS RISING well past it —
    184 @ b32, 218 @ b36, 241 @ b40, 258 @ b48, 265/273/282 @ b56/64/80,
    321 @ b96, **341 @ b128** (30.2% MFU), then noisy (274 @ b160,
    312 @ b192). The gain is MXU geometry, not bandwidth: the deep
    16x16-spatial dense layers present M = B*256 rows to the MXU, so
    bigger batches fill the M tiles (MFU 16.6% -> 30.2%) while bw_util
    FALLS (0.67 -> 0.47) — the "HBM-bound at b32" reading was an artifact
    of the too-small batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mono_depth_estimation_tpu.models.bts import BtsModel

    model = BtsModel(
        encoder_version="densenet161_bts", out_channels=10,
        image_residuals=True, max_depth=1.0,
    )
    init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False))
    variables = _bf16_params(
        init_fn(jax.random.PRNGKey(0), jnp.ones((1, 512, 512, 3)))
    )
    base = jax.random.uniform(jax.random.PRNGKey(0), (b, 512, 512, 3),
                              jnp.bfloat16)

    def make_run(n):
        def run(variables, base, key):
            def body(carry, k):
                x = base + jax.random.uniform(k, (), jnp.bfloat16)
                out = model.apply(variables, x, train=False)[4]
                return carry + out.sum().astype(jnp.float32), None

            total, _ = jax.lax.scan(body, jnp.float32(0),
                                    jax.random.split(key, n))
            return total

        return run

    dt, compiled, _ = _slope_time(make_run, (variables, base), n1=4, n2=12)
    return b / dt, _roofline_from_cost(compiled, dt, n_iters=1)


def bench_bts_train_steady(batch: int = 32, size=(512, 512),
                           remat: bool = False):
    """Flagship BTS-DenseNet-161 train step (silma loss + grads + AdamW) at
    512x512 in bf16 compute, steady state. Returns (images/sec, roofline,
    remat) — falls back to rematerialization and then to batch 16 if the
    activation footprint overflows the chip's HBM.

    ROUND-5 CORRECTION: rounds 2-4 measured this row via _bts_method's
    default bts_size=64 — a decoder 8x narrower than the SHIPPED flagship
    (entry() / models/bts.py / CLI default bts_size=512) — so the recorded
    91-98 img/s @ b32 overstated the real flagship. At bts_size=512 the
    b32 in-graph step needs 24.4G of the 15.75G HBM and does not compile;
    the honest flagship train numbers are re-measured by this corrected
    function (bench_extra.json bts_dn161_512_train_* carry them forward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step

    h, w = size
    method = g._bts_method(batch_size=batch, encoder="densenet161_bts",
                           bts_size=512)
    x = np.ones((batch, h, w, 4), np.float32)
    y = np.ones((batch, h, w, 10), np.float32)
    model, variables = method.init_variables(
        jax.random.PRNGKey(0), (jnp.asarray(x), jnp.asarray(y))
    )
    optimizer = method.optimizer()
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
                                jnp.float32)

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

    retry = None
    try:
        dt, compiled, _ = _slope_time(make_run, (state, base_x, base_y),
                                      n1=3, n2=9, donate=True)
    except Exception as e:
        # decide the retry INSIDE the handler but recurse OUTSIDE it: while
        # the except block is active the exception's traceback pins this
        # frame's state/base device arrays in HBM, and the retry then OOMs
        # at execute time even when its own footprint fits (observed
        # round 5, tools/bench_bf16_train.py had the same bug)
        if _is_oom(e):
            if not remat:
                retry = (batch, True)
            elif batch > 16:
                retry = (16, False)
        if retry is None:
            raise
    if retry is not None:
        del state, base_x, base_y, train_step, model, variables, optimizer
        import gc

        gc.collect()
        return bench_bts_train_steady(retry[0], size, remat=retry[1])
    return batch / dt, _roofline_from_cost(compiled, dt, n_iters=1), remat


def _steady_eval(model, size, batch, train_kw=True):
    """Generic steady-state eval fwd: in-graph scan over distinct batches
    (base + per-iter scalar), bf16 weights, two-point slope timing.
    Returns (images/sec, roofline)."""
    import jax
    import jax.numpy as jnp

    apply = (lambda v, x: model.apply(v, x, train=False)) if train_kw else (
        lambda v, x: model.apply(v, x))
    init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False)
                      if train_kw else model.init(r, xx))
    variables = _bf16_params(
        init_fn(jax.random.PRNGKey(0), jnp.ones((1, *size, 3)))
    )
    base = jax.random.uniform(jax.random.PRNGKey(0), (batch, *size, 3),
                              jnp.bfloat16)

    def make_run(n):
        def run(variables, base, key):
            def body(carry, k):
                x = base + jax.random.uniform(k, (), jnp.bfloat16)
                out = apply(variables, x)
                tot = sum(o.astype(jnp.float32).sum()
                          for o in jax.tree_util.tree_leaves(out))
                return carry + tot, None

            total, _ = jax.lax.scan(body, jnp.float32(0),
                                    jax.random.split(key, n))
            return total

        return run

    dt, compiled, _ = _slope_time(make_run, (variables, base))
    return batch / dt, _roofline_from_cost(compiled, dt, n_iters=1)



def _is_oom(e) -> bool:
    """HBM OOM arrives as RESOURCE_EXHAUSTED locally but as INTERNAL
    'Ran out of memory in memory space hbm' through the remote-compile
    relay; treat both as the remat-fallback trigger. The relay can also
    swallow the OOM detail entirely and surface only 'HTTP 500:
    tpu_compile_helper subprocess exit code 1' (observed round 5 on the
    24.4G flagship b32 program) — treat that as possibly-OOM too: the
    worst case for a transient relay error is one redundant fallback
    attempt."""
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "tpu_compile_helper subprocess exit" in s)

def bench_zoo(deadline: float | None = None) -> dict:
    """Eval fwd throughput for the REST of the model zoo, each at its
    method's reference eval size (methods/*.output_size; DORN and BTS have
    dedicated benches). One entry per reference model family. Models whose
    turn comes after ``deadline`` (time.monotonic) are skipped and recorded
    as {"skipped": "budget"}."""
    from mono_depth_estimation_tpu.models.eigen import Eigen
    from mono_depth_estimation_tpu.models.fcrn import FCRN
    from mono_depth_estimation_tpu.models.midas import MidasNet
    from mono_depth_estimation_tpu.models.mynet import MyModel
    from mono_depth_estimation_tpu.models.sharpnet import SharpNet
    from mono_depth_estimation_tpu.models.vnl import MetricDepthModel

    # Batches are the round-4 sweep optima (BASELINE.md "batch-geometry
    # sweep"): throughput rises far past the r1-r3 reference-style batches
    # because larger B fills the MXU M-tiles on the deep low-spatial
    # layers — MiDaS 223.6 @ b16 -> 448.9 @ b128 (+101%), VNL 233.7 ->
    # 355.0, MyNet 511.5 -> 725.8, BTS 188 -> 341 (bench_jax_bts_steady).
    # Each model's curve was swept to its peak (the next size up LOSES:
    # midas 420 @ b192, mynet 576 @ b192, fcrn 2723 @ b192, eigen
    # 1202 @ b128; vnl b192 exceeds the compiler's resources).
    zoo = {
        "eigen_240x320": (lambda: Eigen(), (240, 320), 64),
        "fcrn50_upproj_240x320": (
            lambda: FCRN(layers=50, decoder="upproj",
                         output_size=(120, 160), out_channels=1),
            (240, 320), 128),
        "midas_384x384": (lambda: MidasNet(), (384, 384), 128),
        "vnl_385x385": (lambda: MetricDepthModel(), (385, 385), 128),
        "sharpnet_240x320": (
            lambda: SharpNet(use_depth=True, use_normals=True,
                             use_boundary=True), (240, 320), 128),
        "mynet_384x384": (lambda: MyModel(input_size=(384, 384)),
                          (384, 384), 128),
    }
    out = {}
    for name, (build, size, batch) in zoo.items():
        if deadline is not None and time.monotonic() >= deadline:
            out[name] = {"skipped": "budget"}
            continue
        try:
            ips, roof = _steady_eval(build(), size, batch)
            out[name] = {"images_per_sec": round(ips, 1), "batch": batch,
                         "mfu": round(roof["mfu"], 4),
                         "hbm_bw_util": round(roof["bw_util"], 4)}
        except Exception as e:  # keep the sweep going; record the failure
            out[name] = {"error": str(e)[:200]}
    return out


def _steady_train_method(name, size, batch, x_ch=3, y_ch=1, extra_argv=(),
                         remat=False):
    """Generic steady-state TRAIN-step bench (loss + grads + optimizer
    update) for one zoo method at its reference train geometry, with
    parser-default method args — the train-side twin of _steady_eval.
    Batches vary per scan iteration (base + scalar) so XLA cannot CSE
    them; two-point slope timing. Falls back to rematerialization on
    RESOURCE_EXHAUSTED."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.methods import get_method
    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step

    parser, cmds = build_parser("bench")
    args = parse_args_into_namespaces(
        parser, cmds, ["--name", "bench", name, *extra_argv]
    )
    derive_globals(args)
    method = get_method(args)
    h, w = size

    def make_batch(x, y):
        if name == "vnl":  # dict protocol (methods/vnl.py val/train batches)
            return {
                "A": x, "B": y,
                "invalid_side": jnp.zeros((batch, 4), jnp.int32),
                "ratio": jnp.ones((batch,), jnp.float32),
            }
        return (x, y)

    host = make_batch(
        jnp.ones((batch, h, w, x_ch), jnp.float32),
        jnp.full((batch, h, w, y_ch), 0.5, jnp.float32),
    )
    model, variables = method.init_variables(jax.random.PRNGKey(0), host)
    optimizer = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(variables["params"]),
    )
    train_step = make_train_step(method, model, optimizer, jnp.bfloat16,
                                 remat=remat)
    base_x = jax.random.uniform(jax.random.PRNGKey(3), (batch, h, w, x_ch),
                                jnp.float32)
    base_y = jax.random.uniform(jax.random.PRNGKey(4), (batch, h, w, y_ch),
                                jnp.float32, minval=0.1, maxval=1.0)

    def make_run(n):
        def run(state, base_x, base_y, key):
            def body(carry, k):
                st, _ = carry
                kc, ks = jax.random.split(k)
                c = jax.random.uniform(kc, (), jnp.float32)
                st, loss, *_ = train_step(
                    st, make_batch(base_x + c, base_y + c), ks
                )
                return (st, loss), None

            (state, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jax.random.split(key, n)
            )
            return state, loss

        return run

    do_retry = False
    try:
        dt, compiled, _ = _slope_time(make_run, (state, base_x, base_y),
                                      n1=3, n2=9, donate=True)
    except Exception as e:
        # retry OUTSIDE the handler: the live exception pins this frame's
        # device arrays (see bench_bts_train_steady's note)
        do_retry = not remat and _is_oom(e)
        if not do_retry:
            raise
    if do_retry:
        del state, base_x, base_y, train_step, model, variables, optimizer
        import gc

        gc.collect()
        return _steady_train_method(name, size, batch, x_ch, y_ch,
                                    extra_argv, remat=True)
    return batch / dt, _roofline_from_cost(compiled, dt, n_iters=1), remat


# (method argv name, train size, batch = the method's CLI default,
#  x channels, y channels) — reference train geometry per method
# (methods/*.output_size / add_model_specific_args defaults; SURVEY §2.2)
ZOO_TRAIN = {
    "eigen": ((240, 320), 8, 3, 1),
    "laina": ((240, 320), 16, 3, 20),   # 20ch stdepth head (FCRN.py:361);
                                        # stdepthmulti feeds 3ch rgb
                                        # (data/stdepth.py get_raw)
    "bts": ((512, 512), 8, 4, 10),      # flagship; b32 row is dedicated
    "dorn": ((257, 353), 8, 3, 1),
    "midas": ((384, 384), 8, 3, 1),
    "vnl": ((385, 385), 8, 3, 1),       # dict batch (crop_size 385)
    "my": ((384, 384), 16, 3, 1),
    "sharpnet": ((240, 320), 16, 3, 1),
}


def bench_zoo_train(deadline: float | None = None) -> dict:
    """Train-step throughput for EVERY method family at its reference train
    geometry and default batch size (VERDICT r2 task 6: training is the
    product, eval is the demo). Models past ``deadline`` are skipped."""
    out = {}
    for name, (size, batch, x_ch, y_ch) in ZOO_TRAIN.items():
        if deadline is not None and time.monotonic() >= deadline:
            out[f"{name}_{size[0]}x{size[1]}"] = {"skipped": "budget"}
            continue
        try:
            ips, roof, remat = _steady_train_method(
                name, size, batch, x_ch=x_ch, y_ch=y_ch
            )
            row = {
                "images_per_sec": round(ips, 1), "batch": batch,
                "mfu": round(roof["mfu"], 4),
                "hbm_bw_util": round(roof["bw_util"], 4),
                "remat": remat,
            }
            # bound pair for capped rows (VERDICT r4 task #8): the logical
            # ratio and the fused-fraction lower bound it implies
            if "bw_util_logical" in roof:
                row["hbm_bw_util_logical"] = round(roof["bw_util_logical"], 4)
                row["min_fused_fraction"] = round(roof["min_fused_fraction"], 4)
            out[f"{name}_{size[0]}x{size[1]}"] = row
        except Exception as e:  # keep the sweep going; record the failure
            out[f"{name}_{size[0]}x{size[1]}"] = {"error": str(e)[:200]}
    return out


def bench_fed_train(batch: int = 16, size: int = 512, n_images: int = 256,
                    timed_epochs: int = 2, workers: int = 8,
                    remat: bool = False, device_aug: bool = False,
                    steps_per_dispatch: int = 1, shm: bool = False,
                    shm_copy: bool = True) -> dict:
    """END-TO-END fed training throughput for the flagship config (VERDICT
    r2 task 4): file-backed stdepthmulti data -> TorchVtkReader ->
    policies_fast cv2 aug in the Loader's thread pool -> u8/bf16 host->HBM
    transfer -> jitted train step. This is `python train.py`'s hot loop
    (train/loop.py:326-345) minus val/ckpt, timed at steady state.

    Decomposes the pipeline so a gap from the in-graph number
    (bts_dn161_512_train_images_per_sec) is attributable:
      * loader_only_ips  — host side alone (read + aug + stack), no device
      * transfer_mb_per_batch / transfer_mb_s — device_put bandwidth alone
      * fed_ips          — the real overlapped loop

    Default batch is 16, the largest production-feasible batch at 512^2:
    the standalone b32 train step needs 24.4G of the v5e's 15.75G HBM at
    the shipped bts_size=512 decoder (measured round 5; remat does not
    save it — recompute adds copies to an already bandwidth-bound step).
    The in-graph b16 comparison point is 48.3 img/s (BASELINE.md flagship
    train row; the 86.9 quoted in rounds 3-4 was accidentally the
    bts_size=64 reduced decoder — round-5 correction).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.data.loader import Loader
    from mono_depth_estimation_tpu.data.stdepth import get_stdepthmulti_dataset
    from mono_depth_estimation_tpu.data.synthetic import materialize_stdepth_dir
    from mono_depth_estimation_tpu.methods import get_method
    from mono_depth_estimation_tpu.ops.preproc import (
        UINT8_SAFE_POLICIES,
        cast_targets_host,
        quantize_rgb_u8,
    )
    from mono_depth_estimation_tpu.parallel.mesh import make_mesh, shard_batch
    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step

    # ---- file-backed dataset (materialized once, reused across runs)
    data_dir = Path(__file__).parent / ".bench_data" / f"stdepth{size}_{n_images}"
    if not (data_dir.exists() and len(list(data_dir.glob("*.pt"))) >= n_images):
        materialize_stdepth_dir(data_dir, n_train=n_images, n_val=1, n_test=1,
                                h=size, w=size)

    parser, cmds = build_parser("bench")
    args = parse_args_into_namespaces(
        parser, cmds, ["--name", "bench", "bts",
                       "--batch_size", str(batch)]
    )
    derive_globals(args)
    method = get_method(args)

    from argparse import Namespace

    from mono_depth_estimation_tpu.data.raw_cache import RawDiskCache

    ds_ns = Namespace(path=str(data_dir), single_layer=True,
                      background_depth_max=False)
    # decode-once cache, exactly as Method.build_datasets wires it
    train_ds = RawDiskCache(get_stdepthmulti_dataset(
        ds_ns, "train", method.output_size(), method.resize()
    ))
    if device_aug:
        # --device_aug path: raw samples out, on-chip augmentation,
        # zero-copy mmap reads of the concatenated targets
        from mono_depth_estimation_tpu.ops.preproc import raw_collate

        train_t = raw_collate
        train_ds.concat_gt = True
        train_ds.set_gt_dtype(jnp.bfloat16)
    else:
        train_t, _, _ = method.policy_fns()
        if method.POLICY in UINT8_SAFE_POLICIES:
            train_t = quantize_rgb_u8(train_t)
    # same host-side compression the Trainer applies (train/loop._loaders)
    train_t = cast_targets_host(train_t, jnp.bfloat16)
    loader = Loader(train_ds, batch, shuffle=True, transform=train_t,
                    num_workers=workers, seed=0)
    if shm:
        # VERDICT r3 task #5: the whole producer in its own OS process,
        # ready batches over a shared-memory ring (data/shm_loader.py) —
        # the TPU process's core stays with the tunnel client. The child
        # KEEPS the loader's internal worker/prefetch pipeline (zeroing it
        # measured 2-4x slower: the child then produces synchronously and
        # decode no longer overlaps the shm writes).
        from mono_depth_estimation_tpu.data.shm_loader import ShmLoader

        loader = ShmLoader(loader, slots=3, copy=shm_copy)
    n_batches = len(loader)

    # ---- host-only throughput (loader + aug + stack, device untouched)
    _ = [b for b, _ in loader]  # warm the page cache
    t0 = time.perf_counter()
    count = 0
    for b_, _m in loader:
        count += _m.sum()
    loader_only_ips = count / (time.perf_counter() - t0)

    # ---- the real fed loop
    mesh = make_mesh()
    sample_batch, _ = next(iter(loader))
    init_batch = jax.tree.map(jnp.asarray, sample_batch)
    aug_fn = None
    if device_aug:
        from mono_depth_estimation_tpu.ops.device_aug import (
            make_device_augment,
        )

        x_raw, y_raw = sample_batch
        out_hw = tuple(method.output_size())
        aug_fn = make_device_augment(
            method.POLICY, tuple(x_raw.shape[1:3]), out_hw, method.resize()
        )
        init_batch = (
            jnp.zeros((batch, *out_hw, x_raw.shape[-1]), jnp.float32),
            jnp.zeros((batch, *out_hw, y_raw.shape[-1]), jnp.float32),
        )
    model, variables = method.init_variables(jax.random.PRNGKey(0), init_batch)
    optimizer = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(variables["params"]),
    )
    if steps_per_dispatch > 1:
        from mono_depth_estimation_tpu.train.steps import (
            make_fused_train_step,
        )

        assert len(loader) % steps_per_dispatch == 0
        fused_step = make_fused_train_step(
            method, model, optimizer, steps_per_dispatch, jnp.bfloat16,
            remat=remat, device_aug=aug_fn,
        )

        def run_epoch(state, rng):
            group = []
            loss = None
            for b_, _m in loader:
                group.append(b_)
                if len(group) == steps_per_dispatch:
                    kb = jax.tree.map(lambda *xs: np.stack(xs), *group)
                    group = []
                    rng, k = jax.random.split(rng)
                    state, losses, *_ = fused_step(
                        state, shard_batch(kb, mesh, axis=1), k
                    )
                    loss = losses[-1]
            return state, rng, loss

    else:
        def run_epoch(state, rng):
            loss = None
            for b_, _m in loader:
                rng, k = jax.random.split(rng)
                state, loss, *_ = train_step(state, shard_batch(b_, mesh), k)
            return state, rng, loss

    train_step = make_train_step(method, model, optimizer, jnp.bfloat16,
                                 remat=remat, device_aug=aug_fn)

    # transfer bandwidth alone (the batch the loader actually emits)
    dbatch = shard_batch(sample_batch, mesh)
    jax.block_until_ready(dbatch)
    nbytes = sum(np.asarray(x).nbytes
                 for x in jax.tree_util.tree_leaves(sample_batch))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(shard_batch(sample_batch, mesh))
    transfer_s = (time.perf_counter() - t0) / 3

    rng = jax.random.PRNGKey(1)
    # warm epoch: compile + page cache. Unlike the in-graph bench (which
    # folds the batch into the scan body), the fed step holds the incoming
    # device batch alongside the activations, so b32 @512^2 can exceed HBM
    # where the in-graph form fits — fall back to remat exactly like
    # _steady_train_method (a production user at this batch needs --remat).
    try:
        state, rng, loss = run_epoch(state, rng)
        jax.block_until_ready(loss)
    except Exception as e:
        if not remat and _is_oom(e):
            return bench_fed_train(batch, size, n_images, timed_epochs,
                                   workers, remat=True,
                                   device_aug=device_aug,
                                   steps_per_dispatch=steps_per_dispatch,
                                   shm=shm, shm_copy=shm_copy)
        raise

    import resource

    ru0s = resource.getrusage(resource.RUSAGE_SELF)
    ru0c = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.perf_counter()
    n_done = 0
    for _ in range(timed_epochs):
        state, rng, loss = run_epoch(state, rng)
        n_done += batch * len(loader)
    jax.block_until_ready(loss)
    wall = time.perf_counter() - t0
    fed_ips = n_done / wall
    ru1s = resource.getrusage(resource.RUSAGE_SELF)
    ru1c = resource.getrusage(resource.RUSAGE_CHILDREN)
    # per-process CPU accounting over the timed window (VERDICT r3 task #5
    # "measured proof"): on this 1-core host, cpu_total ~ wall means the
    # core never idles — the pipeline is CPU-serialized, not stalled, and
    # no producer-placement scheme can beat 1/(total CPU per image)
    cpu_self = (ru1s.ru_utime - ru0s.ru_utime) + (ru1s.ru_stime - ru0s.ru_stime)
    cpu_child = (ru1c.ru_utime - ru0c.ru_utime) + (ru1c.ru_stime - ru0c.ru_stime)

    return {
        "fed_images_per_sec": round(float(fed_ips), 2),
        "loader_only_images_per_sec": round(float(loader_only_ips), 2),
        "transfer_mb_per_batch": round(nbytes / 1e6, 1),
        "transfer_mb_s": round(nbytes / transfer_s / 1e6, 1),
        "batch": batch, "n_images": n_images, "workers": workers,
        "steps_per_epoch": n_batches, "remat": remat,
        "steps_per_dispatch": steps_per_dispatch,
        "shm_producer": shm, "shm_copy": shm_copy,
        "wall_s": round(wall, 1),
        "cpu_self_s": round(cpu_self, 1),
        "cpu_children_s": round(cpu_child, 1),
        "cpu_over_wall": round((cpu_self + cpu_child) / wall, 3),
    }


def bench_jax_bts() -> float:
    import jax
    import jax.numpy as jnp

    from mono_depth_estimation_tpu.models.bts import BtsModel

    model = BtsModel(
        encoder_version="densenet161_bts", out_channels=10,
        image_residuals=True, max_depth=1.0,
    )
    init_fn = jax.jit(lambda r, xx: model.init(r, xx, train=False))
    variables = _bf16_params(
        init_fn(jax.random.PRNGKey(0), jnp.ones((1, 512, 512, 3)))
    )
    iters = 6
    xs = [
        jax.random.uniform(jax.random.PRNGKey(i), (BATCH, 512, 512, 3), jnp.bfloat16)
        for i in range(1 + iters)
    ]

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)[4]

    import numpy as np

    _ = np.asarray(forward(variables, xs[0]).sum())
    times = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        _ = np.asarray(forward(variables, x).sum())
        times.append(time.perf_counter() - t0)
    return BATCH / float(np.median(times))


def bench_train_step() -> float:
    """Full BTS train step (loss+grads+AdamW update) images/sec, steady
    state (in-graph scan over distinct random batches)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g
    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step

    b, h, w = 8, 128, 160
    method = g._bts_method(batch_size=b)
    import numpy as np

    x = np.ones((b, h, w, 4), np.float32)
    y = np.ones((b, h, w, 10), np.float32)
    model, variables = method.init_variables(
        jax.random.PRNGKey(0), (jnp.asarray(x), jnp.asarray(y))
    )
    optimizer = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(variables["params"]),
    )
    train_step = make_train_step(method, model, optimizer, jnp.bfloat16)
    base_x = jax.random.uniform(jax.random.PRNGKey(3), (b, h, w, 4),
                                jnp.float32)
    base_y = jax.random.uniform(jax.random.PRNGKey(4), (b, h, w, 10),
                                jnp.float32)

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

    dt, _, _ = _slope_time(make_run, (state, base_x, base_y), n1=5, n2=25,
                           donate=True)
    return b / dt


def bench_torch_cpu_dorn() -> float:
    """The reference implementation itself (vendored torch) on CPU."""
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, "/root/reference")
    from argparse import Namespace

    from network import Dorn

    args = Namespace(
        input_size=SHAPE, kernel_size=16, ord_num=68, alpha=0.001, beta=1.0,
        discretization="SID", pretrained=0, pyramid=[4, 8, 12], batch_norm=0,
        dropout=0.5,
    )
    model = Dorn.DORN(args).eval()
    x = torch.randn(2, 3, *SHAPE)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return x.shape[0] / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--skip-extra", action="store_true")
    ap.add_argument("--extra-budget", type=float,
                    default=float(os.environ.get("MDE_BENCH_EXTRA_BUDGET", 900)),
                    help="wall-clock seconds allowed for the extra sections "
                         "(after the headline prints); sections past the "
                         "budget are skipped and recorded as such")
    args = ap.parse_args()

    if BASELINE_FILE.exists() and not args.remeasure_baseline:
        baseline = json.loads(BASELINE_FILE.read_text())["torch_cpu_images_per_sec"]
    else:
        try:
            baseline = bench_torch_cpu_dorn()
            BASELINE_FILE.write_text(json.dumps({
                "torch_cpu_images_per_sec": baseline,
                "config": "reference DORN (vendored torch) eval fwd 257x353 CPU",
            }))
        except Exception as e:
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = None

    # headline: steady-state on-chip throughput (in-graph scan over distinct
    # inputs, fully synced) — per-call timing is dominated by the tunnel's
    # ~30 ms round trip and recorded in extras instead. Batch 16 remains the
    # sweet spot after the pre-resize ordinal deinterleave (slope-protocol
    # sweep: 645.8 @ b8, 637.7 @ b16 — a tie within noise — 578.7 @ b32;
    # profile_dorn.json).
    ips = bench_jax_dorn_steady(batch=16)

    # DRIVER CONTRACT (VERDICT r3 weak #1): the one line the driver exists to
    # capture prints IMMEDIATELY after the headline measurement, flushed,
    # BEFORE any extra section can compile, fail, or eat the timeout. Round 3
    # measured the headline and then died in 45 min of cold-cache extras.
    print(json.dumps({
        "metric": "DORN 257x353 eval images/sec/chip (vs reference torch-CPU)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 2) if baseline else None,
    }), flush=True)

    if not args.skip_extra:
        _run_extras(budget_s=args.extra_budget)


def _run_extras(budget_s: float) -> None:
    """Non-headline benchmark sections, each guarded by a wall-clock budget.

    A section only STARTS if time remains; a started section runs to
    completion (XLA compile can't be preempted). Skipped sections are
    recorded in bench_extra.json["skipped"] so a partial record is explicit,
    and previous values for skipped sections survive (seeded from the
    existing file)."""
    deadline = time.monotonic() + budget_s
    # seed from the existing record so one-off results (fed_train,
    # tools/run_*_bench.py) survive driver reruns of this script
    extra = {}
    if EXTRA_FILE.exists():
        try:
            extra = json.loads(EXTRA_FILE.read_text())
        except Exception:
            extra = {}
    skipped = []

    def timed_out(name: str) -> bool:
        if time.monotonic() >= deadline:
            skipped.append(name)
            return True
        return False

    def flush_record():
        extra["skipped"] = skipped
        EXTRA_FILE.write_text(json.dumps(extra))

    if not timed_out("dorn_per_call"):
        try:
            extra["dorn_per_call_images_per_sec"] = round(bench_jax_dorn(), 2)
        except Exception:
            pass
        flush_record()
    if not timed_out("bts_eval"):
        try:
            ips_bts, rf_bts = bench_jax_bts_steady()
            extra["bts_dn161_512_eval_images_per_sec"] = round(ips_bts, 2)
            extra["bts_dn161_512_eval_mfu"] = round(rf_bts["mfu"], 4)
            extra["bts_dn161_512_eval_hbm_bw_util"] = round(rf_bts["bw_util"], 4)
        except Exception as e:
            extra["bts_eval_error"] = str(e)[:300]
        flush_record()
    if not timed_out("bts_train"):
        try:
            ips_tr, rf_tr, remat = bench_bts_train_steady()
            extra["bts_dn161_512_train_images_per_sec"] = round(ips_tr, 2)
            extra["bts_dn161_512_train_mfu"] = round(rf_tr["mfu"], 4)
            extra["bts_dn161_512_train_hbm_bw_util"] = round(rf_tr["bw_util"], 4)
            extra["bts_dn161_512_train_remat"] = remat
        except Exception as e:
            extra["bts_train_error"] = str(e)[:300]
        flush_record()
    if not timed_out("bts_small_train"):
        try:
            extra["bts_small_train_step_images_per_sec"] = round(
                bench_train_step(), 2
            )
        except Exception:
            pass
        flush_record()
    def merge_zoo(key: str, fresh: dict) -> None:
        """Per-model merge: a fresh good measurement replaces the old one;
        a skipped/errored rerun KEEPS the previous good entry (annotated),
        so budget-truncated reruns never erase data (ADVICE r3 #3)."""
        old = extra.get(key) or {}
        merged = dict(old)
        for name, row in fresh.items():
            if ("images_per_sec" in row) or name not in old:
                merged[name] = row
            else:  # skipped or error over a previously good entry
                merged[name] = {**old[name], "stale": row.get("skipped", "error")}
        extra[key] = merged

    if not timed_out("zoo_eval"):
        try:
            merge_zoo("zoo_eval", bench_zoo(deadline=deadline))
        except Exception as e:
            extra["zoo_error"] = str(e)[:300]
        flush_record()
    if not timed_out("zoo_train"):
        try:
            merge_zoo("zoo_train", bench_zoo_train(deadline=deadline))
        except Exception as e:
            extra["zoo_train_error"] = str(e)[:300]
        flush_record()
    flush_record()


if __name__ == "__main__":
    main()
