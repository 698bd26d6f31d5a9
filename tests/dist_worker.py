"""Subprocess worker for the multi-process --distributed smoke test.

Launched by tests/test_distributed.py as ``python dist_worker.py <proc_id>
<nprocs> <port> <out.json>``. Each process owns ``8 // nprocs`` forced CPU
devices; nprocs == 1 is the single-process reference run (no distributed
init), nprocs == 2 exercises the production rendezvous path
(cli/common.maybe_init_distributed via the JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID env triplet — the analogue of the
reference's Lightning DDP env:// init, reference train.py:170 gpus arg).

Every process builds the SAME deterministic global batch and contributes its
process-local slice via jax.make_array_from_process_local_data, then runs one
jitted BTS train step over the global ('data',) mesh. Loss and the updated
parameter global-norm are written to out.json by process 0 — the parent
asserts the 2-process values match the 1-process reference.
"""

import argparse
import json
import os
import sys

proc_id, nprocs, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
n_local = 8 // nprocs
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if nprocs > 1:
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)
    from mono_depth_estimation_tpu.cli.common import maybe_init_distributed

    maybe_init_distributed(
        argparse.Namespace(globals=argparse.Namespace(distributed=True))
    )
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == n_local

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def barrier(name: str, timeout_s: int = 900) -> None:
    """Coordination-service (KV, not Gloo) barrier. The Gloo rendezvous for a
    collective gives peers only ~30 s to arrive (GetKeyValue timeout); on a
    loaded host a compile-cache hit/miss asymmetry between workers exceeds
    that easily (round-2 verdict). Compiling AOT and barriering here means
    both processes enter every Gloo collective within milliseconds."""
    if nprocs > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_s * 1000)

import __graft_entry__ as g  # noqa: E402
from mono_depth_estimation_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
)
from mono_depth_estimation_tpu.train.state import TrainState  # noqa: E402
from mono_depth_estimation_tpu.train.steps import make_train_step  # noqa: E402

assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_mesh(n_data=8)
method = g._bts_method(batch_size=8)

b, h, w = 8, 64, 64
rng = np.random.default_rng(0)
x = rng.uniform(0, 1, (b, h, w, 4)).astype(np.float32)
y = rng.uniform(0, 1, (b, h, w, 10)).astype(np.float32)

model, variables = method.init_variables(
    jax.random.PRNGKey(0), (jnp.asarray(x[:1]), jnp.asarray(y[:1]))
)
optimizer = method.optimizer()
state = TrainState(
    step=jnp.zeros((), jnp.int32),
    params=variables["params"],
    batch_stats=variables.get("batch_stats"),
    opt_state=optimizer.init(variables["params"]),
)
train_step = make_train_step(method, model, optimizer, compute_dtype=None)

# each process contributes its local rows of the global batch
sharding = batch_sharding(mesh)
lo, hi = proc_id * (b // nprocs), (proc_id + 1) * (b // nprocs)
batch = tuple(
    jax.make_array_from_process_local_data(sharding, a[lo:hi], (b,) + a.shape[1:])
    for a in (x, y)
)

with mesh:
    step_key = jax.random.PRNGKey(1)
    # AOT-compile the heavy program BEFORE its Gloo collectives run, then
    # align the processes; execution skew at the collective is then only ms.
    train_step_c = train_step.lower(state, batch, step_key).compile()
    barrier("train_step_compiled")
    state, loss, *_ = train_step_c(state, batch, step_key)
    loss = float(jax.device_get(loss.addressable_data(0)))  # sync point
    barrier("train_step_done")
    sq = jax.jit(
        lambda p: sum(jnp.sum(jnp.square(a)) for a in jax.tree.leaves(p)),
        out_shardings=NamedSharding(mesh, P()),
    )(state.params)
    pnorm = float(np.sqrt(jax.device_get(sq.addressable_data(0))))

assert np.isfinite(loss) and np.isfinite(pnorm)
if proc_id == 0:
    with open(out_path, "w") as f:
        json.dump({"loss": loss, "pnorm": pnorm}, f)
print(f"proc{proc_id}/{nprocs}: loss={loss:.6f} pnorm={pnorm:.6f}", flush=True)
