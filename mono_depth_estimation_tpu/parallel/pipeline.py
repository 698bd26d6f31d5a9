"""Pipeline parallelism: a GPipe microbatch schedule over a mesh axis.

The reference has no pipeline (or any) model parallelism (SURVEY §2.8:
Lightning DDP only). This is the TPU-native scaling extension for models
whose *depth* outgrows one chip: a homogeneous stack of blocks — e.g. the
22 identical bottleneck blocks of DORN's dilated ResNet-101 layer3
(/root/reference/network/Dorn.py:230-285, the FLOPs bulk of the backbone)
— is split into S stages laid out along a mesh axis, and microbatches
stream through the stages in the classic rotating-pipeline pattern:
``shard_map`` over the stage axis, one ``lax.ppermute`` hop per tick, a
``lax.scan`` of M + S - 1 ticks (M full ticks + S - 1 bubble ticks). All
communication is neighbor-to-neighbor over ICI; XLA overlaps the permute
with the next tick's compute.

Constraints (asserted):
* every stage maps activations to the SAME shape/dtype (iso-shape stages —
  true for any residual-block stack at constant resolution);
* stage parameters are homogeneous so they stack on a leading stage axis
  (true for torchvision-style ResNet stages past each stage's first block).

The schedule is differentiable — jax transposes the scan/ppermute, so the
same code serves pipelined training (grads match the sequential model;
tests/test_pipeline.py pins both directions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def split_microbatches(x, n_micro: int):
    """(B, ...) -> (n_micro, B // n_micro, ...) leading microbatch axis."""

    def split(a):
        assert a.shape[0] % n_micro == 0, (
            f"batch {a.shape[0]} not divisible into {n_micro} microbatches"
        )
        return a.reshape(n_micro, a.shape[0] // n_micro, *a.shape[1:])

    return jax.tree.map(split, x)


def merge_microbatches(x):
    """Inverse of :func:`split_microbatches`."""
    return jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), x
    )


def stack_stage_params(per_stage_vars):
    """List of S homogeneous per-stage variable pytrees -> one pytree with a
    leading stage axis (shardable with P(axis) along the mesh)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *per_stage_vars)


def pipeline_apply(stage_fn, stage_vars, x, mesh: Mesh, axis: str = "model"):
    """Runs ``y_m = stage_{S-1}(... stage_0(x_m))`` for each microbatch m,
    with stage s resident on mesh-axis position s.

    Args:
        stage_fn: ``(vars_s, x) -> y`` for ONE stage; y must match x's
            shape/dtype (iso-shape pipeline).
        stage_vars: pytree whose leaves carry a leading stage axis of size
            S = mesh.shape[axis] (see :func:`stack_stage_params`).
        x: (M, mb, ...) microbatched input (see :func:`split_microbatches`);
            replicated over ``axis`` (only stage 0 reads it).
        mesh: the device mesh; ``axis`` names the pipeline axis.

    Returns (M, mb, ...) outputs, replicated over ``axis``.
    """
    n_stages = mesh.shape[axis]
    assert all(
        leaf.shape[0] == n_stages for leaf in jax.tree.leaves(stage_vars)
    ), f"stage_vars leading axis must be {n_stages} (mesh axis {axis!r})"
    m_micro = jax.tree.leaves(x)[0].shape[0]

    def run(local_vars, xs):
        # local slice: leading stage axis of size 1 on each device
        svars = jax.tree.map(lambda a: jnp.squeeze(a, 0), local_vars)
        idx = jax.lax.axis_index(axis)
        zero_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 ingests microbatch t (zeros during the drain bubble)
            t_in = jnp.minimum(t, m_micro - 1)
            inp = jax.tree.map(
                lambda a, z: jnp.where(
                    t < m_micro, jax.lax.dynamic_index_in_dim(
                        a, t_in, 0, keepdims=False), z),
                xs, zero_mb,
            )
            state = jax.tree.map(
                lambda i, s: jnp.where(idx == 0, i, s), inp, state
            )
            y = stage_fn(svars, state)
            # the last stage emits microbatch t - (S - 1) once it's real
            t_out = t - (n_stages - 1)
            emit = (idx == n_stages - 1) & (t_out >= 0)
            t_clip = jnp.maximum(t_out, 0)
            outbuf = jax.tree.map(
                lambda buf, v: jnp.where(
                    emit,
                    jax.lax.dynamic_update_index_in_dim(buf, v, t_clip, 0),
                    buf,
                ),
                outbuf, y,
            )
            # one ICI hop: stage s's output becomes stage s+1's next input
            nxt = jax.tree.map(
                lambda v: jax.lax.ppermute(
                    v, axis, [(i, i + 1) for i in range(n_stages - 1)]
                ),
                y,
            )
            return (nxt, outbuf), None

        outbuf0 = jax.tree.map(lambda a: jnp.zeros_like(a), xs)
        (_, outbuf), _ = jax.lax.scan(
            tick, (zero_mb, outbuf0), jnp.arange(m_micro + n_stages - 1)
        )
        # only the last stage's buffer is real; psum broadcasts it (every
        # other stage holds zeros) so the output is replicated over `axis`
        return jax.tree.map(lambda a: jax.lax.psum(a, axis), outbuf)

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_vars, x)


def sequential_apply(stage_fn, stage_vars, x):
    """The unpipelined ground truth: every stage folded over each microbatch
    (one (mb, ...) activation at a time, like the pipeline sees them).

    Used by tests and as the single-device fallback.
    """
    n_stages = jax.tree.leaves(stage_vars)[0].shape[0]
    m_micro = jax.tree.leaves(x)[0].shape[0]

    def per_micro(mb):
        y = mb
        for s in range(n_stages):
            svars = jax.tree.map(lambda a, s=s: a[s], stage_vars)
            y = stage_fn(svars, y)
        return y

    outs = [per_micro(jax.tree.map(lambda a: a[i], x)) for i in range(m_micro)]
    return jax.tree.map(lambda *ys: jnp.stack(ys), *outs)
