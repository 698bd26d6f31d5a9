"""Pipeline parallelism (parallel/pipeline.py).

The GPipe rotating schedule must be numerically identical to running the
stage stack sequentially — forward AND backward (the schedule is used for
pipelined training). Verified on a toy stage and on the production
BottleneckBlock with DORN's layer3 configuration (dilated, stride 1 —
/root/reference/network/Dorn.py:230-285), width-reduced for test speed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mono_depth_estimation_tpu.parallel.mesh import make_mesh
from mono_depth_estimation_tpu.parallel.pipeline import (
    merge_microbatches,
    pipeline_apply,
    sequential_apply,
    split_microbatches,
    stack_stage_params,
)


def _toy_setup(n_stages=4, feat=16, m_micro=5, mb=3, seed=0):
    rng = np.random.default_rng(seed)
    per_stage = [
        {
            "w": jnp.asarray(rng.normal(0, 0.5, (feat, feat)), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.1, (feat,)), jnp.float32),
        }
        for _ in range(n_stages)
    ]
    stage_vars = stack_stage_params(per_stage)
    x = jnp.asarray(rng.normal(0, 1, (m_micro, mb, feat)), jnp.float32)
    stage_fn = lambda p, h: jnp.tanh(h @ p["w"] + p["b"])
    return stage_fn, stage_vars, x


def test_pipeline_forward_matches_sequential():
    mesh = make_mesh(n_data=2, n_model=4)
    stage_fn, stage_vars, x = _toy_setup(n_stages=4)
    got = jax.jit(
        lambda v, xx: pipeline_apply(stage_fn, v, xx, mesh)
    )(stage_vars, x)
    want = sequential_apply(stage_fn, stage_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_grads_match_sequential():
    """The schedule transposes correctly: pipelined training's gradients
    equal the sequential model's, for both params and input."""
    mesh = make_mesh(n_data=2, n_model=4)
    stage_fn, stage_vars, x = _toy_setup(n_stages=4)

    def loss_pipe(v, xx):
        return jnp.sum(pipeline_apply(stage_fn, v, xx, mesh) ** 2)

    def loss_seq(v, xx):
        return jnp.sum(sequential_apply(stage_fn, v, xx) ** 2)

    lp, gp = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(
        stage_vars, x
    )
    ls, gs = jax.value_and_grad(loss_seq, argnums=(0, 1))(stage_vars, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_real_bottleneck_stack():
    """4 pipeline stages of the production BottleneckBlock in DORN's layer3
    shape (stride 1, dilation 2, no downsample; width reduced 256->16 for
    CI speed) — eval forward equals the sequential stack."""
    from mono_depth_estimation_tpu.models.encoders.resnet import (
        BottleneckBlock,
    )

    mesh = make_mesh(n_data=2, n_model=4)
    block = BottleneckBlock(planes=16, stride=1, dilation=2, downsample=False)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (2, 8, 10, 64)), jnp.float32)

    per_stage = []
    for s in range(4):
        v = dict(block.init(jax.random.PRNGKey(s), x0, train=False))
        # non-trivial running stats so eval BN actually transforms
        v["batch_stats"] = jax.tree.map(
            lambda a: a + jnp.asarray(
                rng.uniform(0.1, 0.5, a.shape), a.dtype),
            v["batch_stats"],
        )
        per_stage.append(v)
    stage_vars = stack_stage_params(per_stage)

    batch = jnp.asarray(rng.normal(0, 1, (8, 8, 10, 64)), jnp.float32)
    x = split_microbatches(batch, 4)
    stage_fn = lambda v, h: block.apply(v, h, train=False)

    got = jax.jit(
        lambda v, xx: pipeline_apply(stage_fn, v, xx, mesh)
    )(stage_vars, x)
    want = sequential_apply(stage_fn, stage_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    assert merge_microbatches(got).shape == batch.shape


def test_microbatch_split_merge_roundtrip():
    x = {"a": jnp.arange(24.0).reshape(6, 4)}
    m = split_microbatches(x, 3)
    assert m["a"].shape == (3, 2, 4)
    y = merge_microbatches(m)
    np.testing.assert_array_equal(np.asarray(y["a"]), np.asarray(x["a"]))


def test_pipeline_rejects_wrong_stage_count():
    mesh = make_mesh(n_data=2, n_model=4)
    stage_fn, stage_vars, x = _toy_setup(n_stages=3)
    with pytest.raises(AssertionError, match="stage_vars leading axis"):
        pipeline_apply(stage_fn, stage_vars, x, mesh)
