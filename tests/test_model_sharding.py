"""Tensor-parallel Dense sharding over a 2-D ('data','model') mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from mono_depth_estimation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
)
from mono_depth_estimation_tpu.parallel.model_sharding import (
    EIGEN_FC_RULES,
    shard_params,
    sharding_for,
)


class _EigenHeadLike(nn.Module):
    """Same structure/names as EigenScale1's FC block (Dense_0/Dense_1)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(512)(x)   # Dense_0: column-parallel
        x = nn.relu(x)
        return nn.Dense(128)(x)  # Dense_1: row-parallel


def test_rule_matching():
    mesh = make_mesh(n_data=4, n_model=2)
    s = sharding_for(("EigenScale1_0", "Dense_0", "kernel"), mesh, EIGEN_FC_RULES)
    assert s.spec == P(None, "model")
    s = sharding_for(("SomethingElse", "kernel"), mesh, EIGEN_FC_RULES)
    assert s.spec == P()


def test_megatron_dense_pair_matches_replicated():
    """Sharded (4 data x 2 model) forward+grad == single-device result."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = _EigenHeadLike()
    x = np.random.default_rng(0).normal(size=(8, 96)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    rules = [
        (("Dense_0", "kernel"), P(None, "model")),
        (("Dense_0", "bias"), P("model")),
        (("Dense_1", "kernel"), P("model", None)),
    ]

    def loss(params, x):
        return jnp.square(model.apply({"params": params}, x)).mean()

    ref_l, ref_g = jax.value_and_grad(loss)(params, jnp.asarray(x))

    sharded_params = shard_params(params, mesh, rules)
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    with mesh:
        l, g = jax.jit(jax.value_and_grad(loss))(sharded_params, xb)
    assert np.isclose(float(l), float(ref_l), rtol=1e-5)
    for path in [("Dense_0", "kernel"), ("Dense_1", "kernel")]:
        a = np.asarray(g[path[0]][path[1]])
        b = np.asarray(ref_g[path[0]][path[1]])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # the kernel really is distributed over the model axis
    k0 = sharded_params["Dense_0"]["kernel"]
    assert k0.sharding.spec == P(None, "model")
