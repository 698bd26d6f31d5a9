"""Multi-device sharding tests on the fake 8-device CPU mesh
(SURVEY.md §4 test strategy (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_shapes():
    from mono_depth_estimation_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        pad_batch_to,
        shard_batch,
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = (np.ones((5, 4, 4, 3), np.float32), np.ones((5, 4, 4, 1), np.float32))
    padded = pad_batch_to(batch, 8)
    assert padded[0].shape[0] == 8
    sharded = shard_batch(padded, mesh)
    assert sharded[0].sharding == batch_sharding(mesh)


def test_collectives_under_shard_map():
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from mono_depth_estimation_tpu.parallel.collectives import pmean, psum
    from mono_depth_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    x = jnp.arange(8.0)

    def f(x):
        return psum(x, "data"), pmean(x, "data")

    s, m = shard_map(
        f, mesh=mesh, in_specs=P("data"), out_specs=(P(), P())
    )(x)
    assert float(s[0]) == 28.0
    assert float(m[0]) == 3.5


@pytest.mark.slow
def test_dryrun_multichip_full_train_step():
    """The driver contract: full sharded BTS train step on 8 devices."""
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
