"""Device mesh + sharding helpers.

Single entry point for every place the framework touches devices:

* ``make_mesh(n_data, n_model)`` — builds a ``jax.sharding.Mesh`` over
  ('data', 'model'). Defaults to all local devices on the data axis.
  Multi-host setups call ``jax.distributed.initialize`` first; mesh
  construction is identical (jax.make_mesh lays out ICI before DCN).
* ``batch_sharding(mesh)`` — NamedSharding P('data') for the leading batch
  axis; ``replicated(mesh)`` for parameters/scalars.
* ``shard_batch(batch, mesh)`` — device_put of a host pytree with the batch
  axis sharded (the host->HBM boundary; one transfer per step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.array(used).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Puts a host pytree on device with ``axis`` sharded on 'data'
    (axis=1 for K-stacked macro-batches, train/steps.make_fused_train_step)."""
    spec = P(*([None] * axis), "data")
    sharding = NamedSharding(mesh, spec)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def pad_batch_to(batch, multiple: int):
    """Pads the leading axis of every array so it divides the mesh width."""

    def pad(x):
        x = np.asarray(x)
        rem = x.shape[0] % multiple
        if rem == 0:
            return x
        reps = np.repeat(x[-1:], multiple - rem, axis=0)
        return np.concatenate([x, reps], axis=0)

    return jax.tree.map(pad, batch)
