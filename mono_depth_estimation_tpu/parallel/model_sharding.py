"""Tensor-parallel sharding of large Dense layers over the 'model' axis.

SURVEY §2.8 item 5: the zoo's only giant matmuls are Eigen's VGG head
(512*7*10 -> 4096 -> 64*19*14, network/Eigen.py:77-78) and DORN's
FullImageEncoder FC (2048*h*w -> 512, network/Dorn.py:64). This module
shards them Megatron-style over a 2-D ('data', 'model') mesh:

* first Dense: column-parallel — kernel P(None, 'model'), activations
  sharded on features;
* second Dense: row-parallel — kernel P('model', None); XLA inserts the
  psum over 'model' automatically from the shardings.

Params that match no rule are replicated. This is sharding-by-placement:
``shard_params`` device_puts the param pytree with NamedShardings and jit
propagates them — no model-code changes needed.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path-suffix match, PartitionSpec) — applied in order, first match wins.
EIGEN_FC_RULES: list[tuple[tuple[str, ...], P]] = [
    (("EigenScale1_0", "Dense_0", "kernel"), P(None, "model")),
    (("EigenScale1_0", "Dense_0", "bias"), P("model")),
    (("EigenScale1_0", "Dense_1", "kernel"), P("model", None)),
]

DORN_FC_RULES: list[tuple[tuple[str, ...], P]] = [
    (("FullImageEncoder_0", "Dense_0", "kernel"), P(None, "model")),
    (("FullImageEncoder_0", "Dense_0", "bias"), P("model")),
]


def _matches(path: tuple, suffix: tuple[str, ...]) -> bool:
    path = tuple(str(p) for p in path)
    return len(path) >= len(suffix) and path[-len(suffix):] == suffix


def sharding_for(path: tuple, mesh: Mesh,
                 rules: Sequence[tuple[tuple[str, ...], P]]) -> NamedSharding:
    for suffix, spec in rules:
        if _matches(path, suffix):
            return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())  # replicated


def shard_params(params, mesh: Mesh,
                 rules: Sequence[tuple[tuple[str, ...], P]]):
    """device_puts every param leaf with its rule's NamedSharding."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {
        path: jax.device_put(leaf, sharding_for(path, mesh, rules))
        for path, leaf in flat.items()
    }
    return traverse_util.unflatten_dict(out)
