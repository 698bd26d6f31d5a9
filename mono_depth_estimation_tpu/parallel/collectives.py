"""Thin collectives facade over XLA primitives.

Used for cross-device metric aggregation (SURVEY.md §2.8 item 2): the
reference averages metrics per Lightning rank (rank-local, subtly wrong
under DDP); here eval reductions are explicit global pmeans, exact across
the mesh.

Inside ``shard_map``-style code these lower to ICI collectives; under plain
jit with sharded inputs XLA inserts the equivalent reductions automatically
when a reduction crosses the 'data' axis — the helpers below are for the
explicit (shard_map / pmap) paths.
"""

from __future__ import annotations

import jax


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)
