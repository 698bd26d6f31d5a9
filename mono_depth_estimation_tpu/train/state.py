"""Train state pytree."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    """Everything a train step mutates, as one donated pytree.

    params / batch_stats are the flax variable collections; opt_state is the
    optax state. ``step`` lives on device so the jitted step has no host
    round trip.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
