"""Training runtime: state, optimizers, jitted steps, loop, checkpointing."""

from mono_depth_estimation_tpu.train.state import TrainState  # noqa: F401
from mono_depth_estimation_tpu.train.optim import (  # noqa: F401
    PlateauScheduler,
    make_optimizer,
    set_learning_rate,
)
