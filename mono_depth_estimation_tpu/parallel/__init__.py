"""Mesh construction + collectives facade (SURVEY.md §2.8 TPU equivalents).

The reference's only parallelism is Lightning DDP via ``--gpus N``
(train.py:61,137). Here data parallelism is a first-class mesh axis:
batches are sharded over 'data', parameters are replicated, and XLA inserts
the gradient all-reduce over ICI automatically. A second 'model' axis is
available for spatial/tensor sharding extensions.
"""

from mono_depth_estimation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from mono_depth_estimation_tpu.parallel.collectives import (  # noqa: F401
    all_gather,
    pmean,
    psum,
)
