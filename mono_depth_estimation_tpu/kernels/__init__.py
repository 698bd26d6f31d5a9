"""Pallas TPU kernels for the hot ops (BASELINE.json north-star list).

Every kernel has a pure-jnp twin in ops/ used as the correctness oracle
(tests run the kernels in interpreter mode on CPU) and as the fallback for
shapes the kernel doesn't tile. ``benchmark_kernels.py`` (tools/) measures
Pallas vs the XLA lowering of the jnp twin on the real chip; ops pick the
winner per op. XLA already fuses most of this zoo's elementwise chains into
single kernels — a Pallas version only earns its keep where it avoids HBM
round trips XLA can't (multi-pass reductions, layout-pinned gathers).
"""

from mono_depth_estimation_tpu.kernels.lpg import lpg_pallas  # noqa: F401
from mono_depth_estimation_tpu.kernels.preproc import (  # noqa: F401
    normalize_crop_pallas,
)
