"""Core tensor ops: compositing, SSIM, resize/interpolate, LPG, up-projection.

Every op has a pure-jnp implementation (the default compute path — XLA
fuses these elementwise chains into single kernels). Pallas TPU twins for
LPG and fused preproc live in ``kernels/`` and are validated against the
jnp versions; tools/benchmark_kernels.py measures both on hardware and
records the winner in kernel_bench.json (currently XLA and Pallas are
within noise for these ops — both are latency/bandwidth bound). The fused
up-projection (ops/upproj.py) is a pure-XLA rewrite worth ~4x FLOPs on the
FCRN decoder and is used by default.
"""

from mono_depth_estimation_tpu.ops.compositing import (  # noqa: F401
    depth_sort,
    composite_layers,
    uncomposite_back,
)
from mono_depth_estimation_tpu.ops.ssim import ssim, dssim  # noqa: F401
from mono_depth_estimation_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    center_crop,
    resize_shorter_side,
)
