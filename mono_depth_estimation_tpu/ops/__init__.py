"""Core tensor ops: compositing, SSIM, resize/interpolate, LPG, up-projection.

Every op is pure-jnp (XLA fuses these elementwise chains into single
device kernels). Hand-written Pallas twins for LPG and fused preproc were
benchmarked on the real chip with the steady-state in-graph protocol
(tools/benchmark_kernels.py, kernel_bench.json) and LOST to the XLA
lowering — these ops are bandwidth-bound elementwise chains XLA fuses into
their consumers, which a standalone kernel cannot — so the kernels were
deleted (SURVEY §7 hard part 3: "keep the winner"). The fused
up-projection (ops/upproj.py) is a pure-XLA rewrite worth ~4x FLOPs on the
FCRN decoder and is used by default; device-side uint8 input preproc lives
in ops/preproc.py and is wired into the Trainer loaders/steps.
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
