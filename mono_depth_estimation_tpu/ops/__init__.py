"""Core tensor ops: compositing, SSIM, resize/interpolate, LPG, up-projection.

Every op has a pure-jnp reference implementation; Pallas TPU kernels are
provided for the hot paths and validated against the jnp versions. Public
functions pick the fastest correct implementation for the platform.
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
