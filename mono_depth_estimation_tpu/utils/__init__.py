"""Shared utilities: logging, profiling, seeding."""

from mono_depth_estimation_tpu.utils.logging import RunLogger  # noqa: F401
from mono_depth_estimation_tpu.utils.profiling import StepTimer  # noqa: F401
