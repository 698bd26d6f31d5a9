"""Flax model zoo — one architecture per reference network/*.py file.

All models are NHWC and take ``train: bool`` for BatchNorm/Dropout mode.
Registry keys match the reference method names (modules/__init__.py:16-31
of the reference), plus 'sharpnet' which the reference left unregistered.
"""

from mono_depth_estimation_tpu.models.bts import BtsModel  # noqa: F401
from mono_depth_estimation_tpu.models.dorn import DORN  # noqa: F401
from mono_depth_estimation_tpu.models.eigen import Eigen  # noqa: F401
from mono_depth_estimation_tpu.models.fcrn import FCRN  # noqa: F401
from mono_depth_estimation_tpu.models.midas import MidasNet  # noqa: F401
from mono_depth_estimation_tpu.models.mynet import MyModel  # noqa: F401
from mono_depth_estimation_tpu.models.sharpnet import SharpNet  # noqa: F401
from mono_depth_estimation_tpu.models.vnl import MetricDepthModel  # noqa: F401

MODELS = {
    "eigen": Eigen,
    "laina": FCRN,
    "bts": BtsModel,
    "dorn": DORN,
    "midas": MidasNet,
    "vnl": MetricDepthModel,
    "my": MyModel,
    "sharpnet": SharpNet,
}
