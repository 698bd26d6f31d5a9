"""Method registry + argv self-registration.

Parity: /root/reference/modules/__init__.py:5-31 — plus 'sharpnet', which
the reference implements but never registers (SURVEY.md §2.2).
"""

from __future__ import annotations

from mono_depth_estimation_tpu.methods.base import Method  # noqa: F401
from mono_depth_estimation_tpu.methods.bts import BtsMethod
from mono_depth_estimation_tpu.methods.dorn import DornMethod
from mono_depth_estimation_tpu.methods.eigen import EigenMethod
from mono_depth_estimation_tpu.methods.laina import LainaMethod
from mono_depth_estimation_tpu.methods.midas import MidasMethod
from mono_depth_estimation_tpu.methods.my import MyMethod
from mono_depth_estimation_tpu.methods.sharpnet import SharpnetMethod
from mono_depth_estimation_tpu.methods.vnl import VnlMethod

METHODS: dict[str, type[Method]] = {
    "eigen": EigenMethod,
    "laina": LainaMethod,
    "bts": BtsMethod,
    "dorn": DornMethod,
    "midas": MidasMethod,
    "vnl": VnlMethod,
    "my": MyMethod,
    "sharpnet": SharpnetMethod,
}


def register_module_specific_arguments(subparsers):
    """Each method self-registers its CLI args (reference
    modules/__init__.py:5-14)."""
    for cls in METHODS.values():
        cls.add_model_specific_args(subparsers)


def get_method(args) -> Method:
    """Constructs the method named by args.method.name (reference
    modules/__init__.py:16-31; checkpoint loading is handled by the train
    loop via orbax restore rather than construction-time branching)."""
    name = args.method.name
    if name not in METHODS:
        raise ValueError(f"unknown method: {name}; available: {list(METHODS)}")
    return METHODS[name](args.globals, args.method)
