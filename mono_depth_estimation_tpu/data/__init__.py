"""Dataset families + host-side input pipeline.

Registry parity with the reference (datasets/__init__.py:3-9 and
modules/base_module.py:22-29): nyu, floorplan3d, structured3d, stdepth,
stdepthmulti, stdepthmulti2 — plus 'synthetic', a generated dataset used by
tests and benchmarks (no counterpart in the reference, which has no test
data at all).

Factories follow the reference signature
``get_<name>_dataset(args, split, output_size, resize)``.
"""

from mono_depth_estimation_tpu.data.base import (  # noqa: F401
    BaseDataset,
    ConcatDataset,
)
from mono_depth_estimation_tpu.data.nyu import NYUDataset, get_nyu_dataset  # noqa: F401
from mono_depth_estimation_tpu.data.floorplan3d import (  # noqa: F401
    Floorplan3DDataset,
    get_floorplan3d_dataset,
)
from mono_depth_estimation_tpu.data.structured3d import (  # noqa: F401
    Structured3DDataset,
    get_structured3d_dataset,
)
from mono_depth_estimation_tpu.data.stdepth import (  # noqa: F401
    SemiTransparentDepthDataset,
    SemiTransparentMultiDepthDataset,
    SemiTransparentMulti2DepthDataset,
    get_stdepth_dataset,
    get_stdepthmulti_dataset,
    get_stdepthmulti2_dataset,
)
from mono_depth_estimation_tpu.data.synthetic import (  # noqa: F401
    SyntheticDepthDataset,
    get_synthetic_dataset,
)
from mono_depth_estimation_tpu.data.loader import Loader  # noqa: F401
from mono_depth_estimation_tpu.data.policies import POLICIES  # noqa: F401

NAME2FUNC = {
    "nyu": get_nyu_dataset,
    "structured3d": get_structured3d_dataset,
    "floorplan3d": get_floorplan3d_dataset,
    "stdepth": get_stdepth_dataset,
    "stdepthmulti": get_stdepthmulti_dataset,
    "stdepthmulti2": get_stdepthmulti2_dataset,
    "synthetic": get_synthetic_dataset,
}

DATASET_NAMES = list(NAME2FUNC)
