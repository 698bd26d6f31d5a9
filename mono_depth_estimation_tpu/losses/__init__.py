"""Pure-function loss library (parity surface of the reference criteria.py)."""

from mono_depth_estimation_tpu.losses.masked import (  # noqa: F401
    berhu_loss,
    huber_loss,
    laina_berhu_loss,
    masked_depth_loss,
    masked_l1_loss,
    masked_mean,
    masked_mse_loss,
    normals_loss,
    silog_loss,
)
from mono_depth_estimation_tpu.losses.midas import (  # noqa: F401
    apply_scale_and_shift,
    compute_scale_and_shift,
    gradient_loss,
    l1_loss,
    midas_loss,
    mse_loss,
    multiscale_gradient_loss,
    normalize_prediction_robust,
    trimmed_mae_loss,
    trimmed_procrustes_loss,
)
from mono_depth_estimation_tpu.losses.ordinal import (  # noqa: F401
    SID_PRESETS,
    SIDBins,
    ord_loss,
    ordinal_regression_loss,
)
from mono_depth_estimation_tpu.losses.sharpnet import (  # noqa: F401
    depth_boundary_consensus_loss,
    doobnet_loss,
    normal_depth_consensus_loss,
    sharpnet_loss,
    spatial_gradients_loss,
)
from mono_depth_estimation_tpu.losses.stdepth import (  # noqa: F401
    StdepthLossConfig,
    adjust_loss_dict,
    composite_prediction,
    stdepth_loss,
)
from mono_depth_estimation_tpu.losses.vnl import (  # noqa: F401
    VNLConfig,
    model_loss,
    transfer_xyz,
    vnl_loss,
    wcel_loss,
)
