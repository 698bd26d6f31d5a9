"""Shared CNN encoder backbones (Flax, NHWC).

One generic implementation per family covers every variant the reference's
model zoo uses (network/Bts.py:280-322, network/Dorn.py:230-285,
network/VNL.py:539-669, network/MiDaS.py:89-111, network/FCRN.py:297-347,
network/Eigen.py:71-90, network/SharpNet.py:279-503):

* ResNet/ResNeXt — resnet18/34/50/101/152, resnext50_32x4d,
  resnext101_32x8d (also the WSL weights' architecture), the DORN deep-stem
  dilated ResNet-101, stride-16 bodies (VNL), and SharpNet's dilated layer4.
* DenseNet — densenet121/161/169 with the BTS skip taps.
* VGG — vgg19_bn features (Eigen scale 1).
* MobileNetV2 — VNL's lightweight option.

All encoders return a tuple of feature maps, finest first, matching the
reference's skip-tap channel counts.
"""

from mono_depth_estimation_tpu.models.encoders.resnet import (  # noqa: F401
    ResNetEncoder,
    RESNET_PRESETS,
)
from mono_depth_estimation_tpu.models.encoders.densenet import (  # noqa: F401
    DenseNetEncoder,
    DENSENET_PRESETS,
)
from mono_depth_estimation_tpu.models.encoders.vgg import VGG19BNFeatures  # noqa: F401
from mono_depth_estimation_tpu.models.encoders.mobilenetv2 import (  # noqa: F401
    MobileNetV2Encoder,
)
