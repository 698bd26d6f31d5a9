"""Torch->Flax converter tests, including true numerical parity against the
reference's vendored torch models (the only ones importable without
torchvision, SURVEY §2.9): the DORN deep-stem dilated ResNet.

These are the gold-standard checks for SURVEY §7 hard part #1 (weight
conversion with exact BN semantics).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


class _TorchToy(torch.nn.Module):
    """Covers every tensor kind: conv, BN, conv-transpose, dense (fed by an
    NCHW flatten -> needs the CHW column permutation)."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        self.bn = torch.nn.BatchNorm2d(8)
        self.deconv = torch.nn.ConvTranspose2d(8, 4, 4, stride=2, padding=1)
        self.fc = torch.nn.Linear(4 * 8 * 8, 5)

    def forward(self, x):
        x = torch.relu(self.bn(self.conv(x)))
        x = self.deconv(x)
        x = x.flatten(1)
        return self.fc(x)


def _flax_toy():
    from flax import linen as nn

    from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, ConvTranspose

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = Conv(8, kernel=3, stride=2, padding=1)(x)
            x = BatchNorm()(x, train=train)
            x = nn.relu(x)
            x = ConvTranspose(4, kernel=4, stride=2, padding=1)(x)
            b = x.shape[0]
            x = x.reshape(b, -1)
            return nn.Dense(5)(x)

    return Toy()


def test_toy_model_parity():
    from tools.convert_torch_ckpt import convert_sequential

    tm = _TorchToy().eval()
    # randomize BN stats so eval-mode normalization is nontrivial
    with torch.no_grad():
        tm.bn.running_mean.uniform_(-0.5, 0.5)
        tm.bn.running_var.uniform_(0.5, 1.5)

    fm = _flax_toy()
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(
        sd, template, dense_chw_hints={0: (4, 8, 8)}
    )

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(fm.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x)))
    assert np.allclose(out, ref, atol=1e-4), np.abs(out - ref).max()


@pytest.mark.slow
def test_dorn_resnet_backbone_parity():
    """Reference vendored DORN ResNet (deep stem, dilated stages, ceil-mode
    pool; network/Dorn.py:230-285) vs our ResNetEncoder preset, with
    converted weights, numerically identical in eval mode."""
    _stub_torchvision()
    from network import Dorn  # reference, vendored torch-only

    from mono_depth_estimation_tpu.models.encoders.resnet import (
        ResNetConfig,
        ResNetEncoder,
    )
    from tools.convert_torch_ckpt import convert_sequential

    layers = [1, 1, 1, 1]
    tm = Dorn.ResNet(Dorn.Bottleneck, layers).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    cfg = ResNetConfig(
        tuple(layers),
        stem="deep",
        stage_strides=(1, 2, 1, 1),
        stage_dilations=(1, 1, 2, 4),
        ceil_mode_pool=True,
    )
    fm = ResNetEncoder(config=cfg)
    x = np.random.default_rng(1).normal(size=(1, 65, 89, 3)).astype(np.float32)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(sd, template)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    taps = fm.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    out = np.transpose(np.asarray(taps[-1]), (0, 3, 1, 2))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    assert np.allclose(out, ref, atol=1e-3), np.abs(out - ref).max()
