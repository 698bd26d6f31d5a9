"""DenseNet encoder (Flax, NHWC) with the BTS skip taps.

Matches torchvision densenet121/161/169 structure so converted weights are
drop-in. Taps follow the reference BTS encoder feat_names
['relu0', 'pool0', 'transition1', 'transition2', 'norm5']
(/root/reference/network/Bts.py:284-291): relu0 = post-stem activation,
pool0 = after the stem maxpool, transition taps are the transition outputs
(post 1x1 conv + 2x2 avgpool), norm5 = final BatchNorm output *without* ReLU
— the BTS decoder applies its own activation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, avg_pool, max_pool


@dataclasses.dataclass(frozen=True)
class DenseNetConfig:
    growth_rate: int
    block_config: tuple[int, int, int, int]
    num_init_features: int
    bn_size: int = 4

    @property
    def feat_channels(self) -> list[int]:
        """Channel counts at the five BTS taps."""
        taps = [self.num_init_features, self.num_init_features]
        c = self.num_init_features
        for i, n in enumerate(self.block_config):
            c = c + n * self.growth_rate
            if i < len(self.block_config) - 1:
                c = c // 2  # transition halves (floor)
                if i < 2:
                    taps.append(c)
        taps.append(c)
        return taps


DENSENET_PRESETS: dict[str, DenseNetConfig] = {
    "densenet121": DenseNetConfig(32, (6, 12, 24, 16), 64),
    "densenet161": DenseNetConfig(48, (6, 12, 36, 24), 96),
    "densenet169": DenseNetConfig(32, (6, 12, 32, 32), 64),
}


class DenseLayer(nn.Module):
    """Literal norm1/relu/conv1 + norm2/relu/conv2, deliberately: a Pallas
    kernel fusing norm1+relu+conv1x1 into one scale-shift-relu-matmul (with
    a custom VJP recomputing the prologue in backward) was built and
    measured on v5e at every dense-layer shape of the 512x512 b32 flagship —
    XLA wins 1.3-2.3x at ALL of them (e.g. 1.53 vs 2.02 ms at M=32768
    C=2112; end-to-end eval 179 -> 155 img/s). XLA already fuses the
    elementwise BN+ReLU prologue into its conv, so there is no HBM
    materialization to save, and its conv tiling beats a hand-rolled
    single-level matmul. Keep the lowered form."""

    growth_rate: int
    bn_size: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        out = nn.relu(out)
        out = Conv(self.bn_size * self.growth_rate, kernel=1)(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        out = nn.relu(out)
        out = Conv(self.growth_rate, kernel=3)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseBlock(nn.Module):
    """Per-layer concatenate, deliberately: a preallocated-buffer variant
    (each layer dynamic_update_slice'ing its growth_rate new channels into
    one stack, cutting the O(L^2) concat write traffic to O(L)) was built
    and measured on v5e — it wins 1.18x on an ISOLATED densenet161 block3
    (2.7x fewer bytes), but in the full flagship model it LOSES: eval 184
    -> 156 img/s (XLA surrounds the unaligned-channel updates with
    copy-start/copy-done pairs) and the batch-32 train step runs out of
    HBM (the buffer keeps every layer's slice residual live for backward).
    Keep the concat form; XLA's scheduling of it is better end-to-end."""

    num_layers: int
    growth_rate: int
    bn_size: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.bn_size, self.frozen_bn)(
                x, train=train
            )
        return x


class Transition(nn.Module):
    out_features: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        x = nn.relu(x)
        x = Conv(self.out_features, kernel=1)(x)
        return avg_pool(x, 2, 2)


class DenseNetEncoder(nn.Module):
    """Returns (relu0, pool0, transition1, transition2, norm5) taps."""

    config: DenseNetConfig
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, ...]:
        cfg = self.config
        x = Conv(cfg.num_init_features, kernel=7, stride=2, padding=3)(x)
        x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        relu0 = nn.relu(x)
        pool0 = max_pool(relu0, 3, 2, padding=1)

        taps = [relu0, pool0]
        x = pool0
        c = cfg.num_init_features
        for i, n_layers in enumerate(cfg.block_config):
            x = DenseBlock(n_layers, cfg.growth_rate, cfg.bn_size, self.frozen_bn)(
                x, train=train
            )
            c = c + n_layers * cfg.growth_rate
            if i < len(cfg.block_config) - 1:
                c = c // 2
                x = Transition(c, self.frozen_bn)(x, train=train)
                if i < 2:
                    taps.append(x)
        norm5 = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        taps.append(norm5)
        return tuple(taps)


def densenet_encoder(name: str, frozen_bn: bool = False) -> DenseNetEncoder:
    return DenseNetEncoder(config=DENSENET_PRESETS[name], frozen_bn=frozen_bn)
