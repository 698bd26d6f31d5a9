"""Generic ResNet / ResNeXt encoder (Flax, NHWC).

One parameterized implementation covers every ResNet-family backbone in the
reference zoo (see encoders/__init__.py for the file:line map):

* block type (basic / bottleneck), per-stage block counts
* grouped 3x3 convs + base_width (ResNeXt)
* stem: 'standard' torchvision 7x7, or 'deep' 3x(3x3) (DORN,
  /root/reference/network/Dorn.py:230-244)
* per-stage stride/dilation overrides (DORN dilated stages, VNL stride-16
  bodies, SharpNet dilated layer4)

Stride lives on the 3x3 conv (torchvision "v1.5"), which matches every
vendored copy in the reference (network/Dorn.py:146, network/VNL.py:618-669).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Any

import jax
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv, max_pool


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: tuple[int, int, int, int]
    bottleneck: bool = True
    groups: int = 1
    base_width: int = 64
    stem: str = "standard"  # 'standard' | 'deep'
    stage_strides: tuple[int, int, int, int] = (1, 2, 2, 2)
    stage_dilations: tuple[int, int, int, int] = (1, 1, 1, 1)
    ceil_mode_pool: bool = False
    # SharpNet dilates only the first block of a stage (SharpNet.py:235-252);
    # DORN/VNL dilate every block.
    dilate_only_first: bool = False

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1

    @property
    def feat_channels(self) -> list[int]:
        stem_c = 128 if self.stem == "deep" else 64
        e = self.expansion
        return [stem_c, 64 * e, 128 * e, 256 * e, 512 * e]


RESNET_PRESETS: dict[str, ResNetConfig] = {
    "resnet18": ResNetConfig((2, 2, 2, 2), bottleneck=False),
    "resnet34": ResNetConfig((3, 4, 6, 3), bottleneck=False),
    "resnet50": ResNetConfig((3, 4, 6, 3)),
    "resnet101": ResNetConfig((3, 4, 23, 3)),
    "resnet152": ResNetConfig((3, 8, 36, 3)),
    "resnext50_32x4d": ResNetConfig((3, 4, 6, 3), groups=32, base_width=4),
    "resnext101_32x8d": ResNetConfig((3, 4, 23, 3), groups=32, base_width=8),
    # MiDaS' ResNeXt101-WSL shares the resnext101_32x8d architecture
    # (network/MiDaS.py:99-111).
    "resnext101_wsl": ResNetConfig((3, 4, 23, 3), groups=32, base_width=8),
    # DORN's dilated deep-stem ResNet-101 (network/Dorn.py:230-247,344).
    "dorn_resnet101": ResNetConfig(
        (3, 4, 23, 3),
        stem="deep",
        stage_strides=(1, 2, 1, 1),
        stage_dilations=(1, 1, 2, 4),
        ceil_mode_pool=True,
    ),
    # VNL stride-16 bodies (network/VNL.py:539-545).
    "resnext50_32x4d_stride16": ResNetConfig(
        (3, 4, 6, 3),
        groups=32,
        base_width=4,
        stage_strides=(1, 2, 2, 1),
        stage_dilations=(1, 1, 1, 2),
    ),
    "resnext101_32x4d_stride16": ResNetConfig(
        (3, 4, 23, 3),
        groups=32,
        base_width=4,
        stage_strides=(1, 2, 2, 1),
        stage_dilations=(1, 1, 1, 2),
    ),
    # SharpNet: ResNet-50 with dilated layer4 (network/SharpNet.py:384-392).
    "sharpnet_resnet50": ResNetConfig(
        (3, 4, 6, 3),
        stage_strides=(1, 2, 2, 1),
        stage_dilations=(1, 1, 1, 2),
        dilate_only_first=True,
    ),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out = Conv(self.planes, kernel=3, stride=self.stride, dilation=self.dilation)(x)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        out = nn.relu(out)
        out = Conv(self.planes, kernel=3, dilation=self.dilation)(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        if self.downsample:
            identity = Conv(self.planes, kernel=1, stride=self.stride)(x)
            identity = BatchNorm(frozen=self.frozen_bn)(identity, train=train)
        return nn.relu(out + identity)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    downsample: bool = False
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_c = self.planes * 4
        identity = x
        out = Conv(width, kernel=1)(x)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        out = nn.relu(out)
        out = Conv(
            width,
            kernel=3,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
        )(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        out = nn.relu(out)
        out = Conv(out_c, kernel=1)(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        if self.downsample:
            identity = Conv(out_c, kernel=1, stride=self.stride)(x)
            identity = BatchNorm(frozen=self.frozen_bn)(identity, train=train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Returns (stem_act, stage1, stage2, stage3, stage4) feature maps.

    ``stem_act`` is the post-ReLU, pre-maxpool activation — the reference's
    'relu'/'relu0' BTS skip tap (network/Bts.py:294-307).
    """

    config: ResNetConfig
    frozen_bn: bool = False
    in_dilation: int = 1  # running dilation carried across stages
    # GPipe pipeline parallelism over the homogeneous tail of the DEEPEST
    # stage (blocks 1..n-1 are iso-shape/iso-config past each stage's first
    # block): with pipeline_stages = S > 1 and a mesh, eval forwards stream
    # microbatches through S stages laid out on the mesh's pipeline axis
    # (parallel/pipeline.py). Param tree layout is UNCHANGED (every block
    # keeps its canonical name), so checkpoints/converters are oblivious.
    # Training and init always run the sequential form.
    pipeline_stages: int = 0
    pipeline_mesh: Any = None
    pipeline_axis: str = "model"
    pipeline_microbatches: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, ...]:
        cfg = self.config
        if cfg.stem == "deep":
            for c, s in ((64, 2), (64, 1), (128, 1)):
                x = Conv(c, kernel=3, stride=s)(x)
                x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
                x = nn.relu(x)
        else:
            x = Conv(64, kernel=7, stride=2, padding=3)(x)
            x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
            x = nn.relu(x)
        stem_act = x
        if cfg.ceil_mode_pool:
            # torch ceil_mode pads an extra row/col when the window would
            # otherwise drop the tail (network/Dorn.py:245).
            h, w = x.shape[1], x.shape[2]
            extra_h = 1 if (h + 2 - 3) % 2 else 0
            extra_w = 1 if (w + 2 - 3) % 2 else 0
            pads = ((1, 1 + extra_h), (1, 1 + extra_w))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pads)
        else:
            x = max_pool(x, 3, 2, padding=1)

        taps: list[jax.Array] = [stem_act]
        in_planes = 128 if cfg.stem == "deep" else 64
        deepest = max(range(4), key=lambda s: cfg.layers[s])
        block_cls = BottleneckBlock if cfg.bottleneck else BasicBlock
        blk_counter = 0  # explicit names == flax auto-names, so the
        # pipelined path can SKIP instantiating tail blocks without
        # shifting the names of every later block
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), cfg.layers)
        ):
            stride = cfg.stage_strides[stage]
            dilation = cfg.stage_dilations[stage]
            out_c = planes * cfg.expansion
            pipe_here = (
                self.pipeline_stages > 1
                and stage == deepest
                and not train
                and not self.is_initializing()
                and (n_blocks - 1) % self.pipeline_stages == 0
                and n_blocks > 1
            )
            tail_names: list[str] = []
            tail_kw = None
            for i in range(n_blocks):
                name = f"{block_cls.__name__}_{blk_counter}"
                blk_counter += 1
                blk_dilation = (
                    1 if (cfg.dilate_only_first and i > 0) else dilation
                )
                block_kw = dict(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    dilation=blk_dilation,
                    downsample=(i == 0 and (stride != 1 or in_planes != out_c)),
                    frozen_bn=self.frozen_bn,
                )
                if cfg.bottleneck:
                    block_kw.update(groups=cfg.groups, base_width=cfg.base_width)
                in_planes = out_c
                if pipe_here and i >= 1:
                    tail_names.append(name)
                    tail_kw = block_kw  # iso-config for every tail block
                    continue
                x = block_cls(**block_kw, name=name)(x, train=train)
            if tail_names:
                # parent=None: a detached functional template (applied with
                # explicit variables), not a registered submodule
                template = block_cls(**tail_kw, parent=None)
                x = self._pipelined_tail(x, tail_names, template)
            taps.append(x)
        return tuple(taps)

    def _pipelined_tail(self, x: jax.Array, names: list[str], template):
        """Streams x through the named (already-initialized) homogeneous
        blocks as an S-stage GPipe over ``pipeline_axis`` — each stage holds
        len(names) / S consecutive blocks, parameters fetched from this
        module's own variable collections (no relayout)."""
        from mono_depth_estimation_tpu.parallel.pipeline import (
            merge_microbatches,
            pipeline_apply,
            split_microbatches,
            stack_stage_params,
        )

        s_count = self.pipeline_stages
        per_stage_n = len(names) // s_count

        def block_vars(nm):
            v = {"params": self.get_variable("params", nm)}
            bs = self.get_variable("batch_stats", nm)
            if bs is not None:
                v["batch_stats"] = bs
            return v

        per_stage = [
            {
                f"b{j}": block_vars(names[s * per_stage_n + j])
                for j in range(per_stage_n)
            }
            for s in range(s_count)
        ]
        stage_vars = stack_stage_params(per_stage)

        def stage_fn(vars_s, h):
            for j in range(per_stage_n):
                h = template.apply(vars_s[f"b{j}"], h, train=False)
            return h

        m = self.pipeline_microbatches
        assert x.shape[0] % m == 0, (
            f"eval batch {x.shape[0]} not divisible into {m} microbatches"
        )
        xs = split_microbatches(x, m)
        y = pipeline_apply(
            stage_fn, stage_vars, xs, self.pipeline_mesh,
            axis=self.pipeline_axis,
        )
        return merge_microbatches(y)


def resnet_encoder(name: str, frozen_bn: bool = False) -> ResNetEncoder:
    return ResNetEncoder(config=RESNET_PRESETS[name], frozen_bn=frozen_bn)


def resnet_feat_channels(name: str) -> Sequence[int]:
    return RESNET_PRESETS[name].feat_channels
