"""MobileNetV2 encoder (Flax, NHWC) — VNL's lightweight backbone.

Follows the reference's 5-stage split with output-stride control via
dilation (/root/reference/network/VNL.py:471-537):

res1 = 3x3 s2 stem (32ch) | res2 = [t1,c16,n1,s1],[t6,c24,n2,s2]
res3 = [t6,c32,n3,s2]     | res4 = [t6,c64,n4,s*],[t6,c96,n3,s1]
res5 = [t6,c160,n3,s*],[t6,c320,n1,s1]

Returns the five stage outputs (res1..res5); channel taps with
width_mult=1: [32, 24, 32, 96, 320].
"""

from __future__ import annotations

import jax
from flax import linen as nn

from mono_depth_estimation_tpu.models.common import BatchNorm, Conv


def relu6(x: jax.Array) -> jax.Array:
    return jax.numpy.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    out_features: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        hidden = round(in_c * self.expand_ratio)
        use_res = self.stride == 1 and in_c == self.out_features
        out = x
        if self.expand_ratio != 1:
            out = Conv(hidden, kernel=1)(out)
            out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
            out = relu6(out)
        # depthwise: reference pads with `dilation` (VNL.py:427,442)
        out = Conv(
            hidden,
            kernel=3,
            stride=self.stride,
            dilation=self.dilation,
            groups=hidden,
            padding=self.dilation,
        )(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        out = relu6(out)
        out = Conv(self.out_features, kernel=1)(out)
        out = BatchNorm(frozen=self.frozen_bn)(out, train=train)
        return x + out if use_res else out


class MobileNetV2Encoder(nn.Module):
    width_mult: float = 1.0
    output_stride: int = 32
    frozen_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, ...]:
        stride1 = 1 if 32 / self.output_stride == 4 else 2
        stride2 = 1 if 32 / self.output_stride > 1 else 2
        dilation1 = 1 if stride1 == 2 else 2
        dilation2 = 1 if stride2 == 2 else (2 if stride1 == 2 else 4)

        stages = (
            ((1, 16, 1, 1, 1), (6, 24, 2, 2, 1)),          # res2
            ((6, 32, 3, 2, 1),),                            # res3
            ((6, 64, 4, stride1, dilation1), (6, 96, 3, 1, dilation1)),  # res4
            ((6, 160, 3, stride2, dilation2), (6, 320, 1, 1, dilation2)),  # res5
        )

        c = int(32 * self.width_mult)
        x = Conv(c, kernel=3, stride=2, padding=1)(x)
        x = BatchNorm(frozen=self.frozen_bn)(x, train=train)
        x = relu6(x)
        taps = [x]
        for stage in stages:
            for t, ch, n, s, d in stage:
                out_c = int(ch * self.width_mult)
                for i in range(n):
                    x = InvertedResidual(
                        out_c,
                        stride=s if i == 0 else 1,
                        expand_ratio=t,
                        dilation=d,
                        frozen_bn=self.frozen_bn,
                    )(x, train=train)
            taps.append(x)
        return tuple(taps)
