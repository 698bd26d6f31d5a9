"""resize_bilinear(align_corners=True) == torch F.interpolate semantics.

The op is the tail of DORN (network/Dorn.py:120-127), FCRN (FCRN.py:226),
SharpNet, MiDaS and VNL; it is computed as two separable interpolation
matmuls (ops/resize.py), so this pins the matmul form to the torch gather
semantics it must reproduce.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mono_depth_estimation_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("impl", ["matmul", "gather"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((33, 45), (257, 353)),  # the DORN headline upsample
        ((7, 9), (14, 18)),
        ((16, 20), (5, 7)),      # downsample (VNL stage resizes)
        ((1, 6), (4, 12)),       # degenerate input H
        ((5, 6), (1, 1)),        # degenerate output
        ((8, 8), (8, 8)),        # identity
    ],
)
def test_align_corners_matches_torch(in_hw, out_hw, impl):
    from mono_depth_estimation_tpu.ops.resize import _resize_align_corners

    rng = np.random.default_rng(sum(in_hw) + sum(out_hw))
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)

    ours = _resize_align_corners(jnp.asarray(x), out_hw, force=impl)

    t = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_align_corners_preserves_dtype():
    x = jnp.ones((1, 4, 4, 2), jnp.bfloat16)
    out = resize_bilinear(x, (9, 9), align_corners=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 1.0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((13, 25), (25, 49)),    # VNL topdown stage (weights {0, .5, 1})
    ((33, 45), (257, 353)),  # DORN headline (scale exactly 1/8)
])
def test_align_corners_bf16_fast_path(in_hw, out_hw):
    """bf16 inputs + bf16-exact weights take the 1-pass bf16 matmul: within
    1 bf16 ulp of the f32-math gather on the same bf16 inputs (the H-pass
    intermediate rounds once; see ops/resize.py)."""
    from mono_depth_estimation_tpu.ops.resize import (
        _bf16_exact,
        _interp_matrix_np,
        _resize_align_corners,
    )

    assert _bf16_exact(_interp_matrix_np(in_hw[0], out_hw[0]))
    assert _bf16_exact(_interp_matrix_np(in_hw[1], out_hw[1]))
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.normal(size=(2, *in_hw, 3)).astype(np.float32), jnp.bfloat16
    )
    fast = _resize_align_corners(x, out_hw, force="matmul")
    ref = _resize_align_corners(x, out_hw, force="gather")
    assert fast.dtype == jnp.bfloat16
    # error bound: one bf16 ulp of the H-pass intermediate (magnitude ~ the
    # input scale, here unit) + one final-rounding ulp
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(ref, np.float32),
        rtol=2 ** -7, atol=2 ** -6,
    )


@pytest.mark.parametrize(
    "in_hw",
    [(193, 193), (13, 25), (7, 9), (2, 2), (1, 5), (97, 97)],
)
def test_align_corners_stencil_2nm1(in_hw):
    """The out = 2*in - 1 stencil fast path (every VNL topdown upsample):
    bit-EQUAL to the gather form in f32 (scale is exactly 0.5 — see
    ops/resize._resize_align_corners) and matches torch."""
    from mono_depth_estimation_tpu.ops.resize import _resize_align_corners

    out_hw = (2 * in_hw[0] - 1, 2 * in_hw[1] - 1)
    rng = np.random.default_rng(sum(in_hw))
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)

    stencil = np.asarray(
        _resize_align_corners(jnp.asarray(x), out_hw, force="stencil")
    )
    gather = np.asarray(
        _resize_align_corners(jnp.asarray(x), out_hw, force="gather")
    )
    np.testing.assert_array_equal(stencil, gather)

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(
        stencil, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6, rtol=1e-6
    )
