"""Numerical parity of our losses against the REFERENCE criteria.py itself.

criteria.py imports only torch/numpy, so it runs here directly — these
tests execute the reference code and ours on the same random inputs
(SURVEY.md §4: unit tests "against golden values computed from the
reference formulas" — strengthened to running the reference itself).
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import criteria  # the reference module  # noqa: E402

from mono_depth_estimation_tpu.losses.masked import (  # noqa: E402
    berhu_loss,
    laina_berhu_loss,
    masked_depth_loss,
    silog_loss,
)
from mono_depth_estimation_tpu.losses.midas import (  # noqa: E402
    compute_scale_and_shift,
    midas_loss,
    trimmed_procrustes_loss,
)
from mono_depth_estimation_tpu.losses.ordinal import ord_loss  # noqa: E402
from mono_depth_estimation_tpu.losses.vnl import wcel_loss  # noqa: E402


@pytest.fixture
def depth_pair():
    rng = np.random.default_rng(7)
    target = rng.uniform(0.0, 10.0, (2, 16, 20)).astype(np.float32)
    target[rng.uniform(size=target.shape) < 0.2] = 0.0  # invalid pixels
    pred = np.clip(target + rng.normal(0, 0.5, target.shape), 0.05, 12).astype(
        np.float32
    )
    return pred, target


def _t(x):  # (B, H, W) -> torch (B, 1, H, W)
    return torch.from_numpy(x).unsqueeze(1)


def test_masked_depth_loss_parity(depth_pair):
    pred, target = depth_pair
    ref = criteria.MaskedDepthLoss()(_t(pred), _t(target)).item()
    ours = float(masked_depth_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


def test_silog_parity(depth_pair):
    pred, target = depth_pair
    ref = criteria.silog_loss(variance_focus=0.85)(
        torch.from_numpy(pred), torch.from_numpy(target)
    ).item()
    ours = float(
        silog_loss(jnp.asarray(pred), jnp.asarray(target), variance_focus=0.85)
    )
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


def test_berhu_parity(depth_pair):
    pred, target = depth_pair
    ref = criteria.berHuLoss()(_t(pred), _t(target)).item()
    ours = float(berhu_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


def test_laina_berhu_parity(depth_pair):
    pred, target = depth_pair
    ref = criteria.LainaBerHuLoss()(_t(pred), _t(target)).item()
    ours = float(laina_berhu_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isclose(ours, ref, rtol=1e-3), (ours, ref)


def test_scale_and_shift_parity(depth_pair):
    pred, target = depth_pair
    mask = (target > 0).astype(np.float32)
    s_ref, t_ref = criteria.compute_scale_and_shift(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    s, t = compute_scale_and_shift(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_ref.numpy(), rtol=1e-3)


# Only batch-based: the reference's reduction_image_based indexes the flat
# per-pixel loss vector with per-image indices (criteria.py:191-199) — an
# ill-defined op no reference module exercises; ours implements the
# documented intent instead.
@pytest.mark.parametrize("loss_name", ["ssimse", "ssil1", "trim", "mse", "l1"])
def test_midas_loss_parity(depth_pair, loss_name):
    pred, target = depth_pair
    ref = criteria.MidasLoss(alpha=0.5, loss=loss_name, reduction="batch-based")(
        _t(pred), _t(target)
    ).item()
    # trim=0.0 reproduces the reference's actual behavior: its
    # torch.sort(...)[:n] slices the (values, indices) tuple, so it never
    # trims (criteria.py:233-239; bug documented in losses/midas.py).
    ours = float(
        midas_loss(
            jnp.asarray(pred), jnp.asarray(target), alpha=0.5, loss=loss_name,
            reduction="batch-based", trim=0.0,
        )
    )
    assert np.isclose(ours, ref, rtol=2e-3, atol=1e-5), (loss_name, ours, ref)


def test_reference_trim_is_a_noop():
    """Pins the reference bug: TrimmedMAELoss == plain masked MAE there."""
    rng = np.random.default_rng(11)
    pred = rng.uniform(0.1, 5, (2, 8, 10)).astype(np.float32)
    target = rng.uniform(0.1, 5, (2, 8, 10)).astype(np.float32)
    mask = torch.ones(2, 8, 10)
    trimmed = criteria.trimmed_mae_loss(
        torch.from_numpy(pred), torch.from_numpy(target), mask
    ).item()
    plain = criteria.l1_loss(
        torch.from_numpy(pred), torch.from_numpy(target), mask
    ).item()
    assert np.isclose(trimmed, plain, rtol=1e-6)
    # ours with trim=0.2 differs (it actually trims the largest residuals)
    ours = float(
        __import__(
            "mono_depth_estimation_tpu.losses.midas", fromlist=["trimmed_mae_loss"]
        ).trimmed_mae_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.ones((2, 8, 10)), trim=0.2
        )
    )
    assert ours < plain


def test_trimmed_procrustes_parity(depth_pair):
    pred, target = depth_pair
    ref = criteria.TrimmedProcrustesLoss(alpha=0.5)(_t(pred), _t(target)).item()
    ours = float(
        trimmed_procrustes_loss(
            jnp.asarray(pred), jnp.asarray(target), alpha=0.5, trim=0.0
        )
    )
    assert np.isclose(ours, ref, rtol=2e-3, atol=1e-5), (ours, ref)


def test_ord_loss_parity():
    rng = np.random.default_rng(3)
    b, h, w, k = 2, 8, 10, 12
    prob = rng.uniform(0.01, 0.99, (b, h, w, k)).astype(np.float32)
    target = rng.uniform(0, k, (b, h, w)).astype(np.float32)
    # reference ordLoss expects NCHW prob and (B, 1, H, W) labels
    ref = criteria.ordLoss()(
        torch.from_numpy(np.transpose(prob, (0, 3, 1, 2))),
        torch.from_numpy(target[:, None]),
    ).item()
    ours = float(ord_loss(jnp.asarray(prob), jnp.asarray(target)))
    assert np.isclose(ours, ref, rtol=1e-3), (ours, ref)


def test_wcel_parity():
    rng = np.random.default_rng(4)
    b, h, w, c = 2, 6, 7, 10

    class Args:
        dec_out_c = c
        wce_loss_weight = np.array(
            [[np.exp(-0.2 * (i - j) ** 2) for i in range(c)] for j in range(c)]
        )

    logits = rng.normal(size=(b, c, h, w)).astype(np.float32)
    gt_depth = rng.uniform(0, 2, (b, h, w)).astype(np.float32)
    gt_bins = rng.integers(0, c, (b, h, w))

    ref = criteria.WCEL_Loss(Args())(
        torch.from_numpy(logits),
        torch.from_numpy(gt_bins),
        torch.from_numpy(gt_depth),
    ).item()
    ours = float(
        wcel_loss(
            jnp.asarray(np.transpose(logits, (0, 2, 3, 1))),
            jnp.asarray(gt_bins),
            jnp.asarray(gt_depth),
            dec_out_c=c,
        )
    )
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


@pytest.mark.parametrize("select", [True, False])
@pytest.mark.parametrize("batch", [1, 2])
def test_vnl_loss_tail_parity(select, batch):
    """VNL_Loss deterministic tail (criteria.py:955-1045): inject identical
    3-point index groups into the reference (select_index monkeypatched) and
    ours (p123 kwarg) — the colinear/near-point filtering, virtual-normal
    comparison, and keep-worst-75% selection must agree numerically. Only
    the np.random draw itself is nondeterministic; everything after is pure.
    """
    import jax

    from mono_depth_estimation_tpu.losses.vnl import VNLConfig, vnl_loss

    rng = np.random.default_rng(11)
    h, w = 16, 20
    # smooth surface + small focal: with uniform-random depth every
    # difference vector is z-dominant and the |cos|>0.867 filter ignores
    # ALL groups (both sides agree, but the tail is then untested). This
    # input yields ~12/48 valid groups, so every filter branch fires.
    fx = fy = 25.0
    yy, xx = np.mgrid[0:h, 0:w]
    gt = np.broadcast_to(
        2.0 + 0.4 * np.sin(xx / 3.0) + 0.4 * np.cos(yy / 2.5), (batch, h, w)
    ) + 0.05 * rng.normal(size=(batch, h, w))
    gt = gt.astype(np.float32)
    gt[rng.uniform(size=gt.shape) < 0.15] = 0.0  # exercise mask_pad
    # a few exact duplicates exercise the near-point filter
    gt[:, 5, 5] = gt[:, 5, 6]
    pred = np.clip(gt + rng.normal(0, 0.4, gt.shape), 0.05, 12).astype(
        np.float32
    )

    n = int(h * w * 0.15)
    p = rng.integers(0, h * w, (3, n))
    p123 = {
        "p1_x": p[0] % w, "p1_y": p[0] // w,
        "p2_x": p[1] % w, "p2_y": p[1] // w,
        "p3_x": p[2] % w, "p3_y": p[2] // w,
    }

    vl = criteria.VNL_Loss(fx, fy, (h, w))
    vl.select_index = lambda: p123  # bypass the np.random draw only
    ref = vl(
        torch.from_numpy(gt).unsqueeze(1),
        torch.from_numpy(pred).unsqueeze(1),
        select=select,
    ).item()

    ours = float(
        vnl_loss(
            jnp.asarray(gt),
            jnp.asarray(pred),
            VNLConfig(focal_x=fx, focal_y=fy, input_size=(h, w)),
            key=jax.random.PRNGKey(0),
            select=select,
            p123=jnp.asarray(p),
        )
    )
    assert np.isclose(ours, ref, rtol=1e-4, atol=1e-5), (ours, ref)
