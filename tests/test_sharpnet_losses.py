"""SharpNet loss family.

Two tiers:
* golden/property tests against the written formulas (below), and
* CROSS-RUNS of the reference's own criteria.py classes — forward AND
  f64 gradients — via a ``Tensor.cuda -> identity`` shim (the reference
  hardcodes ``.cuda()`` on its Sobel kernels, criteria.py:573,580,643,...;
  the shim keeps those tensors on CPU without touching the math).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_depth_estimation_tpu.losses.sharpnet import (
    depth_boundary_consensus_loss,
    doobnet_loss,
    normal_depth_consensus_loss,
    sharpnet_loss,
    spatial_gradients_loss,
)

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import criteria  # the reference module  # noqa: E402


@pytest.fixture
def cpu_cuda(monkeypatch):
    """Make the reference's hardcoded .cuda() calls stay on CPU (it only
    ever calls .cuda() on its fresh f32 Sobel/Laplace constants). Cast to
    f64 in the same step: these certificates run in double precision and
    torch's conv2d requires input/weight dtypes to match — on a GPU the
    reference would run everything f32; the constants are exact in either."""
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self.to(torch.float64)
    )


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@pytest.fixture
def sharpnet_maps():
    rng = np.random.default_rng(17)
    b, h, w = 2, 12, 14
    depth = rng.uniform(0.5, 5.0, (b, h, w, 1))
    target = rng.uniform(0.5, 5.0, (b, h, w, 1))
    boundary = rng.uniform(0.05, 0.95, (b, h, w, 1))
    normals = rng.normal(size=(b, h, w, 3))
    mask = (rng.uniform(size=(b, h, w, 1)) > 0.25).astype(np.float64)
    return depth, target, boundary, normals, mask


def test_spatial_gradients_reference_parity(cpu_cuda, sharpnet_maps):
    """Unmasked SpatialGradientsLoss (criteria.py:548-624): Sobel
    log-gradient smooth term + sigma-3 Huber gradient term — value and
    d/d(pred) vs torch autograd, f64."""
    depth, target, *_ = sharpnet_maps

    pred_t = _nchw(depth).requires_grad_(True)
    ref = criteria.SpatialGradientsLoss(
        clamp_value=1e-7, size_average=True, gradient_loss_on=True,
        smooth_error=True,
    )(pred_t, _nchw(target))
    ref.backward()
    g_ref = np.transpose(pred_t.grad.numpy(), (0, 2, 3, 1))

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: spatial_gradients_loss(p, jnp.asarray(target),
                                             size_average=True)
        )(jnp.asarray(depth))

    assert np.isclose(float(val), float(ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


def test_spatial_gradients_masked_smooth_triple_quirk(cpu_cuda, sharpnet_maps):
    """Pins the reference quirk (criteria.py:602): with a mask, the smooth
    term multiplies the (B,1,H,W) gradient map by mask.repeat(1,3,1,1) —
    broadcasting to (B,3,H,W) and TRIPLING the masked smooth sum for the
    1-channel depth maps SharpNetLoss feeds it. We apply the mask once
    (the documented intent); the reference must equal
    3*smooth_ours + grad_ours exactly."""
    depth, target, _, _, mask = sharpnet_maps

    ref = criteria.SpatialGradientsLoss(
        clamp_value=1e-7, size_average=True, gradient_loss_on=True,
        smooth_error=True,
    )(_nchw(depth), _nchw(target), _nchw(mask))

    with jax.enable_x64(True):
        smooth = spatial_gradients_loss(
            jnp.asarray(depth), jnp.asarray(target), jnp.asarray(mask),
            size_average=True, gradient_loss_on=False)
        grad = spatial_gradients_loss(
            jnp.asarray(depth), jnp.asarray(target), jnp.asarray(mask),
            size_average=True, smooth_error=False)
    assert np.isclose(3 * float(smooth) + float(grad), float(ref), rtol=1e-10)


def test_depth_boundary_consensus_reference_parity(cpu_cuda, sharpnet_maps):
    """DepthBoundaryConsensusLoss (criteria.py:627-675), unmasked and
    masked — value and d/d(depth, boundary) vs torch autograd, f64."""
    depth, _, boundary, _, mask = sharpnet_maps

    for use_mask in (False, True):
        d_t = _nchw(depth).requires_grad_(True)
        b_t = _nchw(boundary).requires_grad_(True)
        ref = criteria.DepthBoundaryConsensusLoss()(
            d_t, b_t, _nchw(mask) if use_mask else None
        )
        ref.backward()
        gd_ref = np.transpose(d_t.grad.numpy(), (0, 2, 3, 1))
        gb_ref = np.transpose(b_t.grad.numpy(), (0, 2, 3, 1))

        with jax.enable_x64(True):
            val, (gd, gb) = jax.value_and_grad(
                lambda d, b: depth_boundary_consensus_loss(
                    d, b, jnp.asarray(mask) if use_mask else None),
                argnums=(0, 1),
            )(jnp.asarray(depth), jnp.asarray(boundary))

        assert np.isclose(float(val), float(ref.detach()), rtol=1e-10), use_mask
        np.testing.assert_allclose(np.asarray(gd), gd_ref,
                                   rtol=1e-8, atol=1e-13)
        np.testing.assert_allclose(np.asarray(gb), gb_ref,
                                   rtol=1e-8, atol=1e-13)


def test_normal_depth_consensus_reference_parity(cpu_cuda, sharpnet_maps):
    """NormalDepthConsensusLoss (criteria.py:678-722) — value and
    d/d(normals, depth, boundary) vs torch autograd, f64."""
    depth, _, boundary, normals, _ = sharpnet_maps

    n_t = _nchw(normals).requires_grad_(True)
    d_t = _nchw(depth).requires_grad_(True)
    b_t = _nchw(boundary).requires_grad_(True)
    ref = criteria.NormalDepthConsensusLoss()(n_t, d_t, b_t)
    ref.backward()

    with jax.enable_x64(True):
        val, (gn, gd, gb) = jax.value_and_grad(
            lambda n, d, b: normal_depth_consensus_loss(n, d, b),
            argnums=(0, 1, 2),
        )(jnp.asarray(normals), jnp.asarray(depth), jnp.asarray(boundary))

    assert np.isclose(float(val), float(ref.detach()), rtol=1e-10)
    for g_ours, g_t in ((gn, n_t), (gd, d_t), (gb, b_t)):
        g_ref = np.transpose(g_t.grad.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                                   rtol=1e-8, atol=1e-13)


def test_doobnet_reference_parity(sharpnet_maps):
    """DoobNetLoss (criteria.py:367-400) — value and d/d(b_pred) vs torch
    autograd, f64 (no cuda shim needed: DoobNetLoss is CPU-clean)."""
    _, _, boundary, _, _ = sharpnet_maps
    rng = np.random.default_rng(19)
    b_gt = (rng.uniform(size=boundary.shape) > 0.8).astype(np.float64)

    bp_t = _nchw(boundary).requires_grad_(True)
    ref = criteria.DoobNetLoss(beta=4.0, gamma=0.5, sigma=3)(
        bp_t, _nchw(b_gt)
    )
    ref.backward()
    g_ref = np.transpose(bp_t.grad.numpy(), (0, 2, 3, 1))

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: doobnet_loss(p, jnp.asarray(b_gt), beta=4.0, gamma=0.5)
        )(jnp.asarray(boundary))

    assert np.isclose(float(val), float(ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


def test_doobnet_matches_numpy_formula():
    """criteria.py:367-400: alpha-balanced focal BCE, summed, / batch."""
    rng = np.random.default_rng(0)
    bp = rng.uniform(0.05, 0.95, (2, 8, 8, 1)).astype(np.float32)
    bg = (rng.uniform(size=(2, 8, 8, 1)) > 0.8).astype(np.float32)

    beta, gamma = 4.0, 0.5
    bp_f, bg_f = bp.reshape(-1), bg.reshape(-1)
    alpha = 1.0 - bg_f.sum() / bg_f.size
    alfa = alpha * bg_f + (1 - alpha) * (1 - bg_f)
    pt = np.clip(bg_f * bp_f + (1 - bg_f) * (1 - bp_f), 1e-7, 1 - 1e-7)
    expected = (-(alfa * ((1 - pt) ** gamma) * beta * np.log(pt))).sum() / 2

    got = float(doobnet_loss(jnp.asarray(bp), jnp.asarray(bg)))
    assert np.isclose(got, expected, rtol=1e-5)


def test_spatial_gradients_zero_for_identical():
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.uniform(0.5, 5, (1, 16, 16, 1)).astype(np.float32))
    assert float(spatial_gradients_loss(d, d)) < 1e-9


def test_spatial_gradients_positive_for_different():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 5, (1, 16, 16, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 5, (1, 16, 16, 1)).astype(np.float32))
    assert float(spatial_gradients_loss(a, b)) > 0.0


def test_normal_depth_consensus_zero_when_aligned():
    """Normals aligned with the depth gradient and confident boundaries
    (b=1) give zero consensus loss."""
    yy = jnp.broadcast_to(
        jnp.arange(16, dtype=jnp.float32)[None, :, None, None], (1, 16, 16, 1)
    )
    depth = yy * 0.1 + 1.0  # gradient purely along +y
    gx_like = jnp.zeros_like(depth)
    normals = jnp.concatenate(
        [gx_like, jnp.ones_like(depth), jnp.zeros_like(depth)], axis=-1
    )
    boundary = jnp.ones_like(depth)
    val = float(normal_depth_consensus_loss(normals, depth, boundary))
    assert val < 1e-5


def test_depth_boundary_consensus_finite():
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.uniform(0.5, 5, (1, 16, 16, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 0.9, (1, 16, 16, 1)).astype(np.float32))
    v = float(depth_boundary_consensus_loss(d, b))
    assert np.isfinite(v) and v > 0


def test_sharpnet_loss_tuple():
    rng = np.random.default_rng(4)
    shape = (1, 16, 16, 1)
    d_pred = jnp.asarray(rng.uniform(0.5, 5, shape).astype(np.float32))
    d_gt = jnp.asarray(rng.uniform(0.5, 5, shape).astype(np.float32))
    n_pred = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    n_gt = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    b_pred = jnp.asarray(rng.uniform(0.1, 0.9, shape).astype(np.float32))
    b_gt = (rng.uniform(size=shape) > 0.8).astype(np.float32)
    mask = jnp.ones(shape)
    out = sharpnet_loss(
        mask, d_pred=d_pred, d_gt=d_gt, n_pred=n_pred, n_gt=n_gt,
        b_pred=b_pred, b_gt=jnp.asarray(b_gt),
        use_boundary=True, use_geo_consensus=True, use_grad=True,
    )
    assert len(out) == 5
    assert all(np.isfinite(float(v)) for v in out)
    assert float(out[0]) > 0  # depth term active
