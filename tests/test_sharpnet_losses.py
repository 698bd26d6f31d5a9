"""SharpNet loss family (the reference's versions hardcode .cuda()
(criteria.py:573,580,643,...) and cannot run here, so these are golden/
property tests against the written formulas)."""

import jax.numpy as jnp
import numpy as np

from mono_depth_estimation_tpu.losses.sharpnet import (
    depth_boundary_consensus_loss,
    doobnet_loss,
    normal_depth_consensus_loss,
    sharpnet_loss,
    spatial_gradients_loss,
)


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
