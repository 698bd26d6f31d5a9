"""Golden tests for depth_sort / composite_layers / uncomposite_back against
independent numpy implementations of the documented recurrences."""

import jax.numpy as jnp
import numpy as np

from mono_depth_estimation_tpu.ops.compositing import (
    composite_layers,
    depth_sort,
    uncomposite_back,
)


def _np_composite(layers):
    """Direct numpy transcription of the front-to-back recurrence."""
    b, L, h, w, c = layers.shape
    acc_rgb = layers[:, 0, ..., :3].copy()
    acc_a = layers[:, 0, ..., 3:4].copy()
    for i in range(1, L):
        a_i = layers[:, i, ..., 3:4]
        rgb_i = layers[:, i, ..., :3]
        acc_rgb = acc_rgb + (1.0 - acc_a) * a_i * rgb_i
        acc_a = acc_a + (1.0 - acc_a) * a_i
    out = np.concatenate([acc_rgb, acc_a], axis=-1)
    return np.clip(out, 0.0, 1.0)


def test_composite_matches_numpy(rng):
    layers = rng.uniform(0, 1, size=(2, 3, 8, 8, 5)).astype(np.float32)
    got = np.asarray(composite_layers(layers))
    want = _np_composite(layers)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_depth_sort_orders_by_last_channel(rng):
    layers = rng.uniform(0, 1, size=(2, 4, 6, 6, 5)).astype(np.float32)
    got = np.asarray(depth_sort(layers))
    # depths along layer axis must be ascending everywhere
    d = got[..., -1]
    assert (np.diff(d, axis=1) >= 0).all()
    # content must be a permutation of the input per pixel
    for b in range(2):
        for y in range(6):
            for x in range(6):
                inp = layers[b, :, y, x, :]
                out = got[b, :, y, x, :]
                order = np.argsort(inp[:, -1], kind="stable")
                np.testing.assert_allclose(out, inp[order], atol=0)


def test_depth_sort_is_stable(rng):
    layers = rng.uniform(0, 1, size=(1, 3, 4, 4, 5)).astype(np.float32)
    layers[..., -1] = 0.5  # all equal depths -> order must be preserved
    got = np.asarray(depth_sort(layers))
    np.testing.assert_allclose(got, layers, atol=0)


def test_uncomposite_back_roundtrip(rng):
    # build a 2-layer scene, composite it, then recover the back layer
    # keep colors small enough that the composite never clips at 1.0
    front = rng.uniform(0.1, 0.5, size=(1, 8, 8, 4)).astype(np.float32)
    back = rng.uniform(0.1, 0.5, size=(1, 8, 8, 4)).astype(np.float32)
    front[..., 3] = rng.uniform(0.2, 0.8, size=(1, 8, 8))
    back[..., 3] = rng.uniform(0.2, 0.8, size=(1, 8, 8))
    stack = np.stack([front, back], axis=1)
    full = np.asarray(composite_layers(stack))
    got_back = np.asarray(uncomposite_back(full, front))
    # alpha recovers exactly; color recovers where the solve is well-posed
    np.testing.assert_allclose(got_back[..., 3], back[..., 3], atol=1e-4)
    np.testing.assert_allclose(got_back[..., :3], back[..., :3], atol=1e-3)


def test_depth_sort_network_matches_argsort_including_ties():
    """The small-L sorting network (compare-select, cheap VJP) must equal
    the stable argsort+gather form bit for bit — including tied depths,
    where stability (input order preserved) is the reference's
    torch.sort(stable=True) rule (stdepth_utils.py:4-16)."""
    import jax

    rng = np.random.default_rng(5)
    for n_layers in (2, 3, 4):
        layers = rng.uniform(0, 1, (2, n_layers, 6, 7, 5)).astype(np.float32)
        # force plenty of ties in the depth channel
        layers[..., -1] = rng.integers(0, 3, layers[..., -1].shape)
        # tag each layer in channel 0 so stability violations are visible
        layers[..., 0] = np.arange(n_layers, dtype=np.float32)[None, :, None, None]

        j = jnp.asarray(layers)
        got = np.asarray(depth_sort(j))
        idx = jnp.argsort(jax.lax.stop_gradient(j[..., -1]), axis=1,
                          stable=True)
        want = np.asarray(jnp.take_along_axis(j, idx[..., None], axis=1))
        np.testing.assert_array_equal(got, want)


def test_depth_sort_network_gradients_are_selects():
    """Gradients flow through the selected layers (values), none through
    the sort keys (stop_gradient), and match the gather form's VJP."""
    import jax

    rng = np.random.default_rng(6)
    layers = jnp.asarray(rng.uniform(0, 1, (1, 3, 4, 4, 5)).astype(np.float32))

    def net(x):
        return (depth_sort(x)[..., :4] ** 2).sum()

    def gather(x):
        idx = jnp.argsort(jax.lax.stop_gradient(x[..., -1]), axis=1,
                          stable=True)
        return (jnp.take_along_axis(x, idx[..., None], axis=1)[..., :4] ** 2).sum()

    g_net = np.asarray(jax.grad(net)(layers))
    g_gather = np.asarray(jax.grad(gather)(layers))
    np.testing.assert_allclose(g_net, g_gather, atol=1e-6)
