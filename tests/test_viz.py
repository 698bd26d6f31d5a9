"""Viz layer tests (VERDICT r4 task #5 — the one subsystem with no direct
tests). Parity target: /root/reference/visualize.py, cross-run on shared
inputs: the reference file is imported and executed here (torch +
matplotlib + cv2 are installed; torchmetrics is stubbed), so the colormap,
row-merge, and both stdepth mosaics are pinned against the reference's own
code — down to the rendered canvas for the mosaics.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from mono_depth_estimation_tpu.viz import (  # noqa: E402
    add_row,
    colored_depthmap,
    create_stdepth_plot,
    create_stdepth_plot_single,
    merge_into_row,
    save_image,
    save_images,
    save_stdepth_prediction,
)


def _ref_visualize():
    """Import the reference's visualize.py (its metrics import needs the
    torchmetrics stub, same as tests/test_evaluate_parity.py)."""
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        func = types.ModuleType("torchmetrics.functional")
        reg = types.ModuleType("torchmetrics.functional.regression")
        reg.mean_absolute_error = lambda p, t: (p - t).abs().mean()
        reg.mean_squared_error = lambda p, t: ((p - t) ** 2).mean()
        reg.mean_squared_log_error = (
            lambda p, t: ((torch.log1p(p) - torch.log1p(t)) ** 2).mean()
        )
        func.regression = reg
        func.structural_similarity_index_measure = None
        tm.functional = func
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = func
        sys.modules["torchmetrics.functional.regression"] = reg
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import matplotlib

    matplotlib.use("Agg")
    import visualize as ref_viz  # /root/reference/visualize.py

    return ref_viz


def _render(fig, dpi=25):
    """Small deterministic rasterization of a figure."""
    fig.set_dpi(dpi)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba()).copy()
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf


def test_colored_depthmap_reference_parity():
    """visualize.py:8-17 run on the same map: byte-identical BGR output."""
    ref_viz = _ref_visualize()
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 5.0, (17, 23)).astype(np.float32)

    ours = colored_depthmap(depth)
    ref = ref_viz.colored_depthmap(depth)
    assert ours.shape == (17, 23, 3) and ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, ref)

    # explicit range + no-mapping flavor
    np.testing.assert_array_equal(
        colored_depthmap(depth, 0.0, 10.0, do_mapping=False),
        ref_viz.colored_depthmap(depth, 0.0, 10.0, do_mapping=False),
    )


def test_colored_depthmap_constant_map_is_finite():
    """Repeating probe: a constant map (d_min == d_max) must not divide by
    zero. The reference NaNs here (0/0 -> astype(uint8) garbage) — ours
    guards the denominator; divergence documented, not copied."""
    out = colored_depthmap(np.full((5, 7), 3.0, np.float32))
    assert out.shape == (5, 7, 3) and out.dtype == np.uint8


def test_merge_into_row_reference_parity():
    """visualize.py:20-35: [rgb*255 BGR | gt inferno | pred inferno] with a
    SHARED color range; depth maps resized to the rgb geometry."""
    ref_viz = _ref_visualize()
    rng = np.random.default_rng(1)
    h, w = 20, 30
    rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    gt = rng.uniform(0.2, 4.0, (h, w)).astype(np.float32)
    pred = rng.uniform(0.1, 5.0, (h, w)).astype(np.float32)

    ours = merge_into_row(rgb, gt[..., None], pred[..., None])
    assert ours.shape == (h, 3 * w, 3)

    # the reference takes CHW torch tensors
    ref = ref_viz.merge_into_row(
        torch.from_numpy(np.transpose(rgb, (2, 0, 1))[None]),
        torch.from_numpy(gt[None, None]),
        torch.from_numpy(pred[None, None]),
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)

    # row stacking (visualize.py:34-35)
    two = add_row(ours, ours)
    assert two.shape == (2 * h, 3 * w, 3)
    np.testing.assert_array_equal(two[:h], ours)


def test_save_images_roundtrip(tmp_path):
    """visualize.py:58-89: per-sample rgb/pred/gt jpgs with a SHARED depth
    color range; files exist and decode to the right geometry."""
    rng = np.random.default_rng(2)
    h, w = 16, 24
    rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    gt = rng.uniform(0.5, 2.0, (h, w, 1)).astype(np.float32)
    pred = rng.uniform(0.1, 3.0, (h, w, 1)).astype(np.float32)

    save_images(tmp_path / "out", 3, rgb=rgb, depth_gt=gt, depth_pred=pred)
    for stem in ("3_rgb", "3_pred", "3_gt"):
        f = tmp_path / "out" / f"{stem}.jpg"
        assert f.exists(), stem
        img = cv2.imread(str(f))
        assert img is not None and img.shape == (h, w, 3), stem

    # the shared range: gt and pred jpgs must use min/max over BOTH maps —
    # re-encode the expected colormaps and compare against the decode
    # (jpg is lossy; compare means, not bytes)
    lo = min(gt.min(), pred.min())
    hi = max(gt.max(), pred.max())
    expect = colored_depthmap(np.squeeze(pred), lo, hi)
    got = cv2.imread(str(tmp_path / "out" / "3_pred.jpg"))
    assert abs(float(expect.mean()) - float(got.mean())) < 3.0

    save_image(expect, tmp_path / "direct.png")  # png writer path
    np.testing.assert_array_equal(
        cv2.imread(str(tmp_path / "direct.png")), expect
    )


def _mosaic_inputs(rng, h, w, channels):
    pred = rng.uniform(0, 1, (h, w, channels)).astype(np.float32)
    targ = rng.uniform(0, 1, (h, w, channels)).astype(np.float32)
    rgba = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    pred_full = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    return pred, targ, rgba, pred_full


def _chw(a):
    return torch.from_numpy(np.transpose(a, (2, 0, 1)).copy())


def test_stdepth_plot_single_reference_parity():
    """4x4 mosaic (visualize.py:92-128): our HWC figure rasterizes
    IDENTICALLY to the reference's CHW figure on shared data — panel
    placement, channel slicing, colormaps, and titles all pinned."""
    ref_viz = _ref_visualize()
    rng = np.random.default_rng(3)
    pred, targ, rgba, pred_full = _mosaic_inputs(rng, 12, 16, 10)

    ours = _render(create_stdepth_plot_single(pred, targ, rgba, pred_full))
    ref = _render(ref_viz.create_stdepth_plot_single(
        _chw(pred), _chw(targ), _chw(rgba), _chw(pred_full)
    ))
    np.testing.assert_array_equal(ours, ref)


def test_stdepth_plot_multi_reference_parity():
    """6x5 mosaic for the 20-channel protocol (visualize.py:130-181)."""
    ref_viz = _ref_visualize()
    rng = np.random.default_rng(4)
    pred, targ, rgba, pred_full = _mosaic_inputs(rng, 12, 16, 20)

    ours = _render(create_stdepth_plot(pred, targ, rgba, pred_full))
    ref = _render(ref_viz.create_stdepth_plot(
        _chw(pred), _chw(targ), _chw(rgba), _chw(pred_full)
    ))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("channels,kind", [(10, "mosaic"), (20, "mosaic"),
                                           (1, "row")])
def test_save_stdepth_prediction_dispatch(tmp_path, channels, kind):
    """save_stdepth_prediction picks the figure by prediction channel count
    (10 -> 4x4, 20 -> 6x5, else rgb|gt|pred row) and writes a decodable
    image of the right geometry — the infer.py output contract
    (cli/infer.py:109-111)."""
    rng = np.random.default_rng(5)
    h, w = 12, 16
    x = rng.uniform(0, 1, (2, h, w, 4 if channels > 1 else 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, h, w, channels)).astype(np.float32)
    y_hat = rng.uniform(0, 1, (2, h, w, channels)).astype(np.float32)
    pred_full = rng.uniform(0, 1, (2, h, w, 4)).astype(np.float32)

    out = tmp_path / "pred_0000.png"
    save_stdepth_prediction(out, (x, y), y_hat, pred_full)
    assert out.exists()
    img = cv2.imread(str(out))
    assert img is not None
    if kind == "row":
        # merge_into_row geometry: rgb|gt|pred at source resolution
        assert img.shape == (h, 3 * w, 3)
    else:
        assert img.shape[0] > 100 and img.shape[1] > 100  # a real figure


def test_save_stdepth_prediction_u8_batch(tmp_path):
    """The device-side u8 loader path: uint8 inputs are dequantized before
    plotting (viz/__init__.py:190-191)."""
    rng = np.random.default_rng(6)
    h, w = 12, 16
    x = (rng.uniform(0, 1, (1, h, w, 3)) * 255).astype(np.uint8)
    y = rng.uniform(0.1, 1, (1, h, w, 1)).astype(np.float32)
    y_hat = rng.uniform(0.1, 1, (1, h, w, 1)).astype(np.float32)
    out = tmp_path / "u8.png"
    save_stdepth_prediction(out, (x, y), y_hat, y_hat)
    assert cv2.imread(str(out)).shape == (h, 3 * w, 3)
