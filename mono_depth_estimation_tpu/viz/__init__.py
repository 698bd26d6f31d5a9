"""Visualization (parity: /root/reference/visualize.py), channel-last.

Inferno-colormapped depth maps (visualize.py:8-17), side-by-side row merges
(:20-35), png writers (:58-89), and the 4x4 / 6x5 stdepth mosaic figures
(:92-181). All functions take HWC numpy arrays (this framework's layout);
matplotlib/cv2 work happens strictly host-side, never in the train loop's
device path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _np(x):
    a = np.asarray(x, dtype=np.float32)
    return a


def colored_depthmap(depth, d_min=None, d_max=None, do_mapping=True):
    import cv2

    depth = _np(depth)
    if d_min is None:
        d_min = np.min(depth)
    if d_max is None:
        d_max = np.max(depth)
    rel = (depth - d_min) / max(d_max - d_min, 1e-12)
    rel = (rel * 255).astype(np.uint8)
    if do_mapping:
        return cv2.applyColorMap(rel, cv2.COLORMAP_INFERNO)
    return rel


def merge_into_row(rgb, depth_target, depth_pred):
    import cv2

    rgb = 255 * _np(rgb)  # HWC in [0,1]
    rgb = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
    t = np.squeeze(_np(depth_target))
    p = np.squeeze(_np(depth_pred))
    d_min, d_max = min(t.min(), p.min()), max(t.max(), p.max())
    h, w = rgb.shape[:2]
    cols = [
        cv2.resize(colored_depthmap(m, d_min, d_max), (w, h))
        for m in (t, p)
    ]
    return np.hstack([rgb, *cols])


def add_row(img_merge, row):
    return np.vstack([img_merge, row])


def save_image(img_merge, filename):
    import cv2

    cv2.imwrite(str(filename), np.asarray(img_merge).astype("uint8"))


def save_images(path, idx, rgb=None, depth_gt=None, depth_pred=None):
    """Per-sample rgb/gt/pred jpgs with a shared depth color range
    (visualize.py:58-89)."""
    import cv2

    if path is None:
        return
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    min_, max_ = np.finfo(np.float16).max, np.finfo(np.float16).min
    if rgb is not None:
        arr = 255 * np.squeeze(_np(rgb))
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
        save_image(arr, path / f"{idx}_rgb.jpg")
    gt = pred = None
    if depth_gt is not None:
        gt = np.squeeze(_np(depth_gt))
        min_, max_ = min(gt.min(), min_), max(gt.max(), max_)
    if depth_pred is not None:
        pred = np.squeeze(_np(depth_pred))
        min_, max_ = min(pred.min(), min_), max(pred.max(), max_)
    if pred is not None:
        save_image(colored_depthmap(pred, min_, max_), path / f"{idx}_pred.jpg")
    if gt is not None:
        save_image(colored_depthmap(gt, min_, max_), path / f"{idx}_gt.jpg")


def _imshow(ax, img, **kw):
    ax.imshow(np.clip(np.squeeze(_np(img)), 0, 1) if "cmap" not in kw else np.squeeze(_np(img)), **kw)


def create_stdepth_plot_single(pred, targ, rgb, pred_full):
    """4x4 mosaic for the 10-channel protocol (visualize.py:92-128).
    Inputs are HWC: pred/targ (H, W, 10), rgb (H, W, 4), pred_full (H, W, 4)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred, targ, rgb, pred_full = map(_np, (pred, targ, rgb, pred_full))
    fig, ax = plt.subplot_mosaic(
        [
            ["RGBA (Input+Alpha)", "L1 Color (Targ)", "L1 Depth (Targ)", "Back Color (Targ)"],
            ["RGBA Recomp (Pred)", "L1 Color (Pred)", "L1 Depth (Pred)", "Back Color (Pred)"],
            ["Alpha (Pred)", "L1 Alpha (Pred)", "Back Alpha (Pred)", "FH Depth (Pred)"],
            ["Alpha (Targ)", "L1 Alpha (Targ)", "Back Alpha (Targ)", "FH Depth (Targ)"],
        ],
        figsize=(20, 20), tight_layout=True,
    )
    for n in ax:
        ax[n].set_title(n)
        ax[n].set_axis_off()
    _imshow(ax["RGBA (Input+Alpha)"], rgb[..., :4])
    _imshow(ax["RGBA Recomp (Pred)"], pred_full[..., :4])
    _imshow(ax["Back Color (Pred)"], pred[..., 4:7])
    _imshow(ax["Back Color (Targ)"], targ[..., 4:7])
    _imshow(ax["Alpha (Targ)"], rgb[..., 3], cmap="gray")
    _imshow(ax["Alpha (Pred)"], pred_full[..., 3], cmap="gray")
    _imshow(ax["Back Alpha (Pred)"], pred[..., 7], cmap="gray")
    _imshow(ax["Back Alpha (Targ)"], targ[..., 7], cmap="gray")
    _imshow(ax["L1 Color (Pred)"], pred[..., :3])
    _imshow(ax["L1 Color (Targ)"], targ[..., :3])
    _imshow(ax["L1 Alpha (Pred)"], pred[..., 3], cmap="gray")
    _imshow(ax["L1 Alpha (Targ)"], targ[..., 3], cmap="gray")
    _imshow(ax["L1 Depth (Pred)"], pred[..., 8], cmap="hot")
    _imshow(ax["L1 Depth (Targ)"], targ[..., 8], cmap="hot")
    _imshow(ax["FH Depth (Pred)"], pred[..., 9], cmap="hot")
    _imshow(ax["FH Depth (Targ)"], targ[..., 9], cmap="hot")
    return fig


def create_stdepth_plot(pred, targ, rgb, pred_full):
    """6x5 mosaic for the 20-channel protocol (visualize.py:130-181)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred, targ, rgb, pred_full = map(_np, (pred, targ, rgb, pred_full))
    fig, ax = plt.subplot_mosaic(
        [
            ["Color (Input)", "L1 Color (Targ)", "L2 Color (Targ)", "L3 Color (Targ)", "Back Color (Targ)"],
            ["Alpha (Targ)", "L1 Color (Pred)", "L2 Color (Pred)", "L3 Color (Pred)", "Back Color (Pred)"],
            ["Alpha (Pred)", "L1 Alpha (Pred)", "L2 Alpha (Pred)", "L3 Alpha (Pred)", "Back Alpha (Pred)"],
            ["Color (Targ)", "L1 Alpha (Targ)", "L2 Alpha (Targ)", "L3 Alpha (Targ)", "Back Alpha (Targ)"],
            ["Color (Pred)", "L1 Depth (Targ)", "L2 Depth (Targ)", "L3 Depth (Targ)", "Front Color"],
            ["none1", "L1 Depth (Pred)", "L2 Depth (Pred)", "L3 Depth (Pred)", "Front Alpha"],
        ],
        figsize=(25, 30), tight_layout=True,
    )
    for n in ax:
        ax[n].set_title(n)
        ax[n].set_axis_off()
    # the reference passes the full RGBA here (visualize.py:146-147:
    # imshow(rgb.permute(1,2,0)) on the 4-channel input) — alpha included
    _imshow(ax["Color (Input)"], rgb[..., :4])
    _imshow(ax["Color (Targ)"], rgb[..., :4])
    _imshow(ax["Color (Pred)"], pred_full[..., :3])
    _imshow(ax["Back Color (Pred)"], pred[..., 12:15])
    _imshow(ax["Back Color (Targ)"], targ[..., 12:15])
    _imshow(ax["Alpha (Targ)"], targ[..., 19], cmap="gray")
    _imshow(ax["Alpha (Pred)"], pred[..., 19], cmap="gray")
    _imshow(ax["Back Alpha (Pred)"], pred[..., 15], cmap="gray")
    _imshow(ax["Back Alpha (Targ)"], targ[..., 15], cmap="gray")
    for k, sl in (("L1", slice(0, 3)), ("L2", slice(4, 7)), ("L3", slice(8, 11))):
        _imshow(ax[f"{k} Color (Pred)"], pred[..., sl])
        _imshow(ax[f"{k} Color (Targ)"], targ[..., sl])
    for k, c in (("L1", 3), ("L2", 7), ("L3", 11)):
        _imshow(ax[f"{k} Alpha (Pred)"], pred[..., c], cmap="gray")
        _imshow(ax[f"{k} Alpha (Targ)"], targ[..., c], cmap="gray")
    for k, c in (("L1", 16), ("L2", 17), ("L3", 18)):
        _imshow(ax[f"{k} Depth (Pred)"], pred[..., c], cmap="hot")
        _imshow(ax[f"{k} Depth (Targ)"], targ[..., c], cmap="hot")
    return fig


def save_stdepth_prediction(path, batch, y_hat, pred_full):
    """Writes the appropriate stdepth mosaic (or an rgb/gt/pred row for
    plain depth batches) for the first sample of a batch."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if isinstance(batch, dict):
        x = np.asarray(batch.get("rgb_raw", batch.get("A")))[0]
        y = np.asarray(batch.get("depth_raw", batch.get("B")))[0]
    else:
        x, y = np.asarray(batch[0])[0], np.asarray(batch[1])[0]
    if x.dtype == np.uint8:  # device-side u8 loader path (ops/preproc.py)
        x = x.astype(np.float32) / 255.0
    p = np.asarray(y_hat)[0]
    pf = np.asarray(pred_full)[0]
    if p.shape[-1] == 10:
        fig = create_stdepth_plot_single(p, y, _pad_alpha(x), pf)
    elif p.shape[-1] == 20:
        fig = create_stdepth_plot(p, y, _pad_alpha(x), pf)
    else:
        row = merge_into_row(x[..., :3], y[..., :1], p[..., :1])
        save_image(row, path)
        return
    fig.savefig(path)
    plt.close(fig)


def _pad_alpha(x):
    if x.shape[-1] >= 4:
        return x
    return np.concatenate([x, np.ones((*x.shape[:-1], 1), x.dtype)], axis=-1)
