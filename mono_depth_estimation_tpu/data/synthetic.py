"""Synthetic procedurally-generated depth dataset (no reference counterpart).

Used by tests, benchmarks, and CI: the reference repo ships no test data at
all (SURVEY.md §4), so this generates deterministic random indoor-ish scenes
— soft gradients + a few rectangles at different depths — in either plain
depth mode (rgb uint8 + metric depth) or stdepth mode (RGBA layer stacks
with the 10/20-channel ground-truth protocol).

Also provides ``materialize_stdepth_dir`` which writes torchvtk-style *.pt
files so the real stdepth readers can be exercised end-to-end.
"""

from __future__ import annotations

import numpy as np

from mono_depth_estimation_tpu.data.base import BaseDataset


def get_synthetic_dataset(args, split, output_size, resize):
    return SyntheticDepthDataset(
        split=split,
        output_size=output_size,
        resize=resize,
        n_images=getattr(args, "n_images", 16),
        image_size=getattr(args, "image_size", (480, 640)),
        max_depth=getattr(args, "max_depth", 10.0),
    )


def _scene(rng: np.random.Generator, h: int, w: int, max_depth: float):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = (
        0.3 * max_depth
        + 0.5 * max_depth * (yy / h)
        + 0.1 * max_depth * np.sin(xx / w * 4 * np.pi)
    )
    rgb = np.stack(
        [
            0.4 + 0.5 * (xx / w),
            0.3 + 0.4 * (yy / h),
            0.6 - 0.3 * (xx / w),
        ],
        axis=-1,
    )
    for _ in range(int(rng.integers(2, 6))):
        rh, rw = int(rng.integers(h // 8, h // 3)), int(rng.integers(w // 8, w // 3))
        top, left = int(rng.integers(0, h - rh)), int(rng.integers(0, w - rw))
        d = float(rng.uniform(0.1, 0.9)) * max_depth
        color = rng.uniform(0.1, 1.0, size=3).astype(np.float32)
        depth[top : top + rh, left : left + rw] = d
        rgb[top : top + rh, left : left + rw] = color
    rgb = np.clip(rgb + rng.normal(0, 0.02, rgb.shape), 0, 1)
    return (rgb * 255).astype(np.uint8), depth.astype(np.float32)


class SyntheticDepthDataset(BaseDataset):
    def __init__(self, split="train", output_size=(228, 304), resize=250,
                 n_images=16, image_size=(480, 640), max_depth=10.0):
        super().__init__(split)
        self.output_size = output_size
        self.resize = resize
        self.image_size = image_size
        self.max_depth = max_depth
        if n_images <= 0:  # -1 means "all" for real datasets; default 16 here
            n_images = 16
        base = {"train": 0, "val": 10_000, "test": 20_000}[
            "train" if "train" in split else split
        ]
        self.images = list(range(base, base + n_images))

    def get_raw(self, index):
        rng = np.random.default_rng(self.images[index])
        h, w = self.image_size
        return _scene(rng, h, w, self.max_depth)

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("synthetic")
        # --path accepted for interface parity but unused
        parser.add_argument("--path", default="", type=str)
        parser.add_argument("--training", action="store_true")
        parser.add_argument("--validation", action="store_true")
        parser.add_argument("--test", action="store_true")
        parser.add_argument("--n_images", type=int, default=16)
        # source-scene resolution (GT maps are evaluated at this size, like
        # nyu's 480x640); tests shrink it to cut CPU metric/resize cost
        parser.add_argument("--image_size", type=int, nargs=2,
                            default=(480, 640))
        return parser


def synth_stdepth_item(seed: int, h: int = 128, w: int = 128) -> dict:
    """One torchvtk-style stdepth item: CHW float arrays, keys matching the
    reference readers (datasets/stdepth.py:80-85, stdepth_multi.py:76-78)."""
    rng = np.random.default_rng(seed)
    layers = []
    for k in range(3):
        rgb, depth = _scene(rng, h, w, 1.0)
        alpha = rng.uniform(0.2, 0.9) * np.ones((h, w), np.float32)
        layer = np.concatenate(
            [rgb.astype(np.float32) / 255.0, alpha[..., None], depth[..., None]],
            axis=-1,
        )  # (H, W, 5)
        layers.append(layer)
    stack = np.stack(layers, axis=0)
    idx = np.argsort(stack[..., -1], axis=0, kind="stable")
    stack_sorted = np.take_along_axis(stack, idx[..., None], axis=0)
    acc_rgb = stack_sorted[0, ..., :3].copy()
    acc_a = stack_sorted[0, ..., 3:4].copy()
    for i in range(1, 3):
        one_m = 1.0 - acc_a
        acc_rgb += one_m * stack_sorted[i, ..., 3:4] * stack_sorted[i, ..., :3]
        acc_a += one_m * stack_sorted[i, ..., 3:4]
    rgba = np.clip(np.concatenate([acc_rgb, acc_a], axis=-1), 0, 1)

    def chw(a):
        return np.transpose(a, (2, 0, 1)).astype(np.float32)

    first_hit = stack_sorted[0, ..., 4]
    return {
        "rgba": chw(rgba),
        "layer1": chw(layers[0]),
        "layer2": chw(layers[1]),
        "layer3": chw(layers[2]),
        "back": chw(layers[2][..., :4]),
        "first_hit": first_hit.astype(np.float32),
        "max_opacity": first_hit.astype(np.float32),
        "max_gradient": first_hit.astype(np.float32),
        "wysiwyg": first_hit.astype(np.float32),
    }


def materialize_stdepth_dir(path, n_train=4, n_val=2, n_test=2, h=128, w=128):
    """Writes torchvtk-style .pt files covering all three split ranges."""
    import torch
    from pathlib import Path

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    scenes = (
        [(i, i) for i in range(n_train)]
        + [(400 + i, 1000 + i) for i in range(n_val)]
        + [(450 + i, 2000 + i) for i in range(n_test)]
    )
    for scene_no, seed in scenes:
        item = {
            k: torch.from_numpy(v)
            for k, v in synth_stdepth_item(seed, h, w).items()
        }
        torch.save(item, path / f"vol-{scene_no}_render.pt")
    return path
