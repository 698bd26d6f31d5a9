"""Semi-transparent depth ("stdepth") dataset families.

Parity surfaces:
* /root/reference/datasets/stdepth.py        — single-depth renders
* /root/reference/datasets/stdepth_multi.py  — 3-layer decomposition with
  alpha un-compositing for the background (:86-98)
* /root/reference/datasets/stdepth_multi2.py — precomputed back layer,
  10-channel GT, RGBA (4-channel) network input (:84-88)

On-disk format is torchvtk's TorchDataset: a directory of ``*.pt`` files,
each a torch-serialized dict of named CHW float tensors ('rgba',
'layer1..3', 'first_hit', 'max_opacity', 'max_gradient', 'wysiwyg',
optionally 'back'). ``TorchVtkReader`` below replaces the torchvtk
dependency (not in this image) with a plain torch.load + numpy view.

Split rule (all three families): scene number parsed from the filename
('<...>-NNN_*.pt'); train < 400 <= val < 450 <= test (stdepth.py:15-22).

get_raw returns HWC uint8 rgb (RGBA for multi2) and a list of HWC float32
ground-truth planes (the method layer's preprocess concatenates them
channel-last).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mono_depth_estimation_tpu.data.base import BaseDataset

DEPTH_METHODS = ["first_hit", "max_opacity", "max_gradient", "wysiwyg"]


def _scene_number(fn: Path) -> int:
    return int(fn.name.split("_")[0].split("-")[-1])


def _split_filter(split: str):
    if split == "train":
        return lambda fn: _scene_number(fn) < 400
    if split == "val":
        return lambda fn: 400 <= _scene_number(fn) < 450
    if split == "test":
        return lambda fn: 450 <= _scene_number(fn)
    raise Exception(f"Invalid split: {split}. Either train, val or test")


class TorchVtkReader:
    """Minimal torchvtk.datasets.TorchDataset replacement: sorted *.pt files,
    filtered by filename, loaded with torch.load -> dict of numpy CHW."""

    def __init__(self, path, filter_fn=lambda _: True):
        self.files = sorted(
            p for p in Path(path).glob("*.pt") if filter_fn(p)
        )

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        import torch

        item = torch.load(self.files[i], map_location="cpu", weights_only=False)
        return {
            k: (v.float().numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in item.items()
        }


def _chw_to_hwc(a: np.ndarray) -> np.ndarray:
    if a.ndim == 2:
        return a[..., None]
    return np.transpose(a, (1, 2, 0))


# numpy twins of ops/compositing (same formulas; agreement unit-tested)
def _np_depth_sort(layers: np.ndarray) -> np.ndarray:
    """(L, H, W, C) sorted ascending by last channel, stable."""
    idx = np.argsort(layers[..., -1], axis=0, kind="stable")  # (L, H, W)
    return np.take_along_axis(layers, idx[..., None], axis=0)


def _np_composite(layers: np.ndarray) -> np.ndarray:
    """(L, H, W, C>=4) sorted stack -> (H, W, 4)."""
    acc_rgb = layers[0, ..., :3].copy()
    acc_a = layers[0, ..., 3:4].copy()
    for i in range(1, layers.shape[0]):
        one_m = 1.0 - acc_a
        acc_rgb = acc_rgb + one_m * layers[i, ..., 3:4] * layers[i, ..., :3]
        acc_a = acc_a + one_m * layers[i, ..., 3:4]
    return np.clip(np.concatenate([acc_rgb, acc_a], axis=-1), 0.0, 1.0)


# ---------------------------------------------------------------- single

def get_stdepth_dataset(args, split, output_size, resize):
    kwargs = {}
    if hasattr(args, "background_depth_max"):
        kwargs["set_bg_depth"] = args.background_depth_max
    return SemiTransparentDepthDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        filter_fn=_split_filter(split), depth_method=args.depth_method, **kwargs
    )


class SemiTransparentDepthDataset(BaseDataset):
    def __init__(self, path, resize, output_size, filter_fn=lambda _: True,
                 depth_method="first_hit", set_bg_depth=False, split="train"):
        super().__init__(split)
        self.resize = resize
        self.output_size = output_size
        self.path = path
        self.reader = TorchVtkReader(path, filter_fn=filter_fn)
        self.depth_method = depth_method
        self.set_bg_depth = set_bg_depth

    def get_raw(self, index):
        item = self.reader[index]
        rgba = _chw_to_hwc(item["rgba"])
        rgb = np.clip(rgba[..., :3] * 255.0, 0.0, 255.0).astype(np.uint8)
        depth = _chw_to_hwc(item[self.depth_method]).astype(np.float32)
        if self.set_bg_depth:
            depth[depth == 0.0] = 1.0
        # (H, W, 1): unit-range plane -> quantize-mode in the policies
        # (the reference's torch tensors go through ToPILImage mul(255))
        return rgb, depth[..., :1]

    def __len__(self):
        return len(self.reader)

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("stdepth")
        BaseDataset.add_dataset_specific_args(parser)
        parser.add_argument(
            "--depth-method", type=str, default="first_hit",
            help="Depth method. first_hit, max_opacity, max_gradient, wysiwyg",
        )
        parser.add_argument(
            "--background-depth-max", action="store_true",
            help="Replace background depth (0.0) with max depth (1.0)",
        )
        return parser


# ---------------------------------------------------------------- multi

def get_stdepthmulti_dataset(args, split, output_size, resize):
    return SemiTransparentMultiDepthDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        filter_fn=_split_filter(split), single_layer=args.single_layer,
        set_bg_depth=args.background_depth_max,
    )


class SemiTransparentMultiDepthDataset(BaseDataset):
    def __init__(self, path, resize, output_size, filter_fn=lambda _: True,
                 single_layer=False, set_bg_depth=False, split="train"):
        super().__init__(split)
        self.resize = resize
        self.output_size = output_size
        self.path = path
        self.reader = TorchVtkReader(path, filter_fn=filter_fn)
        self.set_bg_depth = set_bg_depth
        self.single_layer = single_layer

    def get_raw(self, index):
        item = self.reader[index]
        rgba = np.clip(_chw_to_hwc(item["rgba"]), 0.0, 1.0)
        l1 = _chw_to_hwc(item["layer1"])
        l2 = _chw_to_hwc(item["layer2"])
        l3 = _chw_to_hwc(item["layer3"])
        if self.set_bg_depth:
            for layer in (l1, l2, l3):
                d = layer[..., 4]
                d[d == 0.0] = 1.0
        if self.single_layer:
            front = l1[..., :4]
        else:
            sorted_layers = _np_depth_sort(np.stack([l1, l2, l3], axis=0))
            front = _np_composite(sorted_layers)
        # alpha un-compositing of the background (stdepth_multi.py:88-90)
        with np.errstate(divide="ignore", invalid="ignore"):
            back_a = (rgba[..., 3:4] - front[..., 3:4]) / (1.0 - front[..., 3:4])
            back_rgb = (rgba[..., :3] - front[..., :3]) / (
                (1.0 - front[..., 3:4]) * back_a
            )
        back = np.nan_to_num(
            np.clip(np.concatenate([back_rgb, back_a], axis=-1), 0.0, 1.0),
            posinf=0.0, neginf=0.0,
        )
        if self.single_layer:
            gt = [l1[..., :4], back, l1[..., 4:5], rgba[..., 3:4]]  # 10 ch
        else:
            gt = [
                l1[..., :4], l2[..., :4], l3[..., :4],  # 12 ch
                back,                                    # 4 ch
                np.stack(
                    [l1[..., 4], l2[..., 4], l3[..., 4], rgba[..., 3]], axis=-1
                ),                                       # 4 ch -> 20 total
            ]
        rgb = np.clip(rgba[..., :3] * 255.0, 0.0, 255.0).astype(np.uint8)
        return rgb, gt

    def __len__(self):
        return len(self.reader)

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("stdepthmulti")
        BaseDataset.add_dataset_specific_args(parser)
        parser.add_argument("--depth-method", type=str, default="multi")
        parser.add_argument(
            "--single-layer", action="store_true",
            help="Do the multi thing but just with 1 layer",
        )
        parser.add_argument("--background-depth-max", action="store_true")
        return parser


# ---------------------------------------------------------------- multi2

def get_stdepthmulti2_dataset(args, split, output_size, resize):
    return SemiTransparentMulti2DepthDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        filter_fn=_split_filter(split), single_layer=args.single_layer,
        set_bg_depth=args.background_depth_max,
    )


class SemiTransparentMulti2DepthDataset(BaseDataset):
    """10-channel GT [front RGBA, back RGBA, D_wysiwyg, D_firsthit]; the
    network input is the full 4-channel RGBA composite (stdepth_multi2.py:
    84-88) — why BtsModule slices x[:, :3] (modules/bts.py:104)."""

    def __init__(self, path, resize, output_size, filter_fn=lambda _: True,
                 single_layer=False, set_bg_depth=False, split="train"):
        super().__init__(split)
        self.resize = resize
        self.output_size = output_size
        self.path = path
        self.reader = TorchVtkReader(path, filter_fn=filter_fn)
        self.set_bg_depth = set_bg_depth
        self.single_layer = single_layer

    def get_raw(self, index):
        item = self.reader[index]
        rgba = np.clip(_chw_to_hwc(item["rgba"]), 0.0, 1.0)
        l1 = _chw_to_hwc(item["layer1"])
        l3 = _chw_to_hwc(item["layer3"])
        if self.set_bg_depth:
            for layer in (l1, l3):
                d = layer[..., 4]
                d[d == 0.0] = 1.0
        back = _chw_to_hwc(item["back"])
        gt = [l1[..., :4], back, l1[..., 4:5], l3[..., 4:5]]  # 10 ch
        rgba_u8 = np.clip(rgba * 255.0, 0.0, 255.0).astype(np.uint8)
        return rgba_u8, gt

    def __len__(self):
        return len(self.reader)

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("stdepthmulti2")
        BaseDataset.add_dataset_specific_args(parser)
        parser.add_argument("--depth-method", type=str, default="multi2")
        parser.add_argument("--single-layer", action="store_true")
        parser.add_argument("--background-depth-max", action="store_true")
        return parser
