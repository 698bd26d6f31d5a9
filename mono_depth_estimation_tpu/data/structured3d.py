"""Structured3D dataset.

Parity surface: /root/reference/datasets/structured3d_dataset.py:12-52.
Scenes split by directory order 0:3400 / 3400:3450 / 3450:; images are
'rgb_rawlight' files whose path contains the type suffix; depth is the
'depth' sibling, millimeters -> meters clipped to [0, 10].
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mono_depth_estimation_tpu.data.base import BaseDataset

DATASET_TYPES = [
    "perspective", "panorama", "panorama_empty", "panorama_simple", "panorama_full",
]


def get_structured3d_dataset(args, split, output_size, resize):
    return Structured3DDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        dataset_type=args.type,
    )


class Structured3DDataset(BaseDataset):
    def __init__(self, path, dataset_type="perspective", output_size=(360, 640),
                 resize=400, split="train"):
        super().__init__(split)
        assert dataset_type in DATASET_TYPES, dataset_type
        self.dataset_type = dataset_type
        self.output_size = output_size
        self.resize = resize
        self.path = path
        self._load_scene_names()
        self._load_images()

    def _load_scene_names(self):
        dirs = [d.stem for d in Path(self.path).glob("*") if d.is_dir()]
        if self.split == "train":
            self.scene_names = dirs[0:3400]
        elif self.split == "val":
            self.scene_names = dirs[3400:3450]
        else:
            self.scene_names = dirs[3450:]

    def _load_images(self):
        suffix = self.dataset_type.split("_")[-1]
        self.images = []
        for scene_name in self.scene_names:
            scene_dir = Path(self.path) / scene_name
            self.images += [
                img.as_posix()
                for img in scene_dir.glob("**/*")
                if "rgb_rawlight" in img.name and suffix in img.as_posix()
            ]

    def get_raw(self, index):
        from PIL import Image

        rgb_path = self.images[index]
        depth_path = rgb_path.replace("rgb_rawlight", "depth")
        rgb = np.asarray(Image.open(rgb_path).convert("RGB"))
        depth = np.asarray(Image.open(depth_path), dtype=np.float32)
        depth = np.clip(depth / 1000.0, 0, 10)
        return rgb, depth

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("structured3d")
        parser.add_argument(
            "--type", required=True, type=str,
            help="Structured3D type [perspective, panorama]",
        )
        BaseDataset.add_dataset_specific_args(parser)
        return parser
