"""Floorplan3D synthetic dataset.

Parity surface: /root/reference/datasets/floorplan3d_dataloader.py:20-158.
Scene list from the cubicasa split txt (<split>.txt at the dataset root,
lines '<x>/<y>/<scene>/...'), images are color*.jpg paired with depth*.png
under directories whose parent name contains the dataset type
('diffuse'|'mirror'), gated on an existing complete.txt two levels up.
Depth png is millimeters -> meters, clipped to [0, 10].
"""

from __future__ import annotations

import enum
from pathlib import Path

import numpy as np

from mono_depth_estimation_tpu.data.base import BaseDataset


class DatasetType(enum.Enum):
    DIFFUSE = "diffuse"
    MIRROR = "mirror"


def get_floorplan3d_dataset(args, split, output_size, resize):
    return Floorplan3DDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        dataset_type=args.type, n_images=getattr(args, "n_images", -1),
    )


class Floorplan3DDataset(BaseDataset):
    def __init__(self, path, dataset_type, output_size, resize, n_images=-1,
                 split="train"):
        super().__init__(split)
        self.path = Path(path)
        self.output_size = output_size
        self.resize = resize
        self.dataset_type = DatasetType(dataset_type)
        self.n_images = n_images
        self._load_scene_names()
        self._load_images()

    def _load_cubicasa_split(self):
        split_file = self.path / f"{self.split}.txt"
        assert split_file.exists(), (
            f"Missing cubicasa split file: {split_file.as_posix()}"
        )
        with open(split_file) as txt:
            return [line.split("/")[2] for line in txt.readlines()]

    def _load_scene_names(self):
        names = set(self._load_cubicasa_split())
        self.scene_names = [s for s in self.path.glob("*/*") if s.name in names]

    def _load_images(self):
        self.images = []
        self.depth = []
        for scene in self.scene_names:
            imgs = [
                f for f in scene.glob("**/*")
                if "color" in f.name and ".jpg" in f.name
                and self.dataset_type.value in f.parent.name
            ]
            for img_path in imgs:
                depth_path = img_path.parent / img_path.name.replace(
                    "color", "depth"
                ).replace("jpg", "png")
                complete_file = Path(img_path.parents[1], "complete.txt")
                if img_path.exists() and depth_path.exists() and complete_file.exists():
                    self.images.append(img_path)
                    self.depth.append(depth_path)
        if self.n_images > 0:
            self.images = self.images[: self.n_images]
            self.depth = self.depth[: self.n_images]

    def get_raw(self, index):
        from PIL import Image

        rgb = np.asarray(Image.open(self.images[index]).convert("RGB"))
        depth = np.asarray(Image.open(self.depth[index]), dtype=np.float32)
        depth = np.clip(depth / 1000.0, 0, 10)
        return rgb, depth

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("floorplan3d")
        parser.add_argument(
            "--type", required=True, type=str,
            help="Floorplan3D type [diffuse, mirror]",
        )
        BaseDataset.add_dataset_specific_args(parser)
        parser.add_argument("--n_images", type=int, default=-1)
        return parser
