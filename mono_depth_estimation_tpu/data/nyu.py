"""NYU Depth v2 dataset.

Parity surface: /root/reference/datasets/nyu_dataloader.py:95-217. Covers the
official labeled .mat (h5py) path with all type variants and the
sparse-to-dense .h5 tree. The reference auto-downloads missing files
(nyu_dataloader.py:18-21,139-146); this environment has no egress, so a
missing file raises with the URL to fetch out of band.

get_raw returns (rgb HWC uint8, depth HW float32 meters).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mono_depth_estimation_tpu.data.base import BaseDataset

DATASET_TYPES = [
    "labeled", "no_mirror", "corrected", "mirror", "mirror_corrected",
    "sparse_2_dense", "no_mirror_no_window", "mirror_pixel",
    "mirror_pixel_corrected",
]

NYU_V2_SPLIT_MAT_URL = "http://horatio.cs.nyu.edu/mit/silberman/indoor_seg_sup/splits.mat"
NYU_V2_MAPPING_40_URL = "https://github.com/ankurhanda/nyuv2-meta-data/raw/master/classMapping40.mat"
NYU_V2_CORRECTED_MAT_URL = "https://cloudstore.uni-ulm.de/s/mRwWiLCCjsC6Rkf/download"

# Mirror frame indices (nyu_dataloader.py:23-25)
VAL_WINDOW_IDX = [6, 8, 9, 10, 11, 25, 29, 39, 40, 51]
VAL_MIRROR_IDX = [25, 26, 76, 77, 86, 102, 131, 161, 162, 171, 172, 194, 195,
                  196, 199, 259, 266, 267, 268, 269, 271, 272, 273, 276, 277,
                  282, 283, 285, 286, 287, 290, 292, 294, 299, 302, 303, 305,
                  306, 308, 310, 313, 314, 323, 391, 401, 423, 427, 435, 440,
                  445, 457, 458, 487, 496, 505, 579, 583, 585, 586, 606, 609,
                  612, 613, 619]
TRAIN_MIRROR_IDX = [18, 20, 21, 91, 103, 104, 128, 130, 136, 139, 142, 143,
                    144, 145, 208, 209, 264, 269, 305, 306, 307, 308, 309,
                    311, 313, 317, 381, 382, 384, 386, 387, 388, 389, 391,
                    392, 394, 395, 396, 398, 400, 402, 404, 405, 406, 409,
                    412, 413, 414, 415, 416, 418, 420, 421, 423, 425, 426,
                    428, 439, 441, 473, 501, 532, 559, 566, 569, 574, 587,
                    588, 600, 608, 613, 615, 639, 640, 665, 666, 705, 706,
                    743, 756, 767, 768, 769, 774, 775, 780, 781, 782, 784]
_MIRROR_EXCLUDE = [2, 8, 13, 15, 16, 27, 28, 34, 42, 52, 58, 60]


def get_nyu_dataset(args, split, output_size, resize):
    return NYUDataset(
        args.path, split=split, output_size=output_size, resize=resize,
        dataset_type=args.type,
        n_images=getattr(args, "n_images", -1),
    )


class NYUDataset(BaseDataset):
    def __init__(self, path, split="train", output_size=(228, 304), resize=250,
                 n_images=-1, dataset_type="labeled"):
        super().__init__(split)
        if dataset_type not in DATASET_TYPES:
            raise ValueError(
                f"unknown NYU dataset type [{dataset_type}]; available: {DATASET_TYPES}"
            )
        if "corrected" in dataset_type and split == "train":
            raise ValueError("Cannot use corrected depth during training!")
        self.dataset_type = dataset_type
        self.output_size = output_size
        self.resize = resize
        self.exclude_mirrors = dataset_type == "no_mirror"
        self.mirrors_only = dataset_type in [
            "mirror", "mirror_corrected", "mirror_pixel", "mirror_pixel_corrected"
        ]
        self.use_corrected_depth = "corrected" in dataset_type and split != "train"
        self.use_mat = dataset_type != "sparse_2_dense"
        self.mirror_pixel_only = "mirror_pixel" in dataset_type
        self._mat = None  # h5py handle opened lazily (fork/thread safe)

        if not self.use_mat:
            self.path = Path(path) / ("train" if "train" in split else "val")
            if not self.path.exists():
                raise FileNotFoundError(
                    f"{self.path} missing; download {'{}'.format('http://datasets.lids.mit.edu/sparse-to-dense/data/nyudepthv2.tar.gz')} and extract"
                )
            self.images = sorted(
                p.as_posix() for p in self.path.glob("**/*") if p.name.endswith(".h5")
            )
        else:
            self.path = Path(path)
            self.images = self._load_mat_indices()
        assert len(self.images) > 0, "Found 0 images in subfolders of: " + str(path)
        if self.mirrors_only:
            keep = TRAIN_MIRROR_IDX if split == "train" else VAL_MIRROR_IDX
            self.images = self.images[[i for i in range(len(self.images)) if i in keep]]
            self.images = self.images[
                [i for i in range(len(self.images)) if i not in _MIRROR_EXCLUDE]
            ]
        if n_images > 0:
            self.images = self.images[:n_images]

    # -- .mat path -------------------------------------------------------
    def _require(self, p: Path, url: str) -> Path:
        if not p.exists():
            raise FileNotFoundError(f"{p} missing; download from {url}")
        return p

    def _load_mat_indices(self):
        from scipy.io import loadmat

        self.mat_file = self.path / "nyu_depth_v2_labeled_corrected.mat"
        if not self.mat_file.exists():
            # fall back to the stock labeled mat (no corrected depths/masks)
            alt = self.path / "nyu_depth_v2_labeled.mat"
            if alt.exists():
                self.mat_file = alt
            else:
                raise FileNotFoundError(
                    f"{self.mat_file} missing; download from {NYU_V2_CORRECTED_MAT_URL}"
                )
        split_file = self._require(self.path / "split.mat", NYU_V2_SPLIT_MAT_URL)
        mapping_file = self._require(
            self.path / "classMapping40.mat", NYU_V2_MAPPING_40_URL
        )
        self.mapping40 = np.insert(loadmat(mapping_file)["mapClass"][0], 0, 0)
        key = "trainNdxs" if self.split == "train" else "testNdxs"
        return np.hstack(loadmat(split_file)[key]) - 1

    @property
    def mat(self):
        if self._mat is None:
            import h5py

            self._mat = h5py.File(self.mat_file, "r")
        return self._mat

    def mat_loader(self, index):
        data = self.mat
        if self.use_corrected_depth and "depths_corrected" in data:
            depth = data["depths_corrected"][index]
            if np.max(depth) == 0:
                depth = data["depths"][index]
        else:
            depth = data["depths"][index]
        rgb = np.transpose(data["images"][index], (2, 1, 0))
        depth = np.transpose(depth, (1, 0)).astype(np.float32)

        if self.mirror_pixel_only and "masks" in data:
            mask = np.transpose(data["masks"][index], (1, 0)).astype(bool)
            depth[~mask] = 0.0
        labels = np.transpose(data["labels"][index], (1, 0))
        labels_40 = self.mapping40[labels]
        if "no_mirror" in self.dataset_type:
            depth[labels_40 == 19] = 0  # mirrors
        if "no_window" in self.dataset_type:
            depth[labels_40 == 9] = 0  # windows
        return np.ascontiguousarray(rgb), depth

    # -- sparse-to-dense h5 tree ------------------------------------------
    def h5_loader(self, path):
        import h5py

        with h5py.File(path, "r") as h5f:
            rgb = np.transpose(np.array(h5f["rgb"]), (1, 2, 0))
            depth = np.array(h5f["depth"], dtype=np.float32)
        return rgb, depth

    def get_raw(self, index):
        entry = self.images[index]
        if self.use_mat:
            return self.mat_loader(int(entry))
        return self.h5_loader(entry)

    @staticmethod
    def add_dataset_specific_args(parent_parser):
        parser = parent_parser.add_parser("nyu")
        BaseDataset.add_dataset_specific_args(parser)
        parser.add_argument(
            "--type", type=str, default="labeled",
            help=f"available: {DATASET_TYPES}",
        )
        parser.add_argument("--n_images", type=int, default=-1)
        return parser
