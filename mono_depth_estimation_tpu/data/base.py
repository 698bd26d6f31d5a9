"""Dataset base classes.

Parity surface: /root/reference/datasets/dataset.py. Differences by design:

* ``transform`` is a per-sample callable assigned by the method layer (the
  reference does the same at modules/base_module.py:50,60,70); here it is
  always host-side numpy -> numpy with HWC layout (TPU-native NHWC batches).
* ``ConcatDataset`` precomputes a (dataset_id, item_id) table instead of the
  reference's quadratic per-item scan (datasets/dataset.py:53-54).
"""

from __future__ import annotations

import numpy as np


class BaseDataset:
    """Split-aware dataset. Subclasses populate ``self.images`` and
    implement ``get_raw(i) -> (rgb, depth)`` where rgb is HWC uint8 and
    depth is a float HW array or a list of float arrays (stdepth layers)."""

    def __init__(self, split: str):
        if not ("train" in split or split in ("val", "test")):
            raise RuntimeError(
                "Invalid dataset type: "
                + split
                + "\nSupported dataset types are: train, val, test"
            )
        self.split = split
        self.transform = None  # assigned by the method layer

    def get_raw(self, index: int):
        raise NotImplementedError()

    def __getitem__(self, index: int):
        rgb, depth = self.get_raw(index)
        if self.transform is None:
            return rgb, depth
        return self.transform(rgb, depth)

    def __len__(self) -> int:
        return len(self.images)

    @staticmethod
    def add_dataset_specific_args(parser):
        parser.add_argument("--path", required=True, type=str, help="Path to dataset")
        parser.add_argument("--training", action="store_true", help="dataset for training")
        parser.add_argument("--validation", action="store_true", help="dataset for validation")
        parser.add_argument("--test", action="store_true", help="dataset for test")


class ConcatDataset:
    """Multi-dataset mix with a pre-shuffled, precomputed index table."""

    def __init__(self, datasets, seed: int = 0):
        self.transform = None
        self.datasets = list(datasets)
        table = np.concatenate(
            [
                np.stack(
                    [np.full(len(d), di, np.int64), np.arange(len(d), dtype=np.int64)],
                    axis=1,
                )
                for di, d in enumerate(self.datasets)
            ]
        )
        rng = np.random.default_rng(seed)
        rng.shuffle(table, axis=0)
        self.table = table
        self.split = self.datasets[0].split if self.datasets else "train"

    def get_raw(self, i: int):
        di, ii = self.table[i]
        return self.datasets[di].get_raw(int(ii))

    def __getitem__(self, i: int):
        rgb, depth = self.get_raw(i)
        if self.transform is None:
            return rgb, depth
        return self.transform(rgb, depth)

    def __len__(self) -> int:
        return len(self.table)
