#!/usr/bin/env python
"""NYU mirror-depth correction writer.

Capability parity with the reference's plane-fitting corrector
(datasets/nyu_dataloader.py:42-93 correct_depth + :185-217
depth_correct_writer): Kinect depth is wrong on mirrors, so annotated
mirror regions (mask pngs + three support points per region in points.json)
are replaced by depths from the plane through the three points. Writes the
corrected depths (and union masks) into a 'depths_corrected'/'masks' dataset
of an HDF5 copy of nyu_depth_v2_labeled.mat.

points.json format (reference): {"<frame_index>": [x0,y0,x1,y1,x2,y2]} or a
pair of two 6-lists for frames with two mirror regions, with masks
<index>.png / <index>_1.png / <index>_2.png next to it.

Usage:
  python tools/nyu_depth_correct.py --mat nyu_depth_v2_labeled_corrected.mat \
      --points points.json --masks ./masks [--indices 25 26 ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def plane_correct(depth: np.ndarray, points, mask_path: Path):
    """Replaces masked pixels with plane-equation depths.

    points: [x0, y0, x1, y1, x2, y2] image coordinates of three points on
    the mirror plane (reference swaps to row/col at nyu_dataloader.py:49-54).
    Vectorized form of the reference's per-pixel parametric solve (:56-79).
    """
    import cv2

    mask = cv2.imread(mask_path.as_posix(), cv2.IMREAD_GRAYSCALE)
    mask = cv2.dilate(mask, np.ones((5, 5), np.uint8), iterations=1)
    _, mask = cv2.threshold(mask, 128, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    mask = (mask.astype(np.float32) / 255).astype(bool)

    p0 = [points[1], points[0]]
    p1 = [points[3], points[2]]
    p2 = [points[5], points[4]]
    d0 = np.append(p0, depth[p0[0], p0[1]])
    d1 = np.append(p1, depth[p1[0], p1[1]])
    d2 = np.append(p2, depth[p2[0], p2[1]])

    a = d0 - d1
    b = d2 - d1
    v = d1

    out = depth.copy()
    ys, xs = np.where(mask)
    b_div = b[1] / b[0]
    top = xs - v[1] - ys * b_div + b_div * v[0]
    bottom = a[1] - a[0] * b_div
    s = top / bottom
    t = (ys - v[0] - a[0] * s) / b[0]
    out[ys, xs] = v[2] + a[2] * s + b[2] * t
    return out, mask


def correct_frame(index: int, depth: np.ndarray, points: dict, masks_dir: Path):
    pts = points[str(index)]
    if len(pts) == 2:  # two mirror regions
        depth, mask = plane_correct(depth, pts[0], masks_dir / f"{index}_1.png")
        depth, mask1 = plane_correct(depth, pts[1], masks_dir / f"{index}_2.png")
        mask = mask | mask1
    elif len(pts) == 6:
        depth, mask = plane_correct(depth, pts, masks_dir / f"{index}.png")
    else:
        raise ValueError(f"bad points entry for frame {index}: {pts}")
    return depth, mask


def main(argv=None):
    import h5py

    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", required=True,
                    help="HDF5 nyu mat (modified in place; make a copy first)")
    ap.add_argument("--points", required=True, help="points.json")
    ap.add_argument("--masks", default=".", help="directory with mask pngs")
    ap.add_argument("--indices", nargs="*", type=int, default=None)
    args = ap.parse_args(argv)

    points = json.loads(Path(args.points).read_text())
    masks_dir = Path(args.masks)
    with h5py.File(args.mat, "r+") as data:
        n = data["depths"].shape[0]
        if "depths_corrected" not in data:
            data.create_dataset(
                "depths_corrected", shape=data["depths"].shape, dtype=np.float32
            )
        if "masks" not in data:
            data.create_dataset(
                "masks", shape=data["depths"].shape, dtype=np.uint8
            )
        indices = args.indices if args.indices else [int(k) for k in points]
        for index in indices:
            depth = np.transpose(data["depths"][index], (1, 0))
            if str(index) in points:
                corrected, mask = correct_frame(index, depth, points, masks_dir)
            else:
                corrected, mask = depth, None
            data["depths_corrected"][index] = np.transpose(corrected, (1, 0))
            if mask is not None:
                data["masks"][index] = np.transpose(
                    mask.astype(np.uint8), (1, 0)
                )
            print(f"frame {index}: corrected")
    print(f"Updated {args.mat} ({len(indices)} frames)")


if __name__ == "__main__":
    main()
