#!/usr/bin/env python
"""Depth map -> point cloud exporter.

Capability parity with /root/reference/depth2pointcloud.py — minus the
Blender dependency: the reference runs inside Blender to render front/back
depth and back-project; here the back-projection + PLY export run on any
depth image (png/exr/npy) or model prediction, vectorized through the
unproject op (the compute can run jitted on TPU for large batches).

Usage:
  python tools/depth2pointcloud.py --depth d.npy [--color c.png]
      [--angle-x 0.8575] [--clip-start 0.1] [--clip-end 100] -o out.ply
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_depth(path: str) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".npy":
        return np.load(p).astype(np.float32)
    if p.suffix == ".exr":
        import os

        os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
        import cv2

        img = cv2.imread(str(p), cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        return img[..., 0] if img.ndim == 3 else img
    from PIL import Image

    return np.asarray(Image.open(p), np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", required=True)
    ap.add_argument("--color", default=None)
    ap.add_argument("--back-depth", default=None,
                    help="optional backface depth (second layer, as in the "
                    "reference's frontface-culling pass)")
    ap.add_argument("--angle-x", type=float, default=0.8575,
                    help="horizontal FOV in radians")
    ap.add_argument("--clip-start", type=float, default=0.1)
    ap.add_argument("--clip-end", type=float, default=100.0)
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args(argv)

    from mono_depth_estimation_tpu.ops.unproject import unproject_fov, write_ply

    depth = load_depth(args.depth)
    pts, valid = unproject_fov(depth, args.angle_x, args.clip_start, args.clip_end)
    pts, valid = np.asarray(pts), np.asarray(valid)

    colors = None
    if args.color:
        from PIL import Image

        colors = np.asarray(Image.open(args.color).convert("RGB"))
        colors = colors.reshape(-1, 3)

    all_pts = [pts.reshape(-1, 3)]
    all_valid = [valid.reshape(-1)]
    all_colors = [colors] if colors is not None else None
    if args.back_depth:
        bpts, bvalid = unproject_fov(
            load_depth(args.back_depth), args.angle_x, args.clip_start,
            args.clip_end,
        )
        all_pts.append(np.asarray(bpts).reshape(-1, 3))
        all_valid.append(np.asarray(bvalid).reshape(-1))
        if all_colors is not None:
            all_colors.append(colors)

    n = write_ply(
        args.output,
        np.concatenate(all_pts),
        np.concatenate(all_colors) if all_colors else None,
        np.concatenate(all_valid),
    )
    print(f"Wrote {n} vertices to {args.output}")


if __name__ == "__main__":
    main()
