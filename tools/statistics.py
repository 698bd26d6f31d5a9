#!/usr/bin/env python
"""Dataset statistics -> statistics.json.

Capability analogue of /root/reference/statistics.py (a Blender script that
records per-room furniture/camera stats during Floorplan3D scene generation
— it needs the Blender scene, which doesn't exist outside the generator).
This tool computes the statistics available from the rendered datasets
themselves: image/scene counts, depth range/mean/std, invalid-pixel ratio,
and a depth histogram — per split, for any registered dataset family.

Usage:
  python tools/statistics.py <dataset> --path ... [--type ...] \
      [--splits train val test] [-o statistics.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def dataset_stats(ds, max_images: int = 200) -> dict:
    n = len(ds)
    step = max(1, n // max_images)
    mins, maxs, means, stds, invalid = [], [], [], [], []
    hist = np.zeros(20, np.int64)
    edges = None
    for i in range(0, n, step):
        _, depth = ds.get_raw(i)
        if isinstance(depth, (list, tuple)):  # stdepth: use the depth planes
            depth = np.concatenate([np.asarray(d).ravel() for d in depth[-2:]])
        depth = np.asarray(depth, np.float32).ravel()
        valid = depth > 0
        invalid.append(1.0 - valid.mean())
        if valid.any():
            dv = depth[valid]
            mins.append(float(dv.min()))
            maxs.append(float(dv.max()))
            means.append(float(dv.mean()))
            stds.append(float(dv.std()))
            if edges is None:
                edges = np.linspace(0, max(dv.max(), 1e-6) * 1.2, 21)
            h, _ = np.histogram(dv, bins=edges)
            hist += h
    return {
        "num_images": n,
        "sampled": len(means),
        "depth_min": min(mins) if mins else None,
        "depth_max": max(maxs) if maxs else None,
        "depth_mean": float(np.mean(means)) if means else None,
        "depth_std": float(np.mean(stds)) if stds else None,
        "invalid_ratio": float(np.mean(invalid)) if invalid else None,
        "histogram": hist.tolist(),
        "histogram_edges": edges.tolist() if edges is not None else None,
    }


def main(argv=None):
    from mono_depth_estimation_tpu.data import NAME2FUNC

    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=list(NAME2FUNC))
    ap.add_argument("--path", default="")
    ap.add_argument("--type", default=None)
    ap.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    ap.add_argument("--depth-method", default="first_hit")
    ap.add_argument("--single-layer", action="store_true")
    ap.add_argument("--max-images", type=int, default=200)
    ap.add_argument("-o", "--output", default="statistics.json")
    args = ap.parse_args(argv)

    ns = Namespace(
        path=args.path, type=args.type, depth_method=args.depth_method,
        single_layer=args.single_layer, background_depth_max=False,
        n_images=-1,
    )
    out = {}
    for split in args.splits:
        try:
            ds = NAME2FUNC[args.dataset](ns, split, (480, 640), 500)
        except Exception as e:
            out[split] = {"error": str(e)}
            continue
        out[split] = dataset_stats(ds, args.max_images)
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
