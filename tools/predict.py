"""Serve predictions from an exported artifact (tools/export_model.py).

Standalone serving entry: needs ONLY jax + the artifact directory — the
model zoo, method layer, and checkpoint tree are not imported. Inputs are
.npy/.npz arrays (key 'rgb' for npz) or common image files (resized to the
artifact's input spec); outputs are pred_<stem>.npy plus a colormapped png.

    python tools/predict.py --artifact artifacts/bts --inputs imgs/ --out preds/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from mono_depth_estimation_tpu.utils.export_artifact import load_artifact

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}


def _load_input(path: Path, shape, dtype):
    """One input -> (H, W, C) array matching the artifact's spec."""
    h, w, c = shape[1], shape[2], shape[3]
    if path.suffix == ".npy":
        arr = np.load(path)
    elif path.suffix == ".npz":
        with np.load(path) as z:
            arr = z["rgb"] if "rgb" in z else z[list(z.files)[0]]
    else:
        from PIL import Image

        img = Image.open(path).convert("RGBA" if c == 4 else "RGB")
        img = img.resize((w, h), Image.BILINEAR)
        arr = np.asarray(img)
    arr = np.asarray(arr)
    if arr.ndim == 4:  # stored batched; take the first sample
        arr = arr[0]
    assert arr.shape[:2] == (h, w) and arr.shape[-1] == c, (
        f"{path}: got {arr.shape}, artifact expects {(h, w, c)}"
    )
    if np.dtype(dtype) == np.uint8 and arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    elif np.dtype(dtype) != np.uint8 and arr.dtype == np.uint8:
        arr = arr.astype(dtype) / 255.0
    return arr.astype(dtype)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--inputs", required=True,
                    help="Directory (or single file) of .npy/.npz/images")
    ap.add_argument("--out", default=None,
                    help="Output directory (default: <artifact>/predictions)")
    args = ap.parse_args(argv)

    predict, _, meta = load_artifact(args.artifact)
    shape, dtype = meta["input_shape"], meta["input_dtype"]
    batch_size = shape[0]

    inputs = Path(args.inputs)
    files = sorted(
        p for p in ([inputs] if inputs.is_file() else inputs.rglob("*"))
        if p.suffix in IMAGE_EXTS | {".npy", ".npz"}
    )
    assert files, f"no inputs under {inputs}"
    out_dir = Path(args.out or (Path(args.artifact) / "predictions"))
    out_dir.mkdir(parents=True, exist_ok=True)

    from mono_depth_estimation_tpu.viz import colored_depthmap, save_image

    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        arrs = [_load_input(p, shape, dtype) for p in chunk]
        while len(arrs) < batch_size:  # pad the tail batch
            arrs.append(arrs[-1])
        y = np.asarray(predict(jnp.asarray(np.stack(arrs)))["y_hat"], np.float32)
        for j, p in enumerate(chunk):
            np.save(out_dir / f"pred_{p.stem}.npy", y[j])
            d = y[j][..., 0]
            save_image(colored_depthmap(d, d.min(), max(d.max(), d.min() + 1e-6)),
                       out_dir / f"pred_{p.stem}.png")
    print(f"Wrote {len(files)} predictions to {out_dir}")


if __name__ == "__main__":
    main()
