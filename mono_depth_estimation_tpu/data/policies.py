"""Per-method preprocessing/augmentation policies (host-side, PIL parity).

Every method in the reference installs its own transform onto the dataset
(modules/base_module.py:50,60,70). These are the faithful numpy/PIL
re-implementations, keyed by policy name; each returns HWC float32 arrays
(TPU-native channel-last; the reference returns CHW tensors).

Policies and their sources:
  default_*   BaseModule.train/val_preprocess (base_module.py:234-284):
              scale s~U(1,1.5) with depth/s, shorter-side resize, rotate
              +-5 deg (nearest), resize by s, center crop, flip, /255.
  bts_*       modules/bts.py:154-221: 5% border crop, rotate +-2.5 deg,
              resize h in {512..720}, random crop, flip, /255.
  midas_*     modules/midas.py:107-184: random resize 384..719, random
              crop 384, flip; RGB gets the MiDaS default transform
              (ImageNet normalize); test pads to square 640 then resizes.
  vnl_*       modules/vnl.py:16-138: cv2 pipeline to 385x385 dict batches.
  sharpnet_*  modules/sharpnet.py:17-64.
  my_*        modules/my.py:83-130: BTS-like with gamma/brightness/color.

Semantics replicated on purpose (documented quirks):
* PIL float ('F' mode) depths pass through transforms unscaled, then the
  final /255 of the reference divides metric depths by 255 (both target
  and learned predictions scale together, so delta/relative metrics are
  unchanged; absolute ones are in units of 255 m).
* stdepth [0,1] float layer stacks coming in as multi-channel arrays are
  quantized to uint8 (ToPILImage mul(255).byte()) and restored by the
  final /255 — an 8-bit round trip.
* TF.rotate on PIL uses NEAREST resampling; transforms.Resize(int) resizes
  the shorter side with antialiased bilinear.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

RGB_PIXEL_MEANS = (0.485, 0.456, 0.406)
RGB_PIXEL_VARS = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------- helpers

def _rgb_to_pil(rgb) -> Image.Image:
    if isinstance(rgb, Image.Image):
        return rgb
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8) if rgb.max() <= 1.0 + 1e-6 else rgb.astype(np.uint8)
    return Image.fromarray(rgb)


def _depth_to_pil(d) -> Image.Image:
    """ToPILImage parity. Shape convention (matches the reference's
    type-dependent behavior — numpy metric depths go through mode 'F'
    unscaled, torch [0,1] tensors get mul(255).byte() quantization):

      (H, W) float        -> 'F' (metric depth; the trailing /255 of the
                             policies then yields meters/255, the
                             reference quirk)
      (H, W, 1) float     -> quantized uint8 'L' (stdepth [0,1] planes;
                             the trailing /255 restores [0,1] at 8 bits)
      (H, W, 2..4) float  -> quantized 'LA'/'RGB'/'RGBA'
      uint8               -> passthrough
    """
    if isinstance(d, Image.Image):
        return d
    d = np.asarray(d)
    if d.ndim == 2:
        if d.dtype == np.uint8:
            return Image.fromarray(d, mode="L")
        return Image.fromarray(d.astype(np.float32), mode="F")
    if d.ndim == 3 and d.shape[-1] == 1:
        q = np.clip(np.asarray(d[..., 0], np.float32) * 255.0, 0, 255)
        return Image.fromarray(q.astype(np.uint8), mode="L")
    # multi-channel float in [0,1] -> 8-bit (reference ToPILImage on tensors)
    q = np.clip(np.asarray(d, np.float32) * 255.0, 0, 255).astype(np.uint8)
    mode = {2: "LA", 3: "RGB", 4: "RGBA"}[q.shape[-1]]
    return Image.fromarray(q, mode=mode)


def _pil_to_np(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def _as_depth_list(depth):
    if isinstance(depth, (list, tuple)):
        return list(depth), True
    return [depth], False


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if h <= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    return img.resize((nw, nh), Image.BILINEAR)


def resize_to(img: Image.Image, size_hw: tuple[int, int]) -> Image.Image:
    return img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)


def center_crop(img: Image.Image, size_hw: tuple[int, int]) -> Image.Image:
    th, tw = size_hw
    w, h = img.size
    if w < tw or h < th:  # pad like torchvision CenterCrop
        canvas = Image.new(img.mode, (max(w, tw), max(h, th)), 0)
        canvas.paste(img, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
        img = canvas
        w, h = img.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def rotate(img: Image.Image, angle: float) -> Image.Image:
    # torchvision TF.rotate on PIL: NEAREST, expand=False, fill 0
    return img.rotate(angle, resample=Image.NEAREST)


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def crop_xywh(img: Image.Image, top: int, left: int, h: int, w: int) -> Image.Image:
    return img.crop((left, top, left + w, top + h))


def color_jitter(img: Image.Image, rng, brightness=0.4, contrast=0.4, saturation=0.4):
    """torchvision ColorJitter(b, c, s) with random order."""
    from PIL import ImageEnhance

    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast:
        f2 = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
    if saturation:
        f3 = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
    order = rng.permutation(len(ops))
    for k in order:
        img = ops[k](img)
    return img


def _stack_depths(depths: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([d for d in depths], axis=-1)


# ---------------------------------------------------------------- default

def default_train_preprocess(rgb, depth, *, resize, output_size, rng):
    """BaseModule.train_preprocess (base_module.py:234-265)."""
    depths, _ = _as_depth_list(depth)
    s = rng.uniform(1, 1.5)
    # the reference divides EVERY gt plane by s (base_module.py:235-236)
    depths = [np.asarray(d, np.float32) / s for d in depths]
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    rgb = resize_shorter(rgb, resize)
    depths = [resize_shorter(d, resize) for d in depths]
    angle = rng.uniform(-5, 5)
    rgb = rotate(rgb, angle)
    depths = [rotate(d, angle) for d in depths]
    rgb = resize_shorter(rgb, int(resize * s))
    depths = [resize_shorter(d, int(resize * s)) for d in depths]
    rgb = center_crop(rgb, output_size)
    depths = [center_crop(d, output_size) for d in depths]
    if rng.uniform(0, 1) > 0.5:
        rgb = hflip(rgb)
        depths = [hflip(d) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) / 255.0 for d in depths])
    return rgb_np, depth_np


def default_val_preprocess(rgb, depth, *, resize, output_size, rng=None):
    """BaseModule.val_preprocess (base_module.py:267-281)."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    rgb = resize_shorter(rgb, resize)
    depths = [resize_shorter(d, resize) for d in depths]
    rgb = center_crop(rgb, output_size)
    depths = [center_crop(d, output_size) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) / 255.0 for d in depths])
    return rgb_np, depth_np


# ---------------------------------------------------------------- bts

def bts_train_preprocess(rgb, depth, *, output_size, rng, resize=None):
    """modules/bts.py:154-200."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    w, h = rgb.size
    box = (w * 0.05, h * 0.05, w * 0.95, h * 0.95)
    rgb = rgb.crop(box)
    depths = [d.crop(box) for d in depths]
    angle = rng.uniform(-2.5, 2.5)
    rgb = rotate(rgb, angle)
    depths = [rotate(d, angle) for d in depths]
    size = int(rng.choice([512, 518, 550, 600, 650, 720]))
    rgb = resize_shorter(rgb, size)
    depths = [resize_shorter(d, size) for d in depths]
    th, tw = output_size
    top = int(rng.integers(0, rgb.size[1] - th + 1))
    left = int(rng.integers(0, rgb.size[0] - tw + 1))
    rgb = crop_xywh(rgb, top, left, th, tw)
    depths = [crop_xywh(d, top, left, th, tw) for d in depths]
    if rng.uniform(0, 1) > 0.5:
        rgb = hflip(rgb)
        depths = [hflip(d) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) / 255.0 for d in depths])
    return rgb_np, depth_np


def bts_val_preprocess(rgb, depth, *, resize, output_size, rng=None):
    """modules/bts.py:202-218 (identical math to default_val)."""
    return default_val_preprocess(rgb, depth, resize=resize, output_size=output_size)


# ---------------------------------------------------------------- midas

def _midas_normalize(rgb_np01: np.ndarray) -> np.ndarray:
    """The MiDaS hub default_transform normalization (ImageNet stats)."""
    mean = np.asarray(RGB_PIXEL_MEANS, np.float32)
    std = np.asarray(RGB_PIXEL_VARS, np.float32)
    return (rgb_np01 - mean) / std


def midas_train_preprocess(rgb, depth, *, rng, resize=None, output_size=(384, 384)):
    """modules/midas.py:107-130."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    size = int(rng.integers(384, 720))
    rgb = resize_shorter(rgb, size)
    depths = [resize_shorter(d, size) for d in depths]
    th, tw = output_size
    top = int(rng.integers(0, rgb.size[1] - th + 1))
    left = int(rng.integers(0, rgb.size[0] - tw + 1))
    rgb = crop_xywh(rgb, top, left, th, tw)
    depths = [crop_xywh(d, top, left, th, tw) for d in depths]
    if rng.uniform(0, 1) > 0.5:
        rgb = hflip(rgb)
        depths = [hflip(d) for d in depths]
    rgb_np = _midas_normalize(_pil_to_np(rgb) / 255.0)
    depth_np = _stack_depths([_pil_to_np(d) / 255.0 for d in depths])
    return rgb_np, depth_np


def midas_val_preprocess(rgb, depth, *, resize=384, output_size=(384, 384), rng=None):
    """modules/midas.py:132-150."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    rgb = resize_shorter(rgb, 384)
    depths = [resize_shorter(d, 384) for d in depths]
    rgb = center_crop(rgb, (384, 384))
    depths = [center_crop(d, (384, 384)) for d in depths]
    rgb_np = _midas_normalize(_pil_to_np(rgb) / 255.0)
    depth_np = _stack_depths([_pil_to_np(d) / 255.0 for d in depths])
    return rgb_np, depth_np


def midas_test_preprocess(rgb, depth, *, resize=None, output_size=None, rng=None):
    """modules/midas.py:152-184: resize 500 -> crop 480x640 -> pad to 640
    square -> resize 384; returns the dict protocol with raw copies."""
    import cv2

    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    rgb = resize_shorter(rgb, 500)
    depths = [resize_shorter(d, 500) for d in depths]
    rgb = center_crop(rgb, (480, 640))
    depths = [center_crop(d, (480, 640)) for d in depths]
    rgb_raw = np.asarray(rgb, np.uint8)
    depth_raw = [_pil_to_np(d) for d in depths]
    rgb_pad = cv2.copyMakeBorder(rgb_raw, 0, 160, 0, 0, cv2.BORDER_CONSTANT, value=[0, 0, 0])
    depth_pad = [
        cv2.copyMakeBorder(d[..., 0], 0, 160, 0, 0, cv2.BORDER_CONSTANT, value=[0])
        for d in depth_raw
    ]
    rgb_rs = cv2.resize(rgb_pad, (384, 384))
    depth_rs = [cv2.resize(d, (384, 384))[..., None] for d in depth_pad]
    return {
        "rgb_raw": rgb_raw.astype(np.float32) / 255.0,
        "depth_raw": _stack_depths(depth_raw),
        "rgb": _midas_normalize(rgb_rs.astype(np.float32) / 255.0),
        "depth": _stack_depths(depth_rs) / 255.0,
    }


# ---------------------------------------------------------------- vnl

VNL_CROP_SIZE = (385, 385)


def _vnl_preprocess(rgb, depth, phase, rng):
    """modules/vnl.py:92-117 cv2 pipeline -> dict batch."""
    import cv2

    a = np.asarray(_rgb_to_pil(rgb), np.uint8)
    d = np.asarray(depth, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    if d.shape[0] != 512:
        s = 512 / d.shape[0]
        a = cv2.resize(a, (0, 0), fx=s, fy=s)
        d = cv2.resize(d, (0, 0), fx=s, fy=s)
    uh, uw = d.shape[:2]

    flip_flg = bool(rng.uniform(0, 1) > 0.5 and "train" in phase)
    raw_size = np.array([VNL_CROP_SIZE[1], 416, 448, 480, 512])
    size_index = int(rng.integers(0, len(raw_size))) if "train" in phase else len(raw_size) - 1
    sz = int(raw_size[size_index])
    pad_height = sz - uh if sz > uh else 0
    start_x = int(rng.integers(0, int(uw - sz) + 1))
    start_y = 0 if pad_height != 0 else int(rng.integers(0, int(uh - sz) + 1))
    resize_ratio = float(VNL_CROP_SIZE[1] / sz)

    def fprc(img, pad_value):
        if flip_flg:
            img = np.flip(img, axis=1)
        pads = ((pad_height, 0), (0, 0)) + (((0, 0),) if img.ndim == 3 else ())
        img = np.pad(img, pads, "constant", constant_values=pad_value)
        img = img[start_y : start_y + sz, start_x : start_x + sz]
        return cv2.resize(
            img, (VNL_CROP_SIZE[1], VNL_CROP_SIZE[0]), interpolation=cv2.INTER_LINEAR
        )

    a_rs = fprc(a, 128).astype(np.float32) / 255.0
    a_rs = (a_rs - np.asarray(RGB_PIXEL_MEANS, np.float32)) / np.asarray(
        RGB_PIXEL_VARS, np.float32
    )
    b_rs = fprc(d, -1).astype(np.float32) / resize_ratio

    out = {
        "A": a_rs,                       # (385, 385, 3) normalized
        "B": b_rs[..., None],            # (385, 385, 1)
        "invalid_side": np.array([int(pad_height * resize_ratio), 0, 0, 0]),
        "ratio": np.float32(1.0 / resize_ratio),
    }
    if "train" not in phase:
        # restore_prediction target (modules/vnl.py:107,232-246): the
        # raw-scale depth at the 512-high source resolution ('B_raw').
        # Val/test only — sizes are uniform there (size_index is pinned to
        # 512, so pad_height == 0 and the restore is purely /ratio +
        # resize), which keeps the batch jit-static; train restores are a
        # viz/log nicety in the reference and are skipped here.
        out["B_raw"] = np.ascontiguousarray(d, np.float32)[..., None]
    return out


def vnl_train_preprocess(rgb, depth, *, rng, resize=None, output_size=None):
    return _vnl_preprocess(rgb, depth, "train", rng)


def vnl_val_preprocess(rgb, depth, *, rng=None, resize=None, output_size=None):
    rng = rng or np.random.default_rng(0)
    return _vnl_preprocess(rgb, depth, "val", rng)


# ---------------------------------------------------------------- sharpnet

def sharpnet_train_preprocess(rgb, depth, *, rng, resize=None, output_size=(240, 320)):
    """modules/sharpnet.py:17-47."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    size = int(rng.integers(240, 720))
    rgb = resize_shorter(rgb, size)
    depths = [resize_shorter(d, size) for d in depths]
    th, tw = output_size
    top = int(rng.integers(0, max(rgb.size[1] - th, 0) + 1))
    left = int(rng.integers(0, max(rgb.size[0] - tw, 0) + 1))
    rgb = crop_xywh(rgb, top, left, th, tw)
    depths = [crop_xywh(d, top, left, th, tw) for d in depths]
    if rng.uniform(0, 1) > 0.5:
        rgb = hflip(rgb)
        depths = [hflip(d) for d in depths]
    angle = rng.uniform(-6, 6)
    rgb = rotate(rgb, angle)
    depths = [rotate(d, angle) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) for d in depths])
    s = rng.uniform(0.5, 2)
    rgb_np = rgb_np / s
    depth_np = depth_np / s
    rgb_np = (rgb_np - np.asarray(RGB_PIXEL_MEANS, np.float32)) / np.asarray(
        RGB_PIXEL_VARS, np.float32
    )
    return rgb_np, depth_np


def sharpnet_val_preprocess(rgb, depth, *, rng=None, resize=240, output_size=(240, 320)):
    """modules/sharpnet.py:49-64 (no normalize on val, as in the reference)."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    rgb = resize_shorter(rgb, 240)
    depths = [resize_shorter(d, 240) for d in depths]
    rgb = center_crop(rgb, (240, 320))
    depths = [center_crop(d, (240, 320)) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) for d in depths])
    return rgb_np, depth_np


# ---------------------------------------------------------------- mynet

def my_train_preprocess(rgb, depth, *, rng, output_size=(384, 384), resize=None):
    """modules/my.py:83-130: BTS-style geometry + gamma/brightness/color."""
    depths, _ = _as_depth_list(depth)
    rgb = _rgb_to_pil(rgb)
    depths = [_depth_to_pil(d) for d in depths]
    w, h = rgb.size
    box = (w * 0.05, h * 0.05, w * 0.95, h * 0.95)
    rgb = rgb.crop(box)
    depths = [d.crop(box) for d in depths]
    angle = rng.uniform(-2.5, 2.5)
    rgb = rotate(rgb, angle)
    depths = [rotate(d, angle) for d in depths]
    size = int(rng.choice([416, 452, 489, 507, 518, 550, 600, 650, 720]))
    rgb = resize_shorter(rgb, size)
    depths = [resize_shorter(d, size) for d in depths]
    th, tw = output_size
    top = int(rng.integers(0, rgb.size[1] - th + 1))
    left = int(rng.integers(0, rgb.size[0] - tw + 1))
    rgb = crop_xywh(rgb, top, left, th, tw)
    depths = [crop_xywh(d, top, left, th, tw) for d in depths]
    if rng.uniform(0, 1) > 0.5:
        rgb = hflip(rgb)
        depths = [hflip(d) for d in depths]
    rgb_np = _pil_to_np(rgb) / 255.0
    depth_np = _stack_depths([_pil_to_np(d) for d in depths])
    if rng.uniform(0, 1) > 0.5:
        gamma = rng.uniform(0.9, 1.1)
        rgb_np = rgb_np**gamma
        rgb_np = rgb_np * rng.uniform(0.75, 1.25)
        colors = rng.uniform(0.9, 1.1, size=3).astype(np.float32)
        rgb_np = np.clip(rgb_np * colors, 0, 1)
    return rgb_np.astype(np.float32), depth_np


POLICIES = {
    "default": (default_train_preprocess, default_val_preprocess, default_val_preprocess),
    "laina": (default_train_preprocess, default_val_preprocess, default_val_preprocess),
    "bts": (bts_train_preprocess, bts_val_preprocess, bts_val_preprocess),
    "midas": (midas_train_preprocess, midas_val_preprocess, midas_test_preprocess),
    "vnl": (vnl_train_preprocess, vnl_val_preprocess, vnl_val_preprocess),
    "sharpnet": (sharpnet_train_preprocess, sharpnet_val_preprocess, sharpnet_val_preprocess),
    "my": (my_train_preprocess, default_val_preprocess, default_val_preprocess),
}
