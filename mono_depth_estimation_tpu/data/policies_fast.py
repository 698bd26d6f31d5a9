"""cv2/numpy fast path for the TRAIN augmentation policies.

The PIL per-layer pipelines in data/policies.py are bit-parity with the
reference but slow (~27 samples/s/thread for the BTS policy at 512px);
training a TPU at 500+ images/sec makes the host the bottleneck.

Engine: rgb + unit-range planes are quantized to uint8 (exactly the
reference's ToPILImage mul(255).byte() quantization) and every geometric
op runs over per-plane CONTIGUOUS arrays with cv2's SIMD uint8 kernels
(strided channel slices hit cv2's copying slow path); metric (H, W)
float planes stay float32. Measured: BTS@512 27 -> 43 samples/s/thread,
default@228x304 166 -> 227 (single-threaded cv2; the loader's thread pool
multiplies this).

Deliberate (train-only) difference: bilinear resizes use cv2.INTER_LINEAR /
INTER_AREA instead of PIL's antialiased triangle filter — statistically
equivalent augmentation. Val/test keep the PIL path (eval parity).

Selected by Method.policy_fns when MDE_FAST_AUG != 0 (default on).
"""

from __future__ import annotations

import numpy as np


def _cv2():
    import cv2

    return cv2


class GeomPipe:
    """Applies one geometric op sequence to rgb + gt planes.

    Planes are kept as a LIST of contiguous arrays (cv2 slow-paths strided
    channel slices): rgb + unit-range planes as uint8 (8-bit quantized,
    like the reference), metric (H, W) planes as float32. ``finish``
    returns (rgb [0,1] f32, gt planes concat in original entry order).
    """

    def __init__(self, rgb, depth, scale_all: float = 1.0,
                 metric_div255: bool = True):
        import cv2

        entries = depth if isinstance(depth, (list, tuple)) else [depth]
        rgb = np.asarray(rgb)
        if rgb.dtype != np.uint8:
            rgb = cv2.convertScaleAbs(rgb, alpha=255.0)
        self.planes = [rgb]  # planes[0] is always rgb (uint8)
        self.kinds = ["rgb"]
        inv = 1.0 / scale_all
        for d in entries:
            d = np.asarray(d, np.float32)
            if d.ndim == 2:
                self.planes.append(
                    np.ascontiguousarray(d * inv if scale_all != 1.0 else d)
                )
                self.kinds.append("f32")
            else:
                # saturating (x/scale)*255 quantization in one cv2 pass
                self.planes.append(cv2.convertScaleAbs(d, alpha=255.0 * inv))
                self.kinds.append("u8")
        self.metric_div255 = metric_div255

    def _apply(self, fn):
        self.planes = [fn(p) for p in self.planes]

    @property
    def hw(self):
        return self.planes[0].shape[:2]

    def resize_shorter(self, size: int):
        cv2 = _cv2()
        h, w = self.hw
        if h <= w:
            nh, nw = size, max(1, int(round(w * size / h)))
        else:
            nh, nw = max(1, int(round(h * size / w))), size
        flag = cv2.INTER_AREA if nh < h else cv2.INTER_LINEAR
        self._apply(lambda a: cv2.resize(a, (nw, nh), interpolation=flag))

    def rotate(self, angle: float):
        cv2 = _cv2()
        h, w = self.hw
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        self._apply(
            lambda a: cv2.warpAffine(
                a, m, (w, h), flags=cv2.INTER_NEAREST,
                borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
        )

    def crop(self, top: int, left: int, h: int, w: int):
        self._apply(
            lambda a: np.ascontiguousarray(a[top : top + h, left : left + w])
        )

    def border_crop(self, frac: float = 0.05):
        h, w = self.hw
        self.crop(int(h * frac), int(w * frac),
                  int(h * (1 - frac)) - int(h * frac),
                  int(w * (1 - frac)) - int(w * frac))

    def center_crop(self, size_hw):
        th, tw = size_hw
        h, w = self.hw
        if h < th or w < tw:
            ph, pw = max(th - h, 0), max(tw - w, 0)

            def pad(a):
                cfg = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
                if a.ndim == 3:
                    cfg = cfg + ((0, 0),)
                return np.pad(a, cfg)

            self._apply(pad)
            h, w = self.hw
        self.crop(int(round((h - th) / 2.0)), int(round((w - tw) / 2.0)), th, tw)

    def flip(self):
        self._apply(lambda a: np.ascontiguousarray(a[:, ::-1]))

    def finish(self):
        scale = np.float32(1.0 / 255.0)
        rgb = self.planes[0].astype(np.float32) * scale
        parts = []
        for plane, kind in zip(self.planes[1:], self.kinds[1:]):
            if kind == "u8":
                p = plane.astype(np.float32) * scale
            else:
                p = plane * scale if self.metric_div255 else plane
            parts.append(p[..., None] if p.ndim == 2 else p)
        depth = np.concatenate(parts, axis=-1) if parts else None
        return rgb, depth


def default_train_fast(rgb, depth, *, resize, output_size, rng):
    """cv2 twin of policies.default_train_preprocess: every plane /s;
    (H,W) metric planes end /255 ('F'-mode quirk); unit planes keep [0,1]
    at 8 bits."""
    s = rng.uniform(1, 1.5)
    pipe = GeomPipe(rgb, depth, scale_all=s, metric_div255=True)
    pipe.resize_shorter(resize)
    pipe.rotate(rng.uniform(-5, 5))
    pipe.resize_shorter(int(resize * s))
    pipe.center_crop(output_size)
    if rng.uniform(0, 1) > 0.5:
        pipe.flip()
    return pipe.finish()


def bts_train_fast(rgb, depth, *, output_size, rng, resize=None):
    """cv2 twin of policies.bts_train_preprocess."""
    pipe = GeomPipe(rgb, depth, metric_div255=True)
    pipe.border_crop(0.05)
    pipe.rotate(rng.uniform(-2.5, 2.5))
    pipe.resize_shorter(int(rng.choice([512, 518, 550, 600, 650, 720])))
    th, tw = output_size
    h, w = pipe.hw
    pipe.crop(int(rng.integers(0, h - th + 1)), int(rng.integers(0, w - tw + 1)),
              th, tw)
    if rng.uniform(0, 1) > 0.5:
        pipe.flip()
    return pipe.finish()


def midas_train_fast(rgb, depth, *, rng, resize=None, output_size=(384, 384)):
    from mono_depth_estimation_tpu.data.policies import _midas_normalize

    pipe = GeomPipe(rgb, depth, metric_div255=True)
    pipe.resize_shorter(int(rng.integers(384, 720)))
    th, tw = output_size
    h, w = pipe.hw
    pipe.crop(int(rng.integers(0, h - th + 1)), int(rng.integers(0, w - tw + 1)),
              th, tw)
    if rng.uniform(0, 1) > 0.5:
        pipe.flip()
    rgb_out, depth_out = pipe.finish()
    return _midas_normalize(rgb_out), depth_out


def my_train_fast(rgb, depth, *, rng, output_size=(384, 384), resize=None):
    """cv2 twin of policies.my_train_preprocess (metric planes keep their
    scale there — no /255, modules/my.py:107-109)."""
    pipe = GeomPipe(rgb, depth, metric_div255=False)
    pipe.border_crop(0.05)
    pipe.rotate(rng.uniform(-2.5, 2.5))
    pipe.resize_shorter(
        int(rng.choice([416, 452, 489, 507, 518, 550, 600, 650, 720]))
    )
    th, tw = output_size
    h, w = pipe.hw
    pipe.crop(int(rng.integers(0, h - th + 1)), int(rng.integers(0, w - tw + 1)),
              th, tw)
    if rng.uniform(0, 1) > 0.5:
        pipe.flip()
    rgb_out, depth_out = pipe.finish()
    if rng.uniform(0, 1) > 0.5:
        gamma = rng.uniform(0.9, 1.1)
        rgb_out = rgb_out**gamma
        rgb_out = rgb_out * rng.uniform(0.75, 1.25)
        colors = rng.uniform(0.9, 1.1, size=3).astype(np.float32)
        rgb_out = np.clip(rgb_out * colors, 0, 1).astype(np.float32)
    return rgb_out, depth_out


FAST_TRAIN = {
    "default": default_train_fast,
    "laina": default_train_fast,
    "bts": bts_train_fast,
    "midas": midas_train_fast,
    "my": my_train_fast,
}
