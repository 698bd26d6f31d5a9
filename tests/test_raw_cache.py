"""Decode-once raw cache (data/raw_cache.py) + Loader prefetch pipeline.

The fed-train bottleneck fix (bench_extra.json["fed_train"]) must be
byte-exact: cached get_raw == uncached get_raw, cache entries invalidate
with their source file, and the prefetching Loader yields the identical
batch stream as the synchronous one.
"""

from __future__ import annotations

import os
import time
from argparse import Namespace

import numpy as np
import pytest

from mono_depth_estimation_tpu.data.loader import Loader
from mono_depth_estimation_tpu.data.raw_cache import RawDiskCache
from mono_depth_estimation_tpu.data.stdepth import (
    get_stdepth_dataset,
    get_stdepthmulti_dataset,
)
from mono_depth_estimation_tpu.data.synthetic import materialize_stdepth_dir


@pytest.fixture(scope="module")
def stdepth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stdepth_cache") / "data"
    materialize_stdepth_dir(d, n_train=4, n_val=1, n_test=1, h=32, w=32)
    return d


def _multi_ds(path, single_layer=True):
    ns = Namespace(path=str(path), single_layer=single_layer,
                   background_depth_max=False)
    return get_stdepthmulti_dataset(ns, "train", (32, 32), 32)


def _assert_raw_equal(a, b):
    ra, da = a
    rb, db = b
    np.testing.assert_array_equal(ra, rb)
    assert isinstance(da, (list, tuple)) == isinstance(db, (list, tuple))
    pa = list(da) if isinstance(da, (list, tuple)) else [da]
    pb = list(db) if isinstance(db, (list, tuple)) else [db]
    assert len(pa) == len(pb)
    for x, y in zip(pa, pb):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(x, y)


def test_cache_roundtrip_list_gt(stdepth_dir):
    plain = _multi_ds(stdepth_dir)
    cached = RawDiskCache(_multi_ds(stdepth_dir))
    for i in range(len(plain)):
        _assert_raw_equal(plain.get_raw(i), cached.get_raw(i))  # store pass
    files = list(cached.cache_dir.glob("*.npy"))
    assert len(files) == 2 * len(plain)  # rgb + gt per sample
    for i in range(len(plain)):
        _assert_raw_equal(plain.get_raw(i), cached.get_raw(i))  # load pass


def test_cache_roundtrip_array_gt(stdepth_dir):
    ns = Namespace(path=str(stdepth_dir), depth_method="first_hit",
                   background_depth_max=True)
    plain = get_stdepth_dataset(ns, "train", (32, 32), 32)
    cached = RawDiskCache(get_stdepth_dataset(ns, "train", (32, 32), 32))
    _ = cached.get_raw(0)
    _assert_raw_equal(plain.get_raw(0), cached.get_raw(0))


def test_cache_config_fingerprint_separates(stdepth_dir):
    single = RawDiskCache(_multi_ds(stdepth_dir, single_layer=True))
    multi = RawDiskCache(_multi_ds(stdepth_dir, single_layer=False))
    assert single.cache_dir != multi.cache_dir
    _, gt_s = single.get_raw(0)
    _, gt_m = multi.get_raw(0)
    assert sum(p.shape[-1] for p in gt_s) == 10
    assert sum(p.shape[-1] for p in gt_m) == 20


def test_cache_concat_gt_views_equal_plane_list(stdepth_dir):
    """concat_gt=True (the --device_aug fast path) must serve the SAME
    values as the plane-list form, zero-copy (mmap-backed)."""
    plain = RawDiskCache(_multi_ds(stdepth_dir))
    for i in range(len(plain)):
        _ = plain.get_raw(i)  # fill
    fast = RawDiskCache(_multi_ds(stdepth_dir))
    fast.concat_gt = True
    for i in range(len(plain)):
        rgb_p, planes = plain.get_raw(i)
        rgb_f, gt = fast.get_raw(i)
        np.testing.assert_array_equal(rgb_p, np.asarray(rgb_f))
        np.testing.assert_array_equal(
            np.concatenate(planes, axis=-1), np.asarray(gt)
        )
        assert isinstance(gt, np.memmap)  # truly zero-copy
    # raw_collate consumes both forms identically
    from mono_depth_estimation_tpu.ops.preproc import raw_collate

    xa, ya = raw_collate(*plain.get_raw(0), None)
    xb, yb = raw_collate(*fast.get_raw(0), None)
    np.testing.assert_array_equal(xa, np.asarray(xb))
    np.testing.assert_array_equal(ya, np.asarray(yb))


def test_cache_gt_dtype_bf16_roundtrip(stdepth_dir):
    """set_gt_dtype(bf16): stored targets equal the host cast the loaders
    would do per epoch (cast_targets_host semantics), bit for bit, and the
    cache dir re-keys so f32 runs never see quantized targets."""
    import jax.numpy as jnp

    plain = RawDiskCache(_multi_ds(stdepth_dir))
    bf = RawDiskCache(_multi_ds(stdepth_dir))
    bf.concat_gt = True
    bf.set_gt_dtype(jnp.bfloat16)
    assert bf.cache_dir != plain.cache_dir
    for i in range(len(plain)):
        _, planes = plain.get_raw(i)
        _ = bf.get_raw(i)   # fill (miss returns the fresh f32 planes)
        _, gt = bf.get_raw(i)  # hit: stored bf16, viewed back
        assert gt.dtype == jnp.bfloat16
        expect = np.concatenate(planes, axis=-1).astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(gt).view(np.uint16), expect.view(np.uint16)
        )


def test_cache_invalidates_on_source_change(stdepth_dir):
    cached = RawDiskCache(_multi_ds(stdepth_dir))
    _ = cached.get_raw(0)
    entry0 = cached._entry(0)
    src = cached.dataset.reader.files[0]
    st = src.stat()
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert cached._entry(0) != entry0  # new key -> recompute, not reuse
    _assert_raw_equal(_multi_ds(stdepth_dir).get_raw(0), cached.get_raw(0))


def test_cache_proxies_transform_and_getitem(stdepth_dir):
    cached = RawDiskCache(_multi_ds(stdepth_dir))
    seen = []

    def tf(rgb, depth):
        seen.append(rgb.shape)
        return np.float32(1.0)

    cached.transform = tf
    assert cached.dataset.transform is tf
    assert cached[0] == np.float32(1.0)
    assert len(cached) == len(cached.dataset)
    assert cached.split == "train"  # __getattr__ passthrough


class _SlowDataset:
    """In-memory dataset with a get_raw delay, to exercise the pipeline."""

    def __init__(self, n=13, delay=0.0):
        self.n = n
        self.delay = delay
        self.transform = None

    def __len__(self):
        return self.n

    def get_raw(self, i):
        if self.delay:
            time.sleep(self.delay)
        return (np.full((4, 4, 3), i, np.uint8),
                np.full((4, 4, 1), i / 100, np.float32))


def _collect(loader, n_epochs=2, break_after=None):
    out = []
    for _ in range(n_epochs):
        for j, (batch, mask) in enumerate(loader):
            out.append((batch[0].copy(), batch[1].copy(), mask.copy()))
            if break_after is not None and j + 1 >= break_after:
                break
    return out

def _tf(rgb, depth, rng):
    return rgb, depth


def test_prefetch_stream_identical_to_sync():
    a = _collect(Loader(_SlowDataset(), 4, shuffle=True, transform=_tf,
                        num_workers=2, seed=7, prefetch_batches=0))
    b = _collect(Loader(_SlowDataset(), 4, shuffle=True, transform=_tf,
                        num_workers=2, seed=7, prefetch_batches=3))
    assert len(a) == len(b)
    for (xa, ya, ma), (xb, yb, mb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(ma, mb)


def test_process_and_thread_workers_identical(monkeypatch):
    """worker_mode must not change the batch stream: per-sample rng is
    keyed by (seed, epoch, index), not by worker identity. Fork is forced
    so the process path is exercised even on a single-core CI host (where
    _fork_available adaptively falls back to threads)."""
    import mono_depth_estimation_tpu.data.loader as loader_mod

    monkeypatch.setattr(loader_mod, "_fork_available", lambda: True)

    def tf(rgb, depth, rng):  # rng-dependent aug, defined in a test module
        return rgb + rng.integers(0, 9, rgb.shape, dtype=np.uint8), depth

    a = _collect(Loader(_SlowDataset(), 4, shuffle=True, transform=tf,
                        num_workers=2, seed=3, worker_mode="thread"))
    b = _collect(Loader(_SlowDataset(), 4, shuffle=True, transform=tf,
                        num_workers=2, seed=3, worker_mode="process"))
    for (xa, ya, ma), (xb, yb, mb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(ma, mb)


def test_prefetch_abandoned_iterator_advances_epoch():
    # the round-1 Loader contract (f52327a) must survive the producer
    # thread: breaking mid-epoch still reshuffles the next epoch
    a = _collect(Loader(_SlowDataset(), 4, shuffle=True, transform=_tf,
                        num_workers=2, seed=7, prefetch_batches=2),
                 n_epochs=2, break_after=1)
    assert len(a) == 2
    assert not np.array_equal(a[0][0], a[1][0])  # different shuffles


def test_prefetch_propagates_worker_error():
    class _Boom(_SlowDataset):
        def get_raw(self, i):
            if i == 5:
                raise RuntimeError("decode failed")
            return super().get_raw(i)

    loader = Loader(_Boom(), 4, transform=_tf, num_workers=2,
                    prefetch_batches=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        _collect(loader, n_epochs=1)


def test_prefetch_actually_overlaps():
    # 12 samples x 30 ms with 4 workers ~= 90 ms/batch host-side; with the
    # producer pipelining 2 batches ahead, consuming with a 90 ms "step"
    # takes ~max(host, step) per batch instead of host+step.
    # thread mode isolates the producer pipeline from process-pool
    # startup cost (the sleep "aug" releases the GIL like cv2 does)
    ds = _SlowDataset(n=12, delay=0.03)
    sync_t = time.perf_counter()
    for _ in Loader(ds, 4, transform=_tf, num_workers=4, prefetch_batches=0,
                    worker_mode="thread"):
        time.sleep(0.09)
    sync_t = time.perf_counter() - sync_t
    pre_t = time.perf_counter()
    for _ in Loader(ds, 4, transform=_tf, num_workers=4, prefetch_batches=2,
                    worker_mode="thread"):
        time.sleep(0.09)
    pre_t = time.perf_counter() - pre_t
    assert pre_t < sync_t * 0.85, (pre_t, sync_t)
