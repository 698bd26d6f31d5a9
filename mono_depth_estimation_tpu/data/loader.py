"""Host-side batching loader feeding the jitted train/eval steps.

Replaces the reference's torch DataLoader(num_workers, prefetch_factor=4,
pin_memory) stack (modules/base_module.py:51-78) with a thread-pool
prefetching iterator that yields numpy NHWC batches. Device placement and
mesh sharding happen in the train loop (train/steps.py) via
jax.device_put with a NamedSharding — the host side stays framework-free.

Design notes (TPU-first):
* Static shapes: batches are padded to full batch_size with repeated samples
  and a validity mask, so every jit step sees identical shapes (no
  recompilation on the last partial batch).
* Per-epoch shuffling uses a seeded numpy Generator — deterministic and
  restorable (epoch number is the fold).
* Transforms run in PROCESS workers by default (worker_mode="process"),
  like the reference's torch DataLoader: the cv2/numpy augmentation is a
  long chain of short GIL-holding calls, so a thread pool tops out near
  single-thread speed (measured 13-16 img/s vs the 87 img/s flagship
  device step — bench_extra.json["fed_train"]). Workers are plain
  ``fork`` children: dataset + transform are inherited through
  ``_FORK_STATE`` (no pickling of closures), children exit via os._exit
  (multiprocessing's fork path), so the parent's TPU client and atexit
  hooks are never touched. Per-sample rng streams are derived from
  (seed, epoch, index), so results are independent of worker scheduling
  AND of worker_mode — thread mode (the fallback where fork is
  unavailable, and the right choice for GIL-releasing transforms) yields
  bit-identical batches.
* Cross-batch pipelining: a single producer thread keeps
  ``prefetch_batches`` ready batches queued so decode+aug overlaps the
  consumer's device step — deterministic order, exceptions propagate.
  Pair with data/raw_cache.py (decode-once memmap cache) for the full
  fed-training fix measured in bench_extra.json["fed_train"].
"""

from __future__ import annotations

import functools
import multiprocessing
import queue
import sys
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

# (dataset, transform) registry read by fork children — set immediately
# before the pool forks, inherited by memory copy, never pickled.
_FORK_STATE: dict[int, tuple] = {}


def _proc_init():
    # cv2's internal thread pool must not survive a fork (deadlocks); the
    # parallelism is across workers, not within one sample
    try:
        import cv2

        cv2.setNumThreads(0)
    except Exception:
        pass


def _proc_sample(key: int, seed: int, epoch: int, index: int):
    dataset, transform = _FORK_STATE[key]
    if transform is None:
        return dataset[index]
    rgb, depth = (
        dataset.get_raw(index)
        if hasattr(dataset, "get_raw")
        else dataset[index]
    )
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, index]))
    return transform(rgb, depth, rng)


def _fork_available() -> bool:
    if not sys.platform.startswith("linux"):
        return False
    try:
        import os

        # on a single-core host process workers only add fork+IPC overhead
        # (and jax warns about fork with live threads) — threads are free
        return len(os.sched_getaffinity(0)) > 1
    except Exception:
        return True


def _stack(samples):
    """Stacks a list of per-sample pytrees (tuples/dicts/arrays) to batch."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: _stack([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return tuple(_stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack([np.asarray(s) for s in samples])


class Loader:
    """Iterates a dataset in batches with optional shuffling and padding.

    Args:
        dataset: object with __len__ and __getitem__/get_raw + transform.
        batch_size: static batch size; short batches are padded (see above).
        shuffle: reshuffle each epoch with a deterministic seed.
        transform: callable(rgb, depth, rng) -> sample pytree; if None the
            dataset's own ``transform`` (already bound) is used via
            dataset[i].
        num_workers: worker pool width (0 = synchronous).
        seed: base RNG seed.
        drop_last: drop the final short batch instead of padding it.
        prefetch_batches: producer-thread pipeline depth (0 = synchronous).
        worker_mode: "process" (default; GIL-free aug, torch-DataLoader
            analogue) or "thread"; falls back to threads off Linux.
    """

    def __init__(self, dataset, batch_size, shuffle=False, transform=None,
                 num_workers=4, seed=0, drop_last=False, prefetch_batches=2,
                 worker_mode="process"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        # more workers than cores is pure GIL/switch overhead for the
        # numpy-heavy transforms (1-core host: 8 threads 35 img/s vs
        # 2 threads 62 img/s on the raw-collate path); 2x cores keeps IO
        # (mmap page faults) overlapped with compute
        try:
            import os

            cores = len(os.sched_getaffinity(0))
        except Exception:
            cores = 4
        self.num_workers = min(num_workers, 2 * cores) if num_workers else 0
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.worker_mode = worker_mode
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _sample(self, index: int, epoch: int):
        if self.transform is None:
            return self.dataset[index]
        rgb, depth = (
            self.dataset.get_raw(index)
            if hasattr(self.dataset, "get_raw")
            else self.dataset[index]
        )
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, index])
        )
        return self.transform(rgb, depth, rng)

    def __iter__(self):
        n = len(self.dataset)
        # capture-and-advance at iteration START: abandoned iterators (early
        # stop, fast-dev-run, partial epochs) must still see fresh shuffles
        # next epoch
        epoch = self.epoch
        self.epoch += 1
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(order)

        bs = self.batch_size
        n_batches = len(self)
        use_procs = (
            self.num_workers > 0
            and self.worker_mode == "process"
            and _fork_available()
        )
        key = id(self)
        if use_procs:
            _FORK_STATE[key] = (self.dataset, self.transform)
            pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("fork"),
                initializer=_proc_init,
            )
            sample = functools.partial(_proc_sample, key, self.seed, epoch)
        elif self.num_workers > 0:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            sample = None
        else:
            pool = None
            sample = None

        def build(b):
            idx = order[b * bs : (b + 1) * bs]
            valid = len(idx)
            if valid < bs:  # pad with cyclic repeats of the epoch order
                idx = np.concatenate([idx, np.resize(order, bs - valid)])
            if use_procs:
                samples = list(pool.map(sample, [int(i) for i in idx]))
            elif pool is not None:
                samples = list(pool.map(lambda i: self._sample(i, epoch), idx))
            else:
                samples = [self._sample(i, epoch) for i in idx]
            batch = _stack(samples)
            mask = np.zeros(bs, bool)
            mask[:valid] = True
            return batch, mask

        def cleanup():
            if pool is not None:
                pool.shutdown(wait=False)
            _FORK_STATE.pop(key, None)

        if pool is None or self.prefetch_batches <= 0:
            try:
                for b in range(n_batches):
                    yield build(b)
            finally:
                cleanup()
            return

        # Pipelined path: a producer thread keeps up to prefetch_batches
        # ready batches queued, so host-side decode+aug overlaps the
        # consumer's device step (the torch-DataLoader prefetch_factor
        # analogue, modules/base_module.py:51-78). Single producer keeps
        # batch ORDER deterministic; sample-level parallelism stays in the
        # pool. The stop event ends the producer when an iterator is
        # abandoned mid-epoch (fast_dev_run, early stop, max_train_batches).
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        _END, _ERR = object(), object()

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    item = (None, build(b))
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                while not stop.is_set():
                    try:
                        q.put((_END, None), timeout=0.2)
                        return
                    except queue.Full:
                        continue
            except BaseException as e:  # propagate into the consumer
                try:
                    q.put((_ERR, e), timeout=5)
                except queue.Full:
                    pass

        t = threading.Thread(target=producer, daemon=True,
                             name="loader-prefetch")
        t.start()
        try:
            while True:
                tag, item = q.get()
                if tag is _END:
                    return
                if tag is _ERR:
                    raise item
                yield item
        finally:
            stop.set()
            cleanup()
