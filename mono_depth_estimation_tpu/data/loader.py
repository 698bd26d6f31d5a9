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
* Transforms run in a thread pool (PIL/cv2 release the GIL for the heavy
  ops); per-sample rng streams are derived from (seed, epoch, index) so
  results are independent of thread scheduling.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


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
        num_workers: thread pool width (0 = synchronous).
        seed: base RNG seed.
        drop_last: drop the final short batch instead of padding it.
    """

    def __init__(self, dataset, batch_size, shuffle=False, transform=None,
                 num_workers=4, seed=0, drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
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
        pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 0
            else None
        )
        try:
            for b in range(n_batches):
                idx = order[b * bs : (b + 1) * bs]
                valid = len(idx)
                if valid < bs:  # pad with cyclic repeats of the epoch order
                    idx = np.concatenate([idx, np.resize(order, bs - valid)])
                if pool is not None:
                    samples = list(
                        pool.map(lambda i: self._sample(i, epoch), idx)
                    )
                else:
                    samples = [self._sample(i, epoch) for i in idx]
                batch = _stack(samples)
                mask = np.zeros(bs, bool)
                mask[:valid] = True
                yield batch, mask
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
