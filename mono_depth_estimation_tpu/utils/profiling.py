"""Profiling helpers: step timers + jax.profiler trace hooks.

The reference has no profiling beyond an ad-hoc timer
(network/FCRN.py:394-408). Here images/sec/chip IS the benchmark metric
(BASELINE.md), so timing is first-class: StepTimer blocks on the returned
arrays (block_until_ready) and keeps a trimmed-mean throughput estimate;
``trace`` wraps jax.profiler for TensorBoard-viewable device traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def mean_time(self) -> float:
        if not self.times:
            return float("nan")
        arr = np.sort(np.asarray(self.times))
        k = max(1, int(len(arr) * 0.1))
        trimmed = arr[: len(arr) - k] if len(arr) > k else arr
        return float(trimmed.mean())

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_time()


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
