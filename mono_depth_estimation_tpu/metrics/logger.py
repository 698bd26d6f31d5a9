"""Host-side metric bookkeeping with reference-compatible naming.

Mirrors the reference MetricLogger/MetricComputation pair
(/root/reference/metrics.py:11-72): per-split prefixes (``train_``, ``val_``,
bare names for test), optional extra prefixes (``front_``, ``back_``,
``comp_``, ``depth_``, ``fh_depth_`` used by the BTS module), running
averages exposed as ``<name>(AVG)``, and epoch aggregates exposed as
``<name>_epoch`` (the stdout contract of the reference evaluate.py:34-36).

Device work happens elsewhere (metrics.compute_metrics under jit); this
class only accumulates python floats, so it never forces extra syncs.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Mapping


class MetricAccumulator:
    """Running sums/averages of named metric values."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._sums: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    def update(self, values: Mapping[str, float]) -> None:
        for name, value in values.items():
            self._sums[name] += float(value)
            self._counts[name] += 1

    def update_arrays(self, values: Mapping[str, "object"]) -> None:
        """Batch update: folds a whole per-sample value array into the
        (sum, count) pair with one vectorized reduction per metric —
        O(metrics) host work per eval batch instead of O(batch x metrics)
        Python-float updates. Semantically identical to calling ``update``
        once per element."""
        import numpy as np

        for name, arr in values.items():
            a = np.asarray(arr, dtype=np.float64)
            self._sums[name] += float(a.sum())
            self._counts[name] += int(a.size)

    def avg(self, name: str) -> float:
        return self._sums[name] / max(self._counts[name], 1)

    def averages(self) -> dict[str, float]:
        return {name: self.avg(name) for name in self._sums}


class MetricLogger:
    """Routes per-batch metric dicts into a log sink with split prefixes."""

    def __init__(self, metrics: list[str], sink=None) -> None:
        self.metric_names = list(metrics)
        self.sink = sink  # callable(dict) or None
        self.acc = MetricAccumulator()

    def reset(self) -> None:
        self.acc.reset()

    def _log(self, payload: dict[str, float]) -> None:
        if self.sink is not None:
            self.sink(payload)

    def log_train(self, values: Mapping[str, float], loss: float) -> dict[str, float]:
        record = {"loss": float(loss)}
        out = {"train_" + k: float(v) for k, v in values.items()}
        self.acc.update(out)
        record.update(out)
        record.update({k + "(AVG)": self.acc.avg(k) for k in out})
        self._log(record)
        result = {"loss": float(loss)}
        result.update({k: float(v) for k, v in values.items()})
        return result

    def log_val(self, values: Mapping[str, float], prefix: str = "") -> dict[str, float]:
        out = {f"val_{prefix}{k}": float(v) for k, v in values.items()}
        self.acc.update(out)
        record = dict(out)
        record.update({k + "(AVG)": self.acc.avg(k) for k in out})
        self._log(record)
        return {f"{prefix}{k}": float(v) for k, v in values.items()}

    def log_test(self, values: Mapping[str, float]) -> dict[str, float]:
        out = {k: float(v) for k, v in values.items()}
        self.acc.update(out)
        self._log(out)
        return out

    def epoch_results(self) -> dict[str, float]:
        """`<name>_epoch` aggregates — the reference evaluate.py stdout contract."""
        return {f"{name}_epoch": avg for name, avg in self.acc.averages().items()}
