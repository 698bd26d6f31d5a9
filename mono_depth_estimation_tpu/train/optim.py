"""Optimizers with per-group learning-rate multipliers + plateau scheduling.

The reference methods all use torch param groups with per-group lr factors
(e.g. encoder x1 / decoder x10, modules/my.py:70-81; BTS AdamW with
weight-decay split, modules/bts.py:139-152; DORN SGD backbone x1 / head x10,
modules/dorn.py:188-199) and ``ReduceLROnPlateau`` on a monitored metric.

Here a single optax transform covers all of it:

    multi_transform({label: <kernel + scale(mult) [+ wd]>}, labels)
    -> inject_hyperparams(scale_by_neg_lr)(base_lr)

The injected ``learning_rate`` hyperparameter is mutated host-side by the
PlateauScheduler between steps (torch ReduceLROnPlateau semantics: factor,
patience, min/max mode), so the jitted step never recompiles.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import optax
from flax import traverse_util


def _scale_by_neg_lr(learning_rate: float):
    return optax.scale(-learning_rate)


def _group_transform(kind: str, mult: float, weight_decay: float = 0.0,
                     eps: float = 1e-8, momentum: float = 0.0,
                     betas=(0.9, 0.999)):
    parts = []
    if kind == "adam":
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif kind == "adamw":
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    elif kind == "sgd":
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
        if weight_decay:
            # torch SGD couples weight decay into the gradient pre-momentum;
            # optax.trace sees g + wd*w if we add it first
            parts.insert(0, optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"unknown optimizer kind: {kind}")
    if mult != 1.0:
        parts.append(optax.scale(mult))
    return optax.chain(*parts) if parts else optax.identity()


def make_optimizer(
    kind: str,
    learning_rate: float,
    label_fn: Callable[[tuple[str, ...]], str] | None = None,
    groups: dict[str, dict] | None = None,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    momentum: float = 0.0,
) -> optax.GradientTransformation:
    """Builds the method optimizer.

    Args:
        kind: 'adam' | 'adamw' | 'sgd'.
        learning_rate: base lr (mutable via set_learning_rate).
        label_fn: maps a flattened param path tuple to a group label; None
            means a single group.
        groups: per-label overrides {label: {mult, weight_decay, eps,
            momentum}}. Labels produced by label_fn must all appear.
    """
    if label_fn is None or not groups:
        kernel = _group_transform(
            kind, 1.0, weight_decay=weight_decay, eps=eps, momentum=momentum
        )
    else:
        txs = {
            label: _group_transform(
                kind,
                g.get("mult", 1.0),
                weight_decay=g.get("weight_decay", weight_decay),
                eps=g.get("eps", eps),
                momentum=g.get("momentum", momentum),
            )
            for label, g in groups.items()
        }

        def param_labels(params):
            flat = traverse_util.flatten_dict(params)
            labels = {k: label_fn(k) for k in flat}
            return traverse_util.unflatten_dict(labels)

        kernel = optax.multi_transform(txs, param_labels)
    return optax.chain(
        kernel,
        optax.inject_hyperparams(_scale_by_neg_lr)(learning_rate=learning_rate),
    )


def set_learning_rate(opt_state, learning_rate: float):
    """Returns opt_state with the injected learning_rate replaced."""
    inner = opt_state[-1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jax.numpy.asarray(
        learning_rate, dtype=jax.numpy.asarray(hp["learning_rate"]).dtype
    )
    new_inner = inner._replace(hyperparams=hp)
    return opt_state[:-1] + (new_inner,)


def get_learning_rate(opt_state) -> float:
    return float(opt_state[-1].hyperparams["learning_rate"])


class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics.

    mode 'min'/'max', multiplicative factor on plateau, integer patience
    (number of bad epochs tolerated), optional min_lr.
    """

    def __init__(self, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0):
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.num_bad = 0
        self.scale = 1.0

    def is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        return value < self.best if self.mode == "min" else value > self.best

    def step(self, value: float) -> bool:
        """Feeds a monitored value; returns True if the lr was reduced."""
        if self.is_better(value):
            self.best = value
            self.num_bad = 0
            return False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale *= self.factor
            self.num_bad = 0
            return True
        return False

    def lr(self, base_lr: float) -> float:
        return max(base_lr * self.scale, self.min_lr)


class EarlyStopping:
    """Lightning EarlyStopping(monitor, patience) semantics
    (reference train.py:124-128)."""

    def __init__(self, mode: str = "min", patience: int = 5,
                 min_delta: float = 0.0):
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.best = None
        self.num_bad = 0

    def step(self, value: float) -> bool:
        """Returns True when training should stop."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.num_bad = 0
            return False
        self.num_bad += 1
        return self.num_bad >= self.patience
