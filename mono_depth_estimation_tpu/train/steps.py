"""Jitted train / eval step factories.

One jit per method: the train step donates the TrainState (params update in
place in HBM), the eval step computes metrics per-sample on device (vmap) so
the host can mask padded samples and accumulate exactly like the reference's
per-batch averaging with batch_size=1 (modules/base_module.py:61-78).

Under a mesh, batches arrive sharded on 'data' and params replicated; XLA
inserts the gradient all-reduce over ICI. bf16 policy: inputs are cast to
``compute_dtype`` before the model, losses/metrics always run in f32.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import optax

from mono_depth_estimation_tpu.metrics import compute_metrics
from mono_depth_estimation_tpu.train.state import TrainState


def _cast_inputs(batch, dtype):
    # uint8 images travel host->HBM at 1/4 the f32 bytes and are restored to
    # f32/255 here, inside the jit, where XLA fuses the scale into the first
    # consumer (ops/preproc.py quantize_rgb_u8 is the host-side producer)
    from mono_depth_estimation_tpu.ops.preproc import dequantize_images

    batch = dequantize_images(batch)
    if dtype is None:
        return batch

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, batch)


def _train_step_body(method, model, optimizer, compute_dtype, remat,
                     device_aug):
    """The pure (unjitted) train step — shared by the per-batch jit and
    the fused K-step scan."""

    def step(state: TrainState, batch, rng):
        batch_c = _cast_inputs(batch, compute_dtype)
        if device_aug is not None:
            # batched on-chip augmentation of the RAW sample the loader
            # shipped (ops/device_aug.py): one gather instead of ~37
            # CPU-core-ms/sample of cv2 on the host
            rng, k_aug = jax.random.split(rng)
            batch_c = device_aug(batch_c, k_aug)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            loss, aux = method.train_loss(model, variables, batch_c, rng)
            return loss.astype(jnp.float32), aux

        if remat:
            # rematerialization: keep only the inputs as residuals and
            # recompute the forward during backward — trades FLOPs for HBM
            # (SURVEY.md 'HBM bandwidth' design note)
            loss_fn = jax.checkpoint(loss_fn)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_bs = aux.get("batch_stats") or state.batch_stats
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
        )
        logs = {k: v.astype(jnp.float32) for k, v in aux.get("logs", {}).items()}
        return new_state, loss, aux["y_hat"], aux["y"], logs

    return step


def make_train_step(method, model, optimizer, compute_dtype=None,
                    remat: bool = False, device_aug=None):
    body = _train_step_body(method, model, optimizer, compute_dtype, remat,
                            device_aug)
    return functools.partial(jax.jit, donate_argnums=(0,))(body)


def make_fused_train_step(method, model, optimizer, k: int,
                          compute_dtype=None, remat: bool = False,
                          device_aug=None):
    """K train steps per dispatch: the caller stacks K host batches on a
    new leading axis (leaves (K, B, ...), sharded with
    shard_batch(..., axis=1)) and ONE jitted lax.scan consumes them.

    Why: on dispatch-dominated runtimes (the tunneled dev TPU pays a
    ~30 ms round trip per call, and per-call donated-state handling is
    far worse — BASELINE.md fed-training notes) this divides the per-step
    launch overhead by K while the TrainState never leaves HBM. On real
    local hardware dispatch is ~us and K=1 behaves identically.

    Returns ``fused(state, kbatch, rng) -> (state, losses (K,), y_hat, y,
    logs)`` where y_hat/y/logs are the LAST step's (viz cadence only
    needs a representative batch).
    """
    body = _train_step_body(method, model, optimizer, compute_dtype, remat,
                            device_aug)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(state: TrainState, kbatch, rng):
        keys = jax.random.split(rng, k)

        def scan_body(st, xs):
            b, kk = xs
            st, loss, y_hat, y, logs = body(st, b, kk)
            return st, (loss, y_hat, y, logs)

        state, (losses, y_hats, ys, logs) = jax.lax.scan(
            scan_body, state, (kbatch, keys)
        )
        last = jax.tree.map(lambda a: a[-1], (y_hats, ys, logs))
        return state, losses, last[0], last[1], last[2]

    return fused


def make_metric_step(method, model, metric_names: Sequence[str],
                     split: str = "val", compute_dtype=None):
    """Builds the jitted eval step: returns per-sample metric dicts keyed by
    '<prefix><metric>' with shape (B,), plus optional val_loss scalar."""

    outputs_fn = method.val_outputs if split == "val" else method.test_outputs

    @jax.jit
    def metric_step(variables, batch):
        out = outputs_fn(model, variables, _cast_inputs(batch, compute_dtype))

        def per_sample(pred, target):
            f = lambda p, t: compute_metrics(p[None], t[None], names=metric_names)
            return jax.vmap(f)(pred, target)

        results = {}
        for prefix, y_hat, y in out["pairs"]:
            ms = per_sample(y_hat.astype(jnp.float32), y.astype(jnp.float32))
            for k, v in ms.items():
                results[f"{prefix}{k}"] = v
        extras = {}
        if "val_loss" in out:
            extras["val_loss"] = out["val_loss"].astype(jnp.float32)
        return results, extras

    return metric_step
