"""Pretrained-weight initialization.

The reference trains every method from pretrained weights: torchvision
ImageNet encoders (/root/reference/network/FCRN.py:297-347,
network/Eigen.py:74, network/Bts.py:288-291), DORN's SceneParsing
ResNet-101 (network/Dorn.py:179-228) and MiDaS's hub ResNeXt-WSL weights
(modules/midas.py:16-27). This environment has no network egress, so
pretrained weights enter as files instead of downloads:

* ``--torch_weights <path>`` (every method) — a flax ``.msgpack`` produced
  by tools/convert_torch_ckpt.py (full model OR encoder-only), or a raw
  torch ``.ckpt/.pth/.pt`` converted on the fly against the full model.
* ``--pretrained 1`` (eigen/dorn/midas/vnl, the flags the reference has) —
  resolves ``$MDE_PRETRAINED_DIR/<source>.msgpack`` (default
  ``<repo>/weights/``); a missing file warns loudly and trains from random
  init, with the exact converter command to fix it.

Merging is strict: every loaded leaf must land on an existing variable of
identical shape. Encoder-only files (whose paths are rooted at the encoder
module, not the full model) are grafted under the encoder submodule found
by exact path/shape-set match.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]

_COLLECTIONS = ("params", "batch_stats")


def default_weights_dir() -> Path:
    return Path(os.environ.get("MDE_PRETRAINED_DIR", _REPO_ROOT / "weights"))


def resolve_pretrained(source: str) -> Path | None:
    """Looks up a converted weights file for a named pretrained source."""
    p = default_weights_dir() / f"{source}.msgpack"
    return p if p.exists() else None


def restore_msgpack(path: str | Path) -> dict:
    from flax import serialization

    return serialization.msgpack_restore(Path(path).read_bytes())


def _flatten(tree) -> dict:
    from flax import traverse_util

    return traverse_util.flatten_dict(tree) if tree else {}


def _merge_collection(var_tree: dict, loaded_tree: dict, prefix: tuple):
    """Writes loaded leaves into a flattened copy of var_tree under prefix.

    Returns (new flat dict, n merged). Raises on missing paths or shape
    mismatches — a silent partial load is worse than an error.
    """
    vflat = _flatten(var_tree)
    lflat = _flatten(loaded_tree)
    out = dict(vflat)
    for path, leaf in lflat.items():
        full = prefix + path
        if full not in vflat:
            raise ValueError(
                f"pretrained leaf {'/'.join(map(str, full))} has no match "
                "in the model variables"
            )
        if tuple(np.shape(leaf)) != tuple(vflat[full].shape):
            raise ValueError(
                f"pretrained leaf {'/'.join(map(str, full))}: shape "
                f"{np.shape(leaf)} != model {tuple(vflat[full].shape)}"
            )
        out[full] = jnp.asarray(leaf, dtype=vflat[full].dtype)
    return out, len(lflat)


def find_anchor(variables: dict, loaded: dict) -> str | None:
    """Finds the top-level submodule whose params subtree exactly matches the
    loaded params' path+shape set (an encoder-only converted file)."""
    lshapes = {
        p: tuple(np.shape(x)) for p, x in _flatten(loaded.get("params", {})).items()
    }
    if not lshapes:
        return None
    for key, sub in variables["params"].items():
        vshapes = {p: tuple(x.shape) for p, x in _flatten(sub).items()}
        if vshapes == lshapes:
            return key
    return None


def merge_pretrained(variables: dict, loaded: dict, anchor: str | None = None):
    """Merges a converted variables pytree into a model's variables.

    ``loaded`` may cover the full model (root merge) or the encoder only
    (grafted under ``anchor``, auto-detected by exact subtree match when not
    given). Returns (merged variables, number of merged leaves).
    """
    from flax import traverse_util

    def merge_at(prefix: tuple):
        merged = dict(variables)
        n_total = 0
        for col in _COLLECTIONS:
            if col not in loaded or not loaded[col]:
                continue
            if col not in variables or variables[col] is None:
                raise ValueError(
                    f"pretrained file has '{col}' but the model does not"
                )
            flat, n = _merge_collection(variables[col], loaded[col], prefix)
            merged[col] = traverse_util.unflatten_dict(flat)
            n_total += n
        return merged, n_total

    if anchor is not None:
        return merge_at((anchor,))
    # Try a root merge (full-model file); an encoder-only file whose module
    # names happen to collide with root-level names fails the shape checks
    # and falls through to the exact-subtree anchor search.
    root_err = None
    lparams = loaded.get("params", {})
    if lparams and all(k in variables["params"] for k in lparams):
        try:
            return merge_at(())
        except ValueError as e:
            root_err = e
    found = find_anchor(variables, loaded)
    if found is None:
        raise ValueError(
            "pretrained file matches neither the model root nor any "
            f"submodule; model top-level: {list(variables['params'])}, "
            f"file top-level: {list(lparams)}"
            + (f"; root merge failed with: {root_err}" if root_err else "")
        )
    return merge_at((found,))


def convert_torch(path: str | Path, model, example_shape,
                  skip_prefixes: tuple[str, ...] = (), reorder=None,
                  dense_chw_hints=None) -> dict:
    """Converts a raw torch checkpoint against the full-model template.

    The template init is EAGER (jit canonicalizes/sorts dict keys, which
    destroys the module-creation order the sequential aligner relies on) and
    runs on CPU (eager init on the tunneled TPU costs thousands of device
    round trips).
    """
    from mono_depth_estimation_tpu.utils.torch_convert import (
        REORDERERS,
        convert_sequential,
        load_torch_state_dict,
    )

    with jax.default_device(jax.devices("cpu")[0]):
        template = model.init(
            jax.random.PRNGKey(0), jnp.ones(example_shape, jnp.float32),
            train=False,
        )
    sd = load_torch_state_dict(str(path), skip_prefixes=skip_prefixes)
    if reorder:
        sd = REORDERERS[reorder](sd)
    return convert_sequential(sd, template, dense_chw_hints=dense_chw_hints)


def load_weights_file(path: str | Path, model=None, example_shape=None) -> dict:
    """Loads a weights file: .msgpack directly, torch formats via convert."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"--torch_weights file not found: {path}")
    if path.suffix == ".msgpack":
        return restore_msgpack(path)
    if path.suffix in (".ckpt", ".pth", ".pt"):
        if model is None or example_shape is None:
            raise ValueError(
                "on-the-fly torch conversion needs the model + input shape; "
                "pre-convert with tools/convert_torch_ckpt.py instead"
            )
        return convert_torch(path, model, example_shape)
    raise ValueError(f"unsupported weights format: {path.suffix}")


def apply_method_pretrained(method, model, variables, example_shape=None):
    """Resolves a Method's --torch_weights / --pretrained flags into merged
    initial variables. Called from Method.init_variables."""
    tw = getattr(method.method, "torch_weights", None)
    if tw:
        loaded = load_weights_file(tw, model=model, example_shape=example_shape)
        variables, n = merge_pretrained(variables, loaded)
        print(f"Initialized {n} tensors from {tw}")
        return variables

    if int(getattr(method.method, "pretrained", 0) or 0):
        source = method.pretrained_source()
        resolved = resolve_pretrained(source) if source else None
        if resolved is None:
            print(
                f"WARNING: --pretrained set but no converted weights for "
                f"'{source}' under {default_weights_dir()} — training from "
                f"random init. Convert the torch weights once with:\n"
                f"  python tools/convert_torch_ckpt.py --ckpt <torch file> "
                f"--encoder {source} --out "
                f"{default_weights_dir() / (str(source) + '.msgpack')}"
            )
            return variables
        loaded = restore_msgpack(resolved)
        variables, n = merge_pretrained(variables, loaded)
        print(f"Initialized {n} tensors from pretrained '{source}' ({resolved})")
    return variables
