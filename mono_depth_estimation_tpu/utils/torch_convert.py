"""PyTorch state_dict -> Flax variables conversion core.

Converts reference checkpoints (.ckpt Lightning files or raw state_dicts;
SURVEY.md §5 'Checkpoint / resume') into this framework's variable pytrees
so released reference weights evaluate and fine-tune at parity (hard part
#1, SURVEY §7; pretrained sources: /root/reference/network/FCRN.py:297-347,
network/Eigen.py:74, network/Bts.py:288-291, network/Dorn.py:179-228,
modules/midas.py:16-27).

Strategy: both frameworks traverse the same architecture in construction
order, so the converter aligns the torch state_dict stream with the
flattened Flax variable stream and converts each tensor by kind:

  Conv2d weight   (O, I, kH, kW) -> (kH, kW, I, O); grouped convs
                  (O, I/g, kH, kW) -> (kH, kW, I/g, O)
  ConvTranspose2d (I, O, kH, kW) -> flip(kH, kW) then (kH, kW, I, O)
                  (our ConvTranspose is an lhs-dilated conv, see
                  models/common.py)
  Linear weight   (out, in) -> (in, out); when the torch input was an
                  NCHW flatten, columns are permuted CHW -> HWC via the
                  recorded feature shape ('dense_chw' hints)
  BatchNorm       weight/bias -> params.scale/bias;
                  running_mean/var -> batch_stats.mean/var
  num_batches_tracked          -> dropped

Alignment is strict: every pairing is shape-checked after conversion, and
leftover tensors on either side are an error (``skip_prefixes`` drops
named head tensors, e.g. an ImageNet ``fc.`` the target model lacks).

The CLI front-end lives in tools/convert_torch_ckpt.py.
"""

from __future__ import annotations

import numpy as np

def load_torch_state_dict(path: str, skip_prefixes: tuple[str, ...] = ()) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and hasattr(
        next(iter(obj.values())), "shape"
    ) is False:
        obj = obj["model"]
    # strip the Lightning "model." and DataParallel "module." prefixes
    out = {}
    for k, v in obj.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        if any(k.startswith(p) for p in skip_prefixes):
            continue
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def reorder_vnl_keys(sd: dict) -> dict:
    """Reorders a (vendored) VNL state_dict into this framework's module
    call order.

    Two reference quirks break plain stream alignment (network/VNL.py):
    * `lateral` registers topdown_lateral_modules BEFORE the bottomup body
      and its ASPP top (:97-121) while the forward (and our call order)
      runs bottomup -> top -> laterals (:155-170);
    * ASPP_block registers all convs then all BNs (:189-208) while the
      dataflow (and our creation order) interleaves conv/BN per branch.
    """

    def aspp_sorted(keys):
        order = ["aspp_conv1x1", "aspp_bn1x1", "aspp_conv3_1", "aspp_bn3_1",
                 "aspp_conv3_2", "aspp_bn3_2", "aspp_conv3_3", "aspp_bn3_3",
                 "globalpool_conv1x1", "globalpool_bn"]

        def rank(k):
            for i, frag in enumerate(order):
                if frag in k:
                    return i
            return len(order)

        return sorted(keys, key=lambda k: (rank(k), keys.index(k)))

    keys = list(sd)
    groups = {
        "bottomup": [k for k in keys if ".bottomup." in k],
        "top": aspp_sorted([k for k in keys if "bottomup_top" in k]),
        "laterals": [k for k in keys if "topdown_lateral_modules" in k],
    }
    used = set(groups["bottomup"]) | set(groups["top"]) | set(groups["laterals"])
    rest = [k for k in keys if k not in used]  # decoder order already matches
    ordered = groups["bottomup"] + groups["top"] + groups["laterals"] + rest
    return {k: sd[k] for k in ordered}


def reorder_mynet_keys(sd: dict) -> dict:
    """Reorders a MyNet state_dict into this framework's creation order.

    The reference's custom Conv2d block (network/MyNet.py:4-15) REGISTERS
    conv before bn but APPLIES elu -> bn -> conv; our ELUBNConv creates its
    BatchNorm params first (call order). Move each ``<p>.bn.*`` group in
    front of its sibling ``<p>.conv.weight``."""
    keys = list(sd)
    ks = set(keys)
    out, moved = [], set()
    for k in keys:
        if k in moved:
            continue
        if k.endswith(".conv.weight"):
            p = k[: -len(".conv.weight")]
            if f"{p}.bn.weight" in ks:
                for s in ("weight", "bias", "running_mean", "running_var",
                          "num_batches_tracked"):
                    b = f"{p}.bn.{s}"
                    if b in ks:
                        out.append(b)
                        moved.add(b)
        out.append(k)
    return {k: sd[k] for k in out}


REORDERERS = {"vnl": reorder_vnl_keys, "mynet": reorder_mynet_keys}


def _torch_stream(sd: dict):
    """Yields (name, array, kind) skipping counters."""
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        yield name, np.asarray(arr)


def classify_flax_leaf(path: tuple[str, ...], shape) -> str:
    leaf = path[-1]
    if leaf == "kernel" and len(shape) == 4:
        return "convT" if any("ConvTranspose" in p for p in path) else "conv"
    if leaf == "kernel" and len(shape) == 2:
        return "dense"
    if leaf in ("scale",):
        return "bn_scale"
    if leaf in ("bias",):
        return "bias"
    if leaf in ("mean",):
        return "bn_mean"
    if leaf in ("var",):
        return "bn_var"
    return "other"


def _chw_to_hwc_index(c: int, h: int, w: int) -> np.ndarray:
    """Index vector i such that flat_hwc = flat_chw[i]."""
    return (
        np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)
    )


def convert_tensor(kind: str, torch_arr: np.ndarray, target_shape,
                   dense_chw: tuple[int, int, int] | None = None,
                   dense_out_chw: tuple[int, int, int] | None = None
                   ) -> np.ndarray:
    if kind == "conv":
        out = np.transpose(torch_arr, (2, 3, 1, 0))
    elif kind == "convT":
        out = np.transpose(torch_arr, (2, 3, 0, 1))[::-1, ::-1].copy()
    elif kind == "dense":
        w = torch_arr
        if dense_chw is not None:
            w = w[:, _chw_to_hwc_index(*dense_chw)]
        if dense_out_chw is not None:
            # torch rows enumerate an NCHW reshape of the OUTPUT (e.g.
            # Eigen's mlp2 -> reshape(-1, 64, 14, 19), Eigen.py:86-87);
            # our consumer reshapes NHWC, so permute rows CHW -> HWC.
            w = w[_chw_to_hwc_index(*dense_out_chw), :]
        out = w.T
    else:
        out = torch_arr
    assert tuple(out.shape) == tuple(target_shape), (
        kind, torch_arr.shape, out.shape, target_shape
    )
    return out


def convert_sequential(state_dict: dict, variables, dense_chw_hints=None,
                       dense_out_chw_hints=None):
    """Aligns the torch stream with the flax variable stream in order.

    Args:
        state_dict: torch name -> ndarray.
        variables: flax {'params': ..., 'batch_stats': ...} template (from
            model.init) giving shapes and traversal order.
        dense_chw_hints: {occurrence_index: (C, H, W)} for Linear layers fed
            by an NCHW flatten.
        dense_out_chw_hints: {occurrence_index: (C, H, W)} for Linear layers
            whose OUTPUT is reshaped NCHW by the torch consumer (rows and
            the following bias are permuted CHW -> HWC).

    Returns a new variables pytree with converted weights.
    """
    import jax
    from flax import traverse_util

    params_flat = traverse_util.flatten_dict(variables["params"])
    bs_flat = (
        traverse_util.flatten_dict(variables["batch_stats"])
        if "batch_stats" in variables
        else {}
    )

    # flax traversal: interleave params and their batch_stats by module path.
    # Build per-module grouping in insertion order of params_flat.
    torch_items = list(_torch_stream(state_dict))
    ti = 0
    dense_seen = 0
    new_params, new_bs = {}, {}
    dense_chw_hints = dense_chw_hints or {}
    dense_out_chw_hints = dense_out_chw_hints or {}
    pending_bias_perm: dict[tuple, np.ndarray] = {}

    def next_torch(expect_dims=None, name_has=None):
        nonlocal ti
        while ti < len(torch_items):
            name, arr = torch_items[ti]
            ti += 1
            if expect_dims is not None and arr.ndim not in expect_dims:
                raise ValueError(
                    f"stream misalignment at torch '{name}' "
                    f"(ndim {arr.ndim}, expected {expect_dims})"
                )
            return name, arr
        raise ValueError("torch stream exhausted")

    for path, leaf in params_flat.items():
        kind = classify_flax_leaf(path, leaf.shape)
        if kind in ("conv", "convT"):
            name, arr = next_torch(expect_dims=(4,))
            new_params[path] = convert_tensor(kind, arr, leaf.shape)
        elif kind == "dense":
            name, arr = next_torch(expect_dims=(2,))
            hint = dense_chw_hints.get(dense_seen)
            out_hint = dense_out_chw_hints.get(dense_seen)
            dense_seen += 1
            new_params[path] = convert_tensor("dense", arr, leaf.shape, hint,
                                              out_hint)
            if out_hint is not None:
                pending_bias_perm[path[:-1]] = _chw_to_hwc_index(*out_hint)
        elif kind == "bn_scale":
            name, arr = next_torch(expect_dims=(1,))
            assert "weight" in name, name
            new_params[path] = convert_tensor("bn_scale", arr, leaf.shape)
            # bias, running_mean, running_var follow in torch BN order
            bias_name, bias = next_torch(expect_dims=(1,))
            new_params[path[:-1] + ("bias",)] = bias
            mean_name, mean = next_torch(expect_dims=(1,))
            var_name, var = next_torch(expect_dims=(1,))
            # find the matching batch_stats path (same module prefix)
            bs_prefix = _bn_stats_path(path, bs_flat)
            if bs_prefix is not None:
                new_bs[bs_prefix + ("mean",)] = mean
                new_bs[bs_prefix + ("var",)] = var
        elif kind == "bias":
            if path in new_params:
                continue  # BN bias already consumed
            name, arr = next_torch(expect_dims=(1,))
            perm = pending_bias_perm.pop(path[:-1], None)
            new_params[path] = arr if perm is None else arr[perm]
        else:
            raise ValueError(f"unhandled flax leaf {path} {leaf.shape}")

    missing = [p for p in params_flat if p not in new_params]
    if missing:
        raise ValueError(f"unconverted flax params: {missing[:5]}")
    leftovers = torch_items[ti:]
    if leftovers:
        raise ValueError(
            f"leftover torch tensors: {[n for n, _ in leftovers[:5]]}"
        )

    out = {"params": traverse_util.unflatten_dict(new_params)}
    if bs_flat:
        merged = dict(bs_flat)
        merged.update(new_bs)
        out["batch_stats"] = traverse_util.unflatten_dict(merged)
    out = jax.tree.map(lambda t, ref=None: np.asarray(t), out)
    return out


def _bn_stats_path(param_path, bs_flat):
    """Maps a params BN scale path to its batch_stats module path."""
    prefix = param_path[:-1]
    for bs_path in bs_flat:
        if bs_path[:-1] == prefix:
            return prefix
    return None


