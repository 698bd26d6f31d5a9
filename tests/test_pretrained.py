"""Pretrained-weight initialization tests (VERDICT round-1 item #2).

The reference trains from downloaded pretrained weights
(network/Dorn.py:179-228, network/FCRN.py:297-347, network/Eigen.py:74);
here weights enter as converted files via --torch_weights / --pretrained.
The slow test is the full production path: a real vendored-torch DORN
ResNet-101 state_dict -> converter CLI -> DornMethod.init_variables with
--torch_weights -> params match the converted values -> one train step
updates them (training actually starts FROM the weights).
"""

import argparse
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mono_depth_estimation_tpu.train import pretrained as P

torch = pytest.importorskip("torch")


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


class _Inner(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(4, (3, 3))(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class _Outer(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = _Inner()(x, train)
        return nn.Dense(3)(x)


def test_merge_root_and_graft():
    x = jnp.ones((1, 8, 8, 3))
    outer = _Outer()
    variables = outer.init(jax.random.PRNGKey(0), x)

    # encoder-only file: paths rooted at the Inner module
    inner_vars = _Inner().init(jax.random.PRNGKey(7), x)
    loaded = jax.tree.map(lambda a: np.asarray(a) + 1.0, inner_vars)

    assert P.find_anchor(variables, loaded) == "_Inner_0"
    merged, n = P.merge_pretrained(variables, loaded)
    assert n == len(jax.tree.leaves(loaded))
    np.testing.assert_allclose(
        merged["params"]["_Inner_0"]["Conv_0"]["kernel"],
        loaded["params"]["Conv_0"]["kernel"],
    )
    np.testing.assert_allclose(
        merged["batch_stats"]["_Inner_0"]["BatchNorm_0"]["mean"],
        loaded["batch_stats"]["BatchNorm_0"]["mean"],
    )
    # untouched head stays at init
    np.testing.assert_allclose(
        merged["params"]["Dense_0"]["kernel"],
        variables["params"]["Dense_0"]["kernel"],
    )

    # full-model file: root merge
    full = jax.tree.map(lambda a: np.asarray(a) * 2.0, variables)
    merged2, n2 = P.merge_pretrained(variables, full)
    assert n2 == len(jax.tree.leaves(variables))
    np.testing.assert_allclose(
        merged2["params"]["Dense_0"]["kernel"],
        np.asarray(variables["params"]["Dense_0"]["kernel"]) * 2.0,
    )


def test_merge_shape_mismatch_raises():
    x = jnp.ones((1, 8, 8, 3))
    variables = _Outer().init(jax.random.PRNGKey(0), x)
    bad = {"params": {"Dense_0": {"kernel": np.zeros((2, 2), np.float32)}}}
    with pytest.raises(ValueError, match="shape"):
        P.merge_pretrained(variables, bad)
    with pytest.raises(ValueError, match="no match|matches neither"):
        P.merge_pretrained(variables, {"params": {"Nope_0": {"w": np.zeros(3)}}})


def test_pretrained_flag_warns_when_missing(monkeypatch, capsys, tmp_path):
    monkeypatch.setenv("MDE_PRETRAINED_DIR", str(tmp_path))

    class Dummy:
        method = argparse.Namespace(pretrained=1, torch_weights=None)

        def pretrained_source(self):
            return "vgg19_bn"

    x = jnp.ones((1, 8, 8, 3))
    variables = _Outer().init(jax.random.PRNGKey(0), x)
    out = P.apply_method_pretrained(Dummy(), None, variables)
    captured = capsys.readouterr().out
    assert "WARNING" in captured and "vgg19_bn" in captured
    assert out is variables  # untouched


def test_pretrained_flag_loads_when_present(monkeypatch, tmp_path):
    from flax import serialization

    monkeypatch.setenv("MDE_PRETRAINED_DIR", str(tmp_path))
    x = jnp.ones((1, 8, 8, 3))
    variables = _Outer().init(jax.random.PRNGKey(0), x)
    inner = jax.tree.map(
        lambda a: np.asarray(a) + 3.0, _Inner().init(jax.random.PRNGKey(3), x)
    )
    (tmp_path / "toysrc.msgpack").write_bytes(serialization.to_bytes(inner))

    class Dummy:
        method = argparse.Namespace(pretrained=1, torch_weights=None)

        def pretrained_source(self):
            return "toysrc"

    out = P.apply_method_pretrained(Dummy(), None, variables)
    np.testing.assert_allclose(
        out["params"]["_Inner_0"]["Conv_0"]["kernel"],
        inner["params"]["Conv_0"]["kernel"],
    )


@pytest.mark.slow
def test_dorn_torch_weights_end_to_end(tmp_path):
    """Real SceneParsing-shaped torch backbone -> converter CLI (--encoder
    dorn_sceneparsing) -> --torch_weights -> DornMethod trains from it."""
    _stub_torchvision()
    from network import Dorn  # vendored reference, torch-only

    from mono_depth_estimation_tpu.methods.dorn import DornMethod
    from mono_depth_estimation_tpu.train.state import TrainState
    from mono_depth_estimation_tpu.train.steps import make_train_step
    from tools.convert_torch_ckpt import main as convert_main

    tm = Dorn.ResNet(Dorn.Bottleneck, [3, 4, 23, 3]).eval()
    pth = tmp_path / "backbone.pth"
    torch.save(tm.state_dict(), str(pth))
    out = tmp_path / "dorn_sceneparsing.msgpack"
    convert_main([
        "--ckpt", str(pth), "--encoder", "dorn_sceneparsing",
        "--out", str(out), "--height", "33", "--width", "41",
    ])

    g = argparse.Namespace(metrics=["mae"], worker=0, ds_name="nyu",
                           depth_method=None)
    m = argparse.Namespace(
        name="dorn", learning_rate=1e-4, batch_size=2, ckpt=None,
        torch_weights=str(out), ord_num=12, alpha=0.02, beta=10.0,
        discretization="SID", input_size=(33, 41), kernel_size=16,
        pyramid=[4, 8, 12], dropout=0.5, weight_decay=5e-4,
    )
    method = DornMethod(g, m)
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.uniform(0, 1, (2, 33, 41, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.1, 1.0, (2, 33, 41, 1)).astype(np.float32)),
    )
    model, variables = method.init_variables(jax.random.PRNGKey(0), batch)

    # encoder params match the converted torch values exactly
    loaded = P.restore_msgpack(out)
    stem_kernel = loaded["params"]["Conv_0"]["Conv_0"]["kernel"]
    got = np.asarray(variables["params"]["ResNetEncoder_0"]["Conv_0"]
                     ["Conv_0"]["kernel"])
    np.testing.assert_array_equal(got, stem_kernel)
    # torch conv1 weight (O,I,kH,kW) -> (kH,kW,I,O)
    ref = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, ref, atol=0)

    opt = method.optimizer()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=opt.init(variables["params"]),
    )
    step = make_train_step(method, model, opt, compute_dtype=None)
    state, loss, *_ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    after = np.asarray(state.params["ResNetEncoder_0"]["Conv_0"]
                       ["Conv_0"]["kernel"])
    assert not np.array_equal(after, stem_kernel)  # trained FROM the weights
