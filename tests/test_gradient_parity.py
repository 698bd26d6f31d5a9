"""Gradient-level training-math parity (VERDICT r4 task #2).

Every other reference comparison in this suite is forward-only; these
certificates differentiate the shipped loss paths against torch autograd
running the REFERENCE's own code on shared f64 inputs/weights:

* depth_sort + composite_layers (the compare-select network's custom VJP,
  ops/compositing.py) vs /root/reference/stdepth_utils.py:4-42 autograd.
* The full flagship BTS training step — as-shipped model config, silma
  composite loss with SSIM and fb-divergence terms — backward through the
  converted network vs the reference network/Bts.py + the
  base_module.py:124-208 criterion, per-leaf relative grad norms <= 1e-4.
* The VNL ModelLoss (WCEL + virtual-normal with the static-shape sampling
  rewrite, losses/vnl.py) vs criteria.py:839-1045 autograd — first at the
  loss level, then through the FULL converted VNL network via the
  production VnlMethod.train_loss (including the reference's in-place gt
  mutation semantics).

f64 throughout (jax.experimental.enable_x64 + torch .double()): at f64 the
only legitimate source of disagreement is MATH, not accumulation order.
"""

import sys
import types
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


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


@pytest.mark.slow
def test_depth_sort_composite_gradient_parity():
    """d/dx of composite_layers(depth_sort(x)) — the riskiest custom VJP in
    the tree (the compare-select sorting network) — against torch autograd
    through the reference's stable-sort + gather (stdepth_utils.py:4-42).
    Distinct depths (ties would make the permutation convention-dependent);
    f64, so agreement must be near bit-level."""
    _stub_reference_imports()
    import stdepth_utils as ref_su  # /root/reference/stdepth_utils.py

    from mono_depth_estimation_tpu.ops.compositing import (
        composite_layers,
        depth_sort,
    )

    rng = np.random.default_rng(0)
    b, L, h, w = 2, 3, 8, 10
    x = rng.uniform(0.05, 0.95, (b, L, h, w, 5))
    # make depths distinct across layers per pixel
    x[..., 4] += np.arange(L)[None, :, None, None] * rng.permutation(
        np.linspace(0.1, 0.3, L)
    )[None, :, None, None]
    cot = rng.normal(size=(b, h, w, 4))

    with jax.enable_x64(True):
        def f(z):
            return (
                composite_layers(depth_sort(z)[..., :4]) * jnp.asarray(cot)
            ).sum()

        g_ours = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = torch.from_numpy(
        np.transpose(x, (0, 1, 4, 2, 3)).copy()
    ).requires_grad_(True)  # (B, L, C, H, W)
    out = ref_su.composite_layers(ref_su.depth_sort(xt))  # (B, 4, H, W)
    cot_t = torch.from_numpy(np.transpose(cot, (0, 3, 1, 2)).copy())
    (out * cot_t).sum().backward()
    g_ref = np.transpose(xt.grad.numpy(), (0, 1, 3, 4, 2))

    np.testing.assert_allclose(g_ours, g_ref, atol=1e-9)


@pytest.mark.slow
def test_vnl_model_loss_gradient_parity():
    """d/d(pred_logit, pred_depth) of WCEL + w * VNL — the static-shape
    sampling rewrite (losses/vnl.py) vs the reference's compacting gather
    (criteria.py:839-1045) under torch autograd, f64, with the same
    injected point groups (the only nondeterminism is the np.random draw;
    see test_reference_parity.py::test_vnl_loss_tail_parity)."""
    _stub_reference_imports()
    import criteria  # /root/reference/criteria.py

    from mono_depth_estimation_tpu.losses.vnl import (
        VNLConfig,
        vnl_loss,
        wcel_loss,
    )

    rng = np.random.default_rng(11)
    b, h, w, c = 2, 16, 20, 10
    fx = fy = 25.0
    diff_w = 6.0

    yy, xx = np.mgrid[0:h, 0:w]
    gt = np.broadcast_to(
        2.0 + 0.4 * np.sin(xx / 3.0) + 0.4 * np.cos(yy / 2.5), (b, h, w)
    ) + 0.05 * rng.normal(size=(b, h, w))
    gt[rng.uniform(size=gt.shape) < 0.15] = 0.0
    pred = np.clip(gt + rng.normal(0, 0.4, gt.shape), 0.05, 12)
    logits = rng.normal(size=(b, c, h, w))
    gt_bins = rng.integers(0, c, (b, h, w))

    n = int(h * w * 0.15)
    p = rng.integers(0, h * w, (3, n))
    p123 = {
        "p1_x": p[0] % w, "p1_y": p[0] // w,
        "p2_x": p[1] % w, "p2_y": p[1] // w,
        "p3_x": p[2] % w, "p3_y": p[2] // w,
    }

    # ---- reference: torch autograd, f64
    class Args:
        dec_out_c = c
        wce_loss_weight = np.array(
            [[np.exp(-0.2 * (i - j) ** 2) for i in range(c)] for j in range(c)]
        )

    logits_t = torch.from_numpy(logits.copy()).requires_grad_(True)
    pred_t = torch.from_numpy(pred.copy()).requires_grad_(True)
    vl = criteria.VNL_Loss(fx, fy, (h, w))
    vl.select_index = lambda: p123
    # ModelLoss composition (criteria.py:1054-1062)
    loss_ref = criteria.WCEL_Loss(Args())(
        logits_t, torch.from_numpy(gt_bins), torch.from_numpy(gt)
    ) + diff_w * vl(
        torch.from_numpy(gt).unsqueeze(1), pred_t.unsqueeze(1), select=True
    )
    loss_ref.backward()
    g_logits_ref = np.transpose(logits_t.grad.numpy(), (0, 2, 3, 1))
    g_pred_ref = pred_t.grad.numpy()

    # ---- ours: jax.grad, f64
    with jax.enable_x64(True):
        cfg = VNLConfig(focal_x=fx, focal_y=fy, input_size=(h, w))

        def f(lg, pd):
            return wcel_loss(
                lg, jnp.asarray(gt_bins), jnp.asarray(gt), dec_out_c=c
            ) + diff_w * vnl_loss(
                jnp.asarray(gt), pd, cfg, key=jax.random.PRNGKey(0),
                select=True, p123=jnp.asarray(p),
            )

        ours_val, (g_logits, g_pred) = jax.value_and_grad(f, argnums=(0, 1))(
            jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(pred)
        )

    assert np.isclose(float(ours_val), float(loss_ref.detach()), rtol=1e-6)
    # WCEL: the reference casts its weight matrix to f32 internally
    # (criteria.py:851 dtype=torch.float), so agreement bottoms out there
    np.testing.assert_allclose(np.asarray(g_logits), g_logits_ref,
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_pred), g_pred_ref,
                               rtol=1e-5, atol=1e-9)


def _ref_silma_composite_criterion(criteria, ref_su):
    """The reference stdepth criterion closure for the flagship loss string
    'silma+composite+ssim+fbdivergence' at single_layer=True — replicated
    VERBATIM from modules/base_module.py:124-208 (base_module itself
    imports wandb/pytorch_lightning, absent here; every referenced function
    is the reference's own)."""
    import torch.nn.functional as F

    _silog = criteria.silog_loss(variance_focus=0.85)
    depth_w, comp_w, fbdiv_w, ssim_w = 10.0, 2.0, 0.2, 2.0

    def criterion(pred, targ, rgba):
        mask1 = rgba[:, [3]] > 0.0
        mask4 = mask1.expand(-1, 4, -1, -1)
        mask8 = mask1.expand(-1, 8, -1, -1)
        depth_idx = (slice(None), slice(8, 10))
        maskD = targ[depth_idx] > 0.0
        loss_dict = {}
        # composite (single_layer branch, base_module.py:143-146)
        l1b, back = pred[:, :4], pred[:, 4:8]
        pred_full = ref_su.composite_layers(torch.stack([l1b, back], dim=1))
        targ_full = rgba
        # silma (:156-158; the closure wraps silog in nan_to_num twice)
        loss_dict["depth_silog"] = depth_w * torch.nan_to_num(
            torch.nan_to_num(_silog(pred[depth_idx][maskD],
                                    targ[depth_idx][maskD]))
        )
        loss_dict["color_mae"] = F.l1_loss(pred[:, :8][mask8],
                                           targ[:, :8][mask8])
        # composite mse + composite ssim (:179-185)
        comp_loss = comp_w * F.mse_loss(pred_full[mask4], targ_full[mask4],
                                        reduction="none")
        loss_dict["composite_mse"] = torch.mean(torch.nan_to_num(comp_loss))
        loss_dict["composite_ssim"] = ssim_w * comp_w * ref_su.dssim2d(
            torch.clamp(pred_full, 0.0, 1.0),
            torch.clamp(targ_full, 0.0, 1.0), reduction="none",
        )[mask4].mean()
        # fbdivergence (:186-196)
        fpbg = (torch.linalg.vector_norm(pred[:, :3], dim=1, keepdim=True)
                * torch.linalg.vector_norm(targ[:, 4:7], dim=1, keepdim=True)
                ) + 1e-3
        fgbp = (torch.linalg.vector_norm(pred[:, 4:7], dim=1, keepdim=True)
                * torch.linalg.vector_norm(targ[:, :3], dim=1, keepdim=True)
                ) + 1e-3
        fb = ((pred[:, :3] * targ[:, 4:7] / fpbg).sum(dim=1)
              + (pred[:, 4:7] * targ[:, :3] / fgbp).sum(dim=1)
              )[mask1.squeeze(1)]
        loss_dict["fb_divergence"] = fbdiv_w * fb.mean()
        return torch.stack(list(loss_dict.values())).sum()

    return criterion


@pytest.mark.xslow
def test_bts_flagship_gradient_parity():
    """FLAGSHIP training-math certificate: the full as-shipped BTS
    (DenseNet-161, out_channels=10, image_residuals=True) + the silma
    composite loss with SSIM and fb-divergence terms, backward on shared
    f64 weights and a shared batch.

    * reference: network/Bts.py forward on x[:, :3] (modules/bts.py:102-108
      training_step) -> base_module.py:124-208 criterion -> torch autograd
    * ours: jax.grad of BtsMethod.train_loss (the production jitted path's
      exact function) wrt params

    Every converted gradient leaf must match within 1e-4 relative norm —
    the criterion exercises silog, the 2-layer composite scan VJP, the
    separable-SSIM VJP, and the masked reductions. (The 20-channel
    depth_sort VJP gets its own direct certificate above: the reference's
    OWN multi-layer composite branch crashes on its 5-channel targ_full vs
    4-channel mask — base_module.py:148/182 — so the full-module
    multi-layer comparison cannot run the reference side.)"""
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    import criteria  # /root/reference/criteria.py
    import stdepth_utils as ref_su
    from network import Bts as RefBts

    from flax import traverse_util

    from mono_depth_estimation_tpu.methods.bts import BtsMethod
    from mono_depth_estimation_tpu.utils.torch_convert import (
        convert_sequential,
    )

    tm = RefBts.BtsModel(
        bts_size=512, max_depth=1.0, out_channels=10, image_residuals=True,
        encoder_version="densenet161_bts",
    ).double().train()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    rng = np.random.default_rng(7)
    b, h, w = 2, 64, 96
    x = rng.uniform(0.0, 1.0, (b, h, w, 4))
    x[..., 3] = np.where(rng.uniform(size=(b, h, w)) < 0.1, 0.0, x[..., 3])
    y = rng.uniform(0.05, 1.0, (b, h, w, 10))
    y[..., 8:10] = np.where(
        rng.uniform(size=(b, h, w, 2)) < 0.1, 0.0, y[..., 8:10]
    )

    # ---- reference backward
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())
    criterion = _ref_silma_composite_criterion(criteria, ref_su)
    y_hat_t = tm(xt[:, :3])[4]  # modules/bts.py:104-105
    loss_ref = criterion(y_hat_t, yt, xt)
    loss_ref.backward()

    # grads -> a state_dict-shaped stream (same keys/order; buffers keep
    # their values — they land in batch_stats, which we ignore) -> the SAME
    # converter that aligns weights aligns gradients (transposes/reshapes
    # commute with d/dW)
    params = dict(tm.named_parameters())
    sd_grads = {}
    for k, v in tm.state_dict().items():
        if k in params:
            g = params[k].grad
            assert g is not None, f"no grad for {k}"
            sd_grads[k] = g.detach().numpy()
        else:
            sd_grads[k] = v.detach().numpy()

    with jax.enable_x64(True):
        g = Namespace(metrics=["mae"], worker=0, ds_name="stdepthmulti2",
                      depth_method=None)
        m = Namespace(
            name="bts", learning_rate=1e-4, batch_size=2, ckpt=None,
            torch_weights=None, bts_size=512, out_channels=10,
            image_residuals=True, max_depth=1.0,
            encoder="densenet161_bts", variance_focus=0.85, adam_eps=1e-3,
            weight_decay=1e-2, loss="silma+composite+ssim+fbdivergence",
            depth_loss_weight=10.0, comp_loss_weight=2.0,
            fbdiv_loss_weight=0.2, ssim_loss_weight=2.0,
            fix_first_conv_blocks=False, fix_first_conv_block=False,
            bn_no_track_stats=False, freeze_encoder=False,
        )
        method = BtsMethod(g, m)
        model = method.build_model()
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float64),
            train=False,
        )
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = convert_sequential(sd, template)
        grad_tree = convert_sequential(sd_grads, template)

        variables = jax.tree.map(jnp.asarray, variables)
        batch = (jnp.asarray(x), jnp.asarray(y))

        def loss_fn(params_):
            v = {"params": params_,
                 "batch_stats": variables.get("batch_stats")}
            loss, _ = method.train_loss(model, v, batch,
                                        jax.random.PRNGKey(0))
            return loss

        loss_ours, grads = jax.value_and_grad(loss_fn)(variables["params"])

    loss_ref_v = float(loss_ref.detach())
    assert np.isclose(float(loss_ours), loss_ref_v, rtol=1e-8), (
        float(loss_ours), loss_ref_v
    )

    flat_ours = traverse_util.flatten_dict(grads)
    flat_ref = traverse_util.flatten_dict(grad_tree["params"])
    assert set(flat_ours) == set(flat_ref)
    worst = (None, 0.0)
    for path, g_ref in flat_ref.items():
        g_ours = np.asarray(flat_ours[path], np.float64)
        g_ref = np.asarray(g_ref, np.float64)
        dn = float(np.linalg.norm(g_ours - g_ref))
        rn = float(np.linalg.norm(g_ref))
        rel = dn / max(rn, 1e-12)
        if rn < 1e-12:  # zero-gradient leaf: absolute check
            assert dn < 1e-10, (path, dn)
            continue
        if rel > worst[1]:
            worst = (path, rel)
        assert rel <= 1e-4, (path, rel, rn)
    print("worst per-leaf relative grad-norm error:", worst)


def _midas_pair(seed=7, b=2, h=16, w=20):
    """f64 depth pair with invalid pixels; values a.s. distinct so the
    median / sort tie-breaking is unambiguous on both sides."""
    rng = np.random.default_rng(seed)
    target = rng.uniform(0.0, 10.0, (b, h, w))
    target[rng.uniform(size=target.shape) < 0.2] = 0.0
    pred = np.clip(target + rng.normal(0, 0.5, target.shape), 0.05, 12)
    return pred, target


@pytest.mark.slow
@pytest.mark.parametrize("loss_name", ["ssimse", "ssil1", "ssitrim", "trim",
                                       "mse", "l1"])
def test_midas_loss_gradient_parity(loss_name):
    """d/d(pred) of MidasLoss — the closed-form scale-shift solve, the
    masked data terms, the sort-permutation VJP of the (un-)trimmed MAE, and
    the 4-scale gradient regularizer — vs torch autograd through the
    reference criteria.MidasLoss (criteria.py:306-332), f64.

    trim=0.0 on our side reproduces the reference's actual (non-trimming)
    behavior — see losses/midas.py's reference-bug note; the gradients then
    flow through the same sort+sum graph on both sides."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.midas import midas_loss

    pred, target = _midas_pair()

    pred_t = torch.from_numpy(pred.copy()).unsqueeze(1).requires_grad_(True)
    targ_t = torch.from_numpy(target.copy()).unsqueeze(1)
    loss_ref = criteria.MidasLoss(
        alpha=0.5, loss=loss_name, reduction="batch-based"
    )(pred_t, targ_t)
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()[:, 0]

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: midas_loss(p, jnp.asarray(target), alpha=0.5,
                                 loss=loss_name, reduction="batch-based",
                                 trim=0.0)
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-7, atol=1e-12)


@pytest.mark.slow
def test_trimmed_procrustes_gradient_parity():
    """d/d(pred) of TrimmedProcrustesLoss (criteria.py:335-363) vs torch
    autograd, f64 — certifies normalize_prediction_robust's gradient path:
    the median pick (sort-permutation VJP vs torch.median's index routing)
    and the MAD term's subgradient at the median pixel, where shifted == 0
    EXACTLY and losses/midas.py's sign-form |.| matches torch.abs backward
    (plain jnp.abs would put a spurious unit cotangent there)."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.midas import trimmed_procrustes_loss

    pred, target = _midas_pair(seed=9)

    pred_t = torch.from_numpy(pred.copy()).requires_grad_(True)
    targ_t = torch.from_numpy(target.copy())
    # TrimmedProcrustesLoss.forward (criteria.py:345-358) composed verbatim
    # from the reference's own functions, but with a float64 mask: the class
    # hard-casts its mask to f32 (criteria.py:347), which crashes
    # normalize_prediction_robust's f32 median buffer on double inputs
    # (index_put dtype mismatch at criteria.py:144) — an f64-incompat in the
    # reference, not a semantic difference.
    mask = (targ_t > 0).double()
    pred_n = criteria.normalize_prediction_robust(pred_t, mask)
    targ_n = criteria.normalize_prediction_robust(targ_t, mask)
    loss_ref = criteria.TrimmedMAELoss(reduction="batch-based")(
        pred_n, targ_n, mask
    ) + 0.5 * criteria.GradientLoss(scales=4, reduction="batch-based")(
        pred_n, targ_n, mask
    )
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: trimmed_procrustes_loss(p, jnp.asarray(target),
                                              alpha=0.5, trim=0.0)
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-7, atol=1e-12)


@pytest.mark.slow
def test_ord_loss_gradient_parity():
    """d/d(prob) of the DORN ordinal NLL — the production DornMethod
    train_loss criterion (methods/dorn.py:84-99) — vs torch autograd through
    the reference criteria.ordLoss (criteria.py:734-787), f64. The clamp
    boundaries (1e-8, 1e8) are inactive for probs in (0.01, 0.99), so the
    log-grads must agree to roundoff."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.ordinal import ord_loss

    rng = np.random.default_rng(3)
    b, h, w, k = 2, 8, 10, 12
    prob = rng.uniform(0.01, 0.99, (b, h, w, k))
    target = rng.uniform(0, k, (b, h, w))

    prob_t = torch.from_numpy(
        np.transpose(prob, (0, 3, 1, 2)).copy()
    ).requires_grad_(True)
    loss_ref = criteria.ordLoss()(prob_t, torch.from_numpy(target[:, None]))
    loss_ref.backward()
    g_ref = np.transpose(prob_t.grad.numpy(), (0, 2, 3, 1))

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: ord_loss(p, jnp.asarray(target))
        )(jnp.asarray(prob))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-10, atol=1e-14)


@pytest.mark.slow
def test_masked_depth_loss_gradient_parity():
    """d/d(pred) of the Eigen scale-invariant L2 + gradient-matching loss —
    EigenModule's training criterion — vs torch autograd through the
    reference criteria.MaskedDepthLoss (criteria.py:17-64), f64."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.masked import masked_depth_loss

    pred, target = _midas_pair(seed=21)

    pred_t = torch.from_numpy(pred.copy()).unsqueeze(1).requires_grad_(True)
    loss_ref = criteria.MaskedDepthLoss()(
        pred_t, torch.from_numpy(target.copy()).unsqueeze(1)
    )
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()[:, 0]

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: masked_depth_loss(p, jnp.asarray(target))
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_berhu_gradient_parity():
    """d/d(pred) of berHu (criteria.py:111-133) vs torch autograd, f64 —
    the unmasked max threshold is comparison-only on both sides (the
    reference's huber_mask is .detach()ed; ours is a nondifferentiable
    comparison), so grads are sign + 2·diff on the c-exceeding subset."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.masked import berhu_loss

    pred, target = _midas_pair(seed=23)

    pred_t = torch.from_numpy(pred.copy()).unsqueeze(1).requires_grad_(True)
    loss_ref = criteria.berHuLoss()(
        pred_t, torch.from_numpy(target.copy()).unsqueeze(1)
    )
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()[:, 0]

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: berhu_loss(p, jnp.asarray(target))
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_laina_berhu_gradient_parity():
    """d/d(pred) of the FCRN/Laina log-space berHu (criteria.py:476-506) vs
    torch autograd, f64. Unlike plain berHu, here c = 0.2·max(n) appears in
    the VALUE expression (n²+c²)/(2c+1e-9) un-detached, so the argmax pixel
    receives an extra gradient contribution through c — both sides must
    route it identically."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.masked import laina_berhu_loss

    pred, target = _midas_pair(seed=27)

    pred_t = torch.from_numpy(pred.copy()).unsqueeze(1).requires_grad_(True)
    loss_ref = criteria.LainaBerHuLoss()(
        pred_t, torch.from_numpy(target.copy()).unsqueeze(1)
    )
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()[:, 0]

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: laina_berhu_loss(p, jnp.asarray(target))
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_silog_gradient_parity():
    """d/d(pred) of SILog (criteria.py:724-732) vs torch autograd, f64 —
    standalone version of the depth term the flagship BTS certificate
    differentiates through the full network."""
    _stub_reference_imports()
    import criteria

    from mono_depth_estimation_tpu.losses.masked import silog_loss

    pred, target = _midas_pair(seed=29)

    pred_t = torch.from_numpy(pred.copy()).requires_grad_(True)
    loss_ref = criteria.silog_loss(variance_focus=0.85)(
        pred_t, torch.from_numpy(target.copy())
    )
    loss_ref.backward()
    g_ref = pred_t.grad.numpy()

    with jax.enable_x64(True):
        val, g_ours = jax.value_and_grad(
            lambda p: silog_loss(p, jnp.asarray(target), variance_focus=0.85)
        )(jnp.asarray(pred))

    assert np.isclose(float(val), float(loss_ref.detach()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref,
                               rtol=1e-8, atol=1e-13)


@pytest.mark.xslow
def test_eigen_full_module_gradient_parity():
    """Third FULL-MODULE training-math certificate: the complete Eigen
    3-scale net (vendored vgg19_bn features + the 35840->4096 MLP pair +
    scale-2/scale-3 refinements) through the production
    EigenMethod.train_loss — model fwd in train mode (batch-stat BN),
    bilinear upsample of the prediction to GT size
    (modules/eigen.py:28-31, align_corners=False — verified bit-level
    equivalent to jax.image.resize in f64), MaskedDepthLoss — backward on
    shared f64 converted weights vs the reference network/Eigen.py +
    criteria.MaskedDepthLoss under torch autograd.

    b=1: the FC head hard-wires the full 240x320 training geometry (no
    tiny-shape trick like the BTS/VNL certs), so f64 runtime scales with
    batch — b=2 passed identically when built (round 5) at 2x the cost;
    the batch-coupled reductions of MaskedDepthLoss are certified at b=2
    by test_masked_depth_loss_gradient_parity above."""
    _stub_reference_imports()
    from vendored_torch_encoders import install_fake_torchvision

    install_fake_torchvision()
    import criteria
    import torch.nn.functional as F
    from network import Eigen as RefEigen

    from flax import traverse_util

    from mono_depth_estimation_tpu.methods.eigen import EigenMethod
    from mono_depth_estimation_tpu.utils.torch_convert import (
        convert_sequential,
    )

    tm = RefEigen.Eigen(pretrained=False).double().train()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    rng = np.random.default_rng(31)
    b, h, w = 1, 240, 320  # the FC head hard-wires the training geometry
    x = rng.normal(size=(b, h, w, 3))
    y = rng.uniform(0.0, 10.0, (b, h, w, 1))
    y[rng.uniform(size=y.shape) < 0.2] = 0.0  # invalid pixels

    # ---- reference backward (modules/eigen.py:23-32 training_step)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())
    y_hat_t = tm(xt)
    y_hat_t = F.interpolate(y_hat_t, (h, w), mode="bilinear")
    loss_ref = criteria.MaskedDepthLoss()(y_hat_t, yt)
    loss_ref.backward()
    params = dict(tm.named_parameters())
    sd_grads = {}
    for k, v in tm.state_dict().items():
        if k in params:
            g_ = params[k].grad
            assert g_ is not None, f"no grad for {k}"
            sd_grads[k] = g_.detach().numpy()
        else:
            sd_grads[k] = v.detach().numpy()

    # ---- ours: jax.grad of the production EigenMethod.train_loss
    with jax.enable_x64(True):
        g = Namespace(metrics=["mae"], worker=0, ds_name="nyu",
                      depth_method=None)
        m = Namespace(
            name="eigen", learning_rate=1e-4, batch_size=b, ckpt=None,
            torch_weights=None, backbone="vgg", pretrained=0,
            lr_patience=2, data_augmentation="laina", loss="eigen",
            freeze_encoder=False,
        )
        method = EigenMethod(g, m)
        model = method.build_model()
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float64),
            train=False,
        )
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        # VGG /32 features of 240x320 flatten NCHW as (512, 7, 10); mlp2's
        # output reshapes NCHW as (64, 14, 19) (Eigen.py:84-87) — same
        # hints as test_full_model_parity.py::test_full_eigen_parity
        hints = dict(dense_chw_hints={0: (512, 7, 10)},
                     dense_out_chw_hints={1: (64, 14, 19)})
        variables = jax.tree.map(
            jnp.asarray, convert_sequential(sd, template, **hints)
        )
        grad_tree = convert_sequential(sd_grads, template, **hints)
        batch = (jnp.asarray(x), jnp.asarray(y))

        def loss_fn(params_):
            v = {"params": params_,
                 "batch_stats": variables.get("batch_stats")}
            loss, _ = method.train_loss(model, v, batch,
                                        jax.random.PRNGKey(0))
            return loss

        loss_ours, grads = jax.value_and_grad(loss_fn)(variables["params"])

    loss_ref_v = float(loss_ref.detach())
    assert np.isclose(float(loss_ours), loss_ref_v, rtol=1e-8), (
        float(loss_ours), loss_ref_v
    )
    flat_ours = traverse_util.flatten_dict(grads)
    flat_ref = traverse_util.flatten_dict(grad_tree["params"])
    assert set(flat_ours) == set(flat_ref)
    for path, g_ref in flat_ref.items():
        g_ours = np.asarray(flat_ours[path], np.float64)
        g_ref = np.asarray(g_ref, np.float64)
        dn = float(np.linalg.norm(g_ours - g_ref))
        rn = float(np.linalg.norm(g_ref))
        if rn < 1e-12:
            assert dn < 1e-10, (path, dn)
            continue
        assert dn / rn <= 1e-4, (path, dn / rn, rn)


@pytest.mark.xslow
def test_vnl_full_module_gradient_parity(monkeypatch):
    """Second FULL-MODULE training-math certificate: the complete VNL
    (ResNeXt-50-stride16 body + ASPP + FTB/AFA topdown + bin head) +
    ModelLoss (WCEL + virtual-normal), backward on shared f64 converted
    weights and a shared batch with the same injected sampling groups.

    * reference: network/VNL.py forward -> bins_to_depth / depth_to_bins
      (modules/vnl.py:202-230, INCLUDING the in-place gt mutation its
      depth_to_bins performs: clamp to [depth_min, depth_max], invalid
      (<0) -> -1 — the criterion consumes the MUTATED gt,
      modules/vnl.py:252-260) -> criteria.ModelLoss -> torch autograd
    * ours: jax.grad of VnlMethod.train_loss (the production path) wrt
      params, with losses.vnl._sample_indices pinned to the same groups

    The gt batch deliberately contains values above depth_max, zeros, and
    -1 padding so the mutation semantics are load-bearing — this test
    pinned the round-5 train_loss fix that replicates them."""
    _stub_reference_imports()
    import criteria  # /root/reference/criteria.py
    from network import VNL as RefVNL

    from flax import traverse_util

    import mono_depth_estimation_tpu.losses.vnl as vnl_losses
    from mono_depth_estimation_tpu.methods.vnl import VnlMethod
    from mono_depth_estimation_tpu.utils.torch_convert import (
        convert_sequential,
        reorder_vnl_keys,
    )

    C, hw = 25, (97, 97)
    h, w = hw
    fx = fy = 519.0
    depth_min, depth_max, diff_w = 0.01, 1.1, 6.0

    targs = Namespace(
        encoder="resnext50_32x4d_body_stride16", init_type="xavier",
        pretrained=False, freeze_backbone=False,
        enc_dim_in=[64, 256, 512, 1024, 2048],
        enc_dim_out=[512, 256, 256, 256],
        dec_dim_in=[512, 256, 256, 256, 256, 256],
        dec_dim_out=[256, 256, 256, 256, 256],
        dec_out_c=C, crop_size=hw,
    )
    tm = RefVNL.MetricDepthModel(targs).double().train()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    rng = np.random.default_rng(13)
    b = 2
    x = rng.normal(size=(b, h, w, 3))
    gt = rng.uniform(0.0, 1.3, (b, h, w))  # above depth_max on purpose
    gt[rng.uniform(size=gt.shape) < 0.1] = 0.0
    gt[rng.uniform(size=gt.shape) < 0.05] = -1.0  # the fprc pad value
    n = int(h * w * 0.15)
    p = rng.integers(0, h * w, (3, n))

    # ---- reference backward (modules/vnl.py:252-260 + criteria ModelLoss)
    interval = (np.log10(depth_max) - np.log10(depth_min)) / C
    borders = torch.tensor(
        [np.log10(depth_min) + interval * (i + 0.5) for i in range(C)],
        dtype=torch.float64,
    )
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    gt_t = torch.from_numpy(gt.copy())

    pred_logits, pred_cls = tm(xt)
    db = pred_cls.permute(0, 2, 3, 1)
    pred_depth = (10.0 ** torch.sum(db * borders, dim=3, keepdim=True)
                  ).permute(0, 3, 1, 2)
    # depth_to_bins WITH its in-place gt mutation (modules/vnl.py:202-216)
    invalid = gt_t < 0.0
    gt_t[gt_t < depth_min] = depth_min
    gt_t[gt_t > depth_max] = depth_max
    bins = ((torch.log10(gt_t) - np.log10(depth_min)) / interval).to(torch.int64)
    bins[invalid] = C + 1
    bins[bins == C] = C - 1
    gt_t[invalid] = -1.0

    class Args:
        dec_out_c = C
        wce_loss_weight = np.array(
            [[np.exp(-0.2 * (i - j) ** 2) for i in range(C)] for j in range(C)]
        )

    p123 = {
        "p1_x": p[0] % w, "p1_y": p[0] // w,
        "p2_x": p[1] % w, "p2_y": p[1] // w,
        "p3_x": p[2] % w, "p3_y": p[2] // w,
    }
    vl = criteria.VNL_Loss(fx, fy, hw)
    vl.select_index = lambda: p123
    loss_ref = criteria.WCEL_Loss(Args())(pred_logits, bins, gt_t) + (
        diff_w * vl(gt_t.unsqueeze(1), pred_depth, select=True)
    )
    loss_ref.backward()
    params = dict(tm.named_parameters())
    sd_grads = {}
    for k, v in tm.state_dict().items():
        if k in params:
            g_ = params[k].grad
            assert g_ is not None, f"no grad for {k}"
            sd_grads[k] = g_.detach().numpy()
        else:
            sd_grads[k] = v.detach().numpy()

    # ---- ours: jax.grad of the production train_loss
    with jax.enable_x64(True):
        g = Namespace(metrics=["mae"], worker=0, ds_name="nyu",
                      depth_method=None)
        m = Namespace(
            name="vnl", learning_rate=1e-4, batch_size=b, ckpt=None,
            torch_weights=None, weight_decay=5e-4, lr_patience=2,
            encoder="resnext50_32x4d_body_stride16", init_type="xavier",
            pretrained=0, enc_dim_in=[64, 256, 512, 1024, 2048],
            enc_dim_out=[512, 256, 256, 256],
            dec_dim_in=[512, 256, 256, 256, 256, 256],
            dec_dim_out=[256, 256, 256, 256, 256],
            dec_out_c=C, crop_size=hw, scale_decoder_lr=0.1,
            freeze_backbone=False, depth_min=depth_min, depth_max=depth_max,
            focal_x=fx, focal_y=fy, diff_loss_weight=diff_w,
            prediction_method="classification", data_augmentation="vnl",
            loss="vnl", finetune=0, freeze_encoder=False,
        )
        method = VnlMethod(g, m)
        model = method.build_model()
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float64),
            train=False,
        )
        sd = reorder_vnl_keys(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        )
        variables = jax.tree.map(jnp.asarray, convert_sequential(sd, template))
        grad_tree = convert_sequential(reorder_vnl_keys(sd_grads), template)

        monkeypatch.setattr(
            vnl_losses, "_sample_indices", lambda key, cfg: jnp.asarray(p)
        )
        batch = {
            "A": jnp.asarray(x), "B": jnp.asarray(gt)[..., None],
            "invalid_side": jnp.zeros((b, 4), jnp.int32),
            "ratio": jnp.ones((b,), jnp.float64),
        }

        def loss_fn(params_):
            v = {"params": params_,
                 "batch_stats": variables.get("batch_stats")}
            loss, _ = method.train_loss(model, v, batch,
                                        jax.random.PRNGKey(0))
            return loss

        loss_ours, grads = jax.value_and_grad(loss_fn)(variables["params"])

    loss_ref_v = float(loss_ref.detach())
    assert np.isclose(float(loss_ours), loss_ref_v, rtol=1e-7), (
        float(loss_ours), loss_ref_v
    )
    flat_ours = traverse_util.flatten_dict(grads)
    flat_ref = traverse_util.flatten_dict(grad_tree["params"])
    assert set(flat_ours) == set(flat_ref)
    for path, g_ref in flat_ref.items():
        g_ours = np.asarray(flat_ours[path], np.float64)
        g_ref = np.asarray(g_ref, np.float64)
        dn = float(np.linalg.norm(g_ours - g_ref))
        rn = float(np.linalg.norm(g_ref))
        if rn < 1e-12:
            assert dn < 1e-10, (path, dn)
            continue
        assert dn / rn <= 1e-4, (path, dn / rn, rn)
