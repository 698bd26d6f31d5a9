"""Reference torch-CPU eval-forward baselines for EVERY model family.

VERDICT r3 missing #1: the north star is "images/sec/chip vs reference
torch-CPU", but only DORN had a measured reference number. This tool runs
the REFERENCE CODE ITSELF (unmodified files under /root/reference/network/,
instantiated via the vendored torchvision-compatible encoders in
tests/vendored_torch_encoders.py — the same rig the full-model parity
certificates use) on CPU, one family per row, at the SAME eval geometry as
bench.py's zoo rows:

  eigen      Eigen.py:5-19          240x320  (bench_zoo eigen_240x320)
  fcrn       FCRN.py:297-371        240x320  (bench_zoo fcrn50_upproj_240x320)
  bts        Bts.py:325-333         512x512  (flagship bench_jax_bts_steady;
                                    out_channels=10, image_residuals=True —
                                    the benched/shipped config)
  dorn       Dorn.py:344-348        257x353  (the headline; bench_torch_cpu_dorn)
  midas      MiDaS.py:25-86         384x384  (bench_zoo midas_384x384)
  vnl        VNL.py:672-682         385x385  (bench_zoo vnl_385x385; full
                                    config: resnext50 stride16, 150 bins)
  sharpnet   SharpNet.py:146-277    240x320  (bench_zoo sharpnet_240x320)
  mynet      MyNet.py:267-275       384x384  (bench_zoo mynet_384x384)

Protocol: .eval(), torch.no_grad(), random f32 input, 1 warmup + median of
`iters` timed forwards. torch-CPU throughput is batch-insensitive (measured
for DORN in round 1), so small batches keep the single-core runtime sane.

Writes bench_baseline.json["zoo"] = {family: {images_per_sec, batch, size,
seconds_per_image}} and leaves the existing headline key untouched.

Usage: python tools/bench_torch_cpu_zoo.py [family ...]
"""

from __future__ import annotations

import json
import sys
import time
from argparse import Namespace
from pathlib import Path

import numpy as np
import torch

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT / "tests"))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from vendored_torch_encoders import (  # noqa: E402
    install_fake_torchvision,
    resnext101_32x8d,
)

install_fake_torchvision()


def _build_eigen():
    from network import Eigen as RefEigen

    return RefEigen.Eigen(pretrained=False), (240, 320), 2, 3


def _build_fcrn():
    from network import FCRN as RefFCRN

    return (
        RefFCRN.ResNet(layers=50, decoder="upproj", output_size=(120, 160),
                       out_channels=1, pretrained=False),
        (240, 320), 2, 3,
    )


def _build_bts():
    from network import Bts as RefBts

    return (
        RefBts.BtsModel(bts_size=512, max_depth=10, out_channels=10,
                        image_residuals=True,
                        encoder_version="densenet161_bts"),
        (512, 512), 1, 2,
    )


def _build_dorn():
    from network import Dorn

    args = Namespace(
        input_size=(257, 353), kernel_size=16, ord_num=68, alpha=0.001,
        beta=1.0, discretization="SID", pretrained=0, pyramid=[4, 8, 12],
        batch_norm=0, dropout=0.5,
    )
    return Dorn.DORN(args), (257, 353), 2, 3


def _build_midas():
    import torch.hub as hub

    orig = hub.load
    hub.load = lambda *a, **k: resnext101_32x8d()
    try:
        from network import MiDaS as RefMiDaS

        model = RefMiDaS.MidasNet()  # features=256 default, as benched
    finally:
        hub.load = orig
    return model, (384, 384), 1, 2


def _build_vnl():
    from network import VNL as RefVNL

    args = Namespace(
        encoder="resnext50_32x4d_body_stride16", init_type="xavier",
        pretrained=False, freeze_backbone=False,
        enc_dim_in=[64, 256, 512, 1024, 2048],
        enc_dim_out=[512, 256, 256, 256],
        dec_dim_in=[512, 256, 256, 256, 256, 256],
        dec_dim_out=[256, 256, 256, 256, 256],
        dec_out_c=150, crop_size=(385, 385),
    )
    return RefVNL.MetricDepthModel(args), (385, 385), 1, 2


def _build_sharpnet():
    from network import SharpNet as RefSharpNet

    return (
        RefSharpNet.SharpNet(RefSharpNet.Bottleneck, [3, 4, 6, 3],
                             [2, 2, 2, 2, 2], use_depth=True,
                             use_normals=True, use_boundary=True),
        (240, 320), 2, 3,
    )


def _build_mynet():
    from network import MyNet as RefMyNet

    return (
        RefMyNet.MyModel(input_size=(384, 384),
                         encoder_version="densenet161_bts"),
        (384, 384), 1, 2,
    )


BUILDERS = {
    "eigen": _build_eigen,
    "fcrn": _build_fcrn,
    "bts": _build_bts,
    "dorn": _build_dorn,
    "midas": _build_midas,
    "vnl": _build_vnl,
    "sharpnet": _build_sharpnet,
    "mynet": _build_mynet,
}


def measure(name: str) -> dict:
    model, size, batch, iters = BUILDERS[name]()
    model = model.eval()
    x = torch.from_numpy(
        np.random.default_rng(0).normal(size=(batch, 3, *size))
        .astype(np.float32)
    )
    with torch.no_grad():
        model(x)  # warmup
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "images_per_sec": round(batch / dt, 4),
        "seconds_per_image": round(dt / batch, 3),
        "batch": batch,
        "size": list(size),
    }


def main():
    which = sys.argv[1:] or list(BUILDERS)
    record_file = ROOT / "bench_baseline.json"
    record = json.loads(record_file.read_text()) if record_file.exists() else {}
    zoo = record.setdefault("zoo", {})
    for name in which:
        try:
            zoo[name] = measure(name)
        except Exception as e:  # record, keep sweeping
            if "images_per_sec" not in (zoo.get(name) or {}):
                zoo[name] = {"error": str(e)[:300]}
        print(name, json.dumps(zoo[name]), flush=True)
        record_file.write_text(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
