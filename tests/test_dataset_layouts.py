"""On-disk layout tests: materialize tiny fake dataset trees matching each
family's real structure and drive the loaders end-to-end."""


import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def floorplan3d_dir(tmp_path_factory):
    """<root>/<a>/<scene>/<variant-dir>/color*.jpg + depth*.png +
    <a>/<scene>/complete.txt; cubicasa split '<x>/<y>/<scene>/...' lines."""
    root = tmp_path_factory.mktemp("fp3d")
    rng = np.random.default_rng(0)
    scenes = ["1234", "5678"]
    for split in ("train", "val", "test"):
        (root / f"{split}.txt").write_text(
            "".join(f"high/{s}/{s}/x\n" for s in scenes)
        )
    for scene in scenes:
        base = root / "colorful" / scene / "render" / "diffuse_0"
        base.mkdir(parents=True)
        (root / "colorful" / scene / "render" / "complete.txt").write_text("ok")
        for i in range(2):
            rgb = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
            Image.fromarray(rgb).save(base / f"color_{i}.jpg")
            depth_mm = rng.integers(500, 8000, (32, 40)).astype(np.uint16)
            Image.fromarray(depth_mm).save(base / f"depth_{i}.png")
    # an INCOMPLETE scene (no complete.txt): the complete.txt gate
    # (floorplan3d_dataloader.py:52-55) must exclude it — listed in the
    # split file but never loaded
    for split in ("train", "val", "test"):
        with open(root / f"{split}.txt", "a") as f:
            f.write("high/9999/9999/x\n")
    incomplete = root / "colorful" / "9999" / "render" / "diffuse_0"
    incomplete.mkdir(parents=True)
    rgb = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(incomplete / "color_0.jpg")
    depth_mm = rng.integers(500, 8000, (32, 40)).astype(np.uint16)
    Image.fromarray(depth_mm).save(incomplete / "depth_0.png")
    return root


def test_floorplan3d_layout(floorplan3d_dir):
    from mono_depth_estimation_tpu.data.floorplan3d import Floorplan3DDataset

    ds = Floorplan3DDataset(
        floorplan3d_dir, dataset_type="diffuse", output_size=(32, 40),
        resize=32, split="train",
    )
    assert len(ds) == 4
    rgb, depth = ds.get_raw(0)
    assert rgb.shape == (32, 40, 3) and rgb.dtype == np.uint8
    assert depth.dtype == np.float32
    assert 0 <= depth.min() and depth.max() <= 10.0  # mm -> m, clipped


@pytest.fixture(scope="module")
def structured3d_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("s3d")
    rng = np.random.default_rng(1)
    for k in range(3):
        scene = root / f"scene_{k:05d}" / "2D_rendering" / "123" / "perspective" / "full" / "0"
        scene.mkdir(parents=True)
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(scene / "rgb_rawlight.png")
        depth_mm = rng.integers(500, 9000, (24, 32)).astype(np.uint16)
        Image.fromarray(depth_mm).save(scene / "depth.png")
    return root


def test_structured3d_layout(structured3d_dir):
    from mono_depth_estimation_tpu.data.structured3d import Structured3DDataset

    # directory-order split: all 3 scenes land in 'train' (0:3400)
    ds = Structured3DDataset(
        structured3d_dir, dataset_type="perspective", output_size=(24, 32),
        resize=24, split="train",
    )
    assert len(ds) == 3
    rgb, depth = ds.get_raw(1)
    assert rgb.shape == (24, 32, 3)
    assert depth.max() <= 10.0


@pytest.fixture(scope="module")
def nyu_sparse_dir(tmp_path_factory):
    """sparse-to-dense tree: <root>/train/**/xxx.h5 with rgb CHW + depth."""
    import h5py

    root = tmp_path_factory.mktemp("nyus2d")
    rng = np.random.default_rng(2)
    for split in ("train", "val"):
        d = root / split / "kitchen_0001"
        d.mkdir(parents=True)
        for i in range(2):
            with h5py.File(d / f"{i:05d}.h5", "w") as f:
                f["rgb"] = rng.integers(0, 255, (3, 24, 32), dtype=np.uint8)
                f["depth"] = rng.uniform(0.5, 9.0, (24, 32)).astype(np.float32)
    return root


def test_nyu_sparse2dense_layout(nyu_sparse_dir):
    from mono_depth_estimation_tpu.data.nyu import NYUDataset

    ds = NYUDataset(
        nyu_sparse_dir, split="train", dataset_type="sparse_2_dense",
        output_size=(24, 32), resize=24,
    )
    assert len(ds) == 2
    rgb, depth = ds.get_raw(0)
    assert rgb.shape == (24, 32, 3)
    assert depth.shape == (24, 32)


@pytest.fixture(scope="module")
def nyu_mat_dir(tmp_path_factory):
    """labeled-mat layout: HDF5 mat (transposed storage) + split.mat +
    classMapping40.mat (old-style via scipy.io.savemat)."""
    import h5py
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("nyumat")
    rng = np.random.default_rng(3)
    n, w, h = 4, 32, 24
    corrected = rng.uniform(0.5, 9.0, (n, w, h)).astype(np.float32)
    corrected[2] = 0.0  # exercises the max==0 -> raw-depths fallback
    with h5py.File(root / "nyu_depth_v2_labeled_corrected.mat", "w") as f:
        f["images"] = rng.integers(0, 255, (n, 3, w, h), dtype=np.uint8)
        f["depths"] = rng.uniform(0.5, 9.0, (n, w, h)).astype(np.float32)
        f["depths_corrected"] = corrected
        f["labels"] = rng.integers(0, 5, (n, w, h)).astype(np.uint16)
        f["masks"] = rng.integers(0, 2, (n, w, h)).astype(np.uint8)
    savemat(root / "split.mat", {
        "trainNdxs": np.array([[1], [2]]), "testNdxs": np.array([[3], [4]]),
    })
    # mapping that lands on the semantic classes the masking rules key on:
    # label 1 -> 19 (mirror), label 3 -> 9 (window)
    savemat(root / "classMapping40.mat", {
        "mapClass": np.array([[19, 2, 9, 4, 5]]),
    })
    return root


def test_nyu_mat_layout(nyu_mat_dir):
    from mono_depth_estimation_tpu.data.nyu import NYUDataset

    ds = NYUDataset(
        nyu_mat_dir, split="train", dataset_type="labeled",
        output_size=(24, 32), resize=24,
    )
    assert len(ds) == 2
    rgb, depth = ds.get_raw(0)
    assert rgb.shape == (24, 32, 3)  # (W,H) storage transposed to (H,W)
    assert depth.shape == (24, 32)
    # corrected variant on the test split
    ds_c = NYUDataset(
        nyu_mat_dir, split="test", dataset_type="corrected",
        output_size=(24, 32), resize=24,
    )
    rgb_c, depth_c = ds_c.get_raw(0)
    assert depth_c.shape == (24, 32)


def test_nyu_no_mirror_masks_labels(nyu_mat_dir):
    from mono_depth_estimation_tpu.data.nyu import NYUDataset

    ds = NYUDataset(
        nyu_mat_dir, split="train", dataset_type="no_mirror",
        output_size=(24, 32), resize=24,
    )
    _, depth = ds.get_raw(0)
    assert depth.shape == (24, 32)  # label-19 masking path executes


# ---------------------------------------------------------------------------
# Cross-runs: the REFERENCE's own dataset code on the same fixture trees
# (VERDICT r4 task #6). datasets/*.py import torchvision.transforms and
# visualize -> metrics -> torchmetrics at module level; both are stubbed
# (the loaders under test never call them). The reference targets an old
# numpy (np.bool in nyu_dataloader.py:173); the removed alias is shimmed.


def _import_reference_datasets():
    import sys
    import types

    import pytest

    torch = pytest.importorskip("torch")  # noqa: F841

    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if not hasattr(tv, "transforms"):
        tr = types.ModuleType("torchvision.transforms")
        trf = types.ModuleType("torchvision.transforms.functional")
        tr.functional = trf
        tv.transforms = tr
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = trf
    if not hasattr(tv, "utils"):
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = None
        tvu.make_grid = None
        tv.utils = tvu
        sys.modules["torchvision.utils"] = tvu
    if "torchmetrics" not in sys.modules:
        import torch as _torch

        tm = types.ModuleType("torchmetrics")
        func = types.ModuleType("torchmetrics.functional")
        reg = types.ModuleType("torchmetrics.functional.regression")
        reg.mean_absolute_error = lambda p, t: (p - t).abs().mean()
        reg.mean_squared_error = lambda p, t: ((p - t) ** 2).mean()
        reg.mean_squared_log_error = (
            lambda p, t: ((_torch.log1p(p) - _torch.log1p(t)) ** 2).mean()
        )
        func.regression = reg
        func.structural_similarity_index_measure = None
        tm.functional = func
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = func
        sys.modules["torchmetrics.functional.regression"] = reg
    if "torchvtk" not in sys.modules:
        # datasets/__init__.py imports the stdepth loaders, which need
        # torchvtk (not installed — CLAUDE.md); the loaders under test here
        # never touch it
        vtk = types.ModuleType("torchvtk")
        vtk_ds = types.ModuleType("torchvtk.datasets")
        vtk_ds.TorchDataset = type("TorchDataset", (), {})
        vtk_u = types.ModuleType("torchvtk.utils")
        vtk_u.make_3d = None
        vtk.datasets = vtk_ds
        vtk.utils = vtk_u
        sys.modules["torchvtk"] = vtk
        sys.modules["torchvtk.datasets"] = vtk_ds
        sys.modules["torchvtk.utils"] = vtk_u
    if not hasattr(np, "bool"):
        np.bool = bool
    import matplotlib

    matplotlib.use("Agg")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def test_nyu_mat_reference_crossrun(nyu_mat_dir):
    """nyu_dataloader.py:155-183 run on the shared synthetic .mat tree vs
    data/nyu.py — split indexing, storage transposes, the 40-class label
    mapping, mirror/window zeroing, mirror-pixel masking, and the
    corrected-depth fallback must agree SAMPLE-EXACTLY."""
    _import_reference_datasets()
    from datasets import nyu_dataloader as ref_nyu

    from mono_depth_estimation_tpu.data.nyu import NYUDataset

    cases = [
        ("labeled", "train"),
        ("no_mirror", "train"),          # labels_40 == 19 zeroing
        ("no_mirror_no_window", "train"),  # + labels_40 == 9 zeroing
        ("mirror_pixel", "train"),       # depth[~mask] = 0
        ("corrected", "test"),           # + the max==0 fallback (sample 2)
    ]
    for dtype_, split in cases:
        ref = ref_nyu.NYUDataset(
            str(nyu_mat_dir), output_size=(24, 32), resize=24,
            dataset_type=dtype_, split=split,
        )
        ours = NYUDataset(
            nyu_mat_dir, split=split, dataset_type=dtype_,
            output_size=(24, 32), resize=24,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.images), np.asarray(ours.images),
            err_msg=f"{dtype_}/{split} split indices",
        )
        for i in range(len(ours.images)):
            rgb_r, depth_r = ref.get_raw(i)
            rgb_o, depth_o = ours.get_raw(i)
            np.testing.assert_array_equal(
                rgb_o, np.asarray(rgb_r), err_msg=f"{dtype_}[{i}] rgb"
            )
            np.testing.assert_array_equal(
                depth_o, np.asarray(depth_r), err_msg=f"{dtype_}[{i}] depth"
            )


def test_nyu_sparse2dense_reference_crossrun(nyu_sparse_dir):
    """nyu_dataloader.py h5 tree path: same files found, same decoded
    arrays (the reference's glob order is OS-dependent — compare by
    path)."""
    _import_reference_datasets()
    from datasets import nyu_dataloader as ref_nyu

    from mono_depth_estimation_tpu.data.nyu import NYUDataset

    ref = ref_nyu.NYUDataset(
        str(nyu_sparse_dir), output_size=(24, 32), resize=24,
        dataset_type="sparse_2_dense", split="train",
    )
    ours = NYUDataset(
        nyu_sparse_dir, split="train", dataset_type="sparse_2_dense",
        output_size=(24, 32), resize=24,
    )
    assert sorted(ref.images) == sorted(ours.images)
    by_path_ref = {p: ref.h5_loader(p) for p in ref.images}
    for p in ours.images:
        rgb_o, depth_o = ours.h5_loader(p)
        rgb_r, depth_r = by_path_ref[p]
        np.testing.assert_array_equal(rgb_o, rgb_r)
        np.testing.assert_array_equal(depth_o, depth_r)


def test_floorplan3d_reference_crossrun(floorplan3d_dir):
    """floorplan3d_dataloader.py:32-55,144-152: cubicasa split parsing, the
    color->depth pairing, the complete.txt gate (the 9999 scene must be
    skipped by BOTH sides), and the mm->m clipped decode."""
    _import_reference_datasets()
    from datasets import floorplan3d_dataloader as ref_fp3d

    from mono_depth_estimation_tpu.data.floorplan3d import Floorplan3DDataset

    ref = ref_fp3d.Floorplan3DDataset(
        str(floorplan3d_dir), dataset_type="diffuse", output_size=(32, 40),
        resize=32, split="train",
    )
    ours = Floorplan3DDataset(
        floorplan3d_dir, dataset_type="diffuse", output_size=(32, 40),
        resize=32, split="train",
    )
    ref_paths = sorted(p.as_posix() for p in ref.images)
    our_paths = sorted(str(p) for p in ours.images)
    assert ref_paths == our_paths  # incl. the complete.txt exclusion
    assert not any("9999" in p for p in our_paths)

    by_path_ref = {
        img.as_posix(): ref.get_raw(i) for i, img in enumerate(ref.images)
    }
    for i, img in enumerate(ours.images):
        rgb_o, depth_o = ours.get_raw(i)
        rgb_r, depth_r = by_path_ref[str(img)]
        np.testing.assert_array_equal(rgb_o, np.asarray(rgb_r.convert("RGB")))
        np.testing.assert_array_equal(depth_o, depth_r)


def test_structured3d_reference_crossrun(structured3d_dir):
    """structured3d_dataset.py:23-49: directory-order split windows, the
    rgb_rawlight -> depth path derivation, and the decode."""
    _import_reference_datasets()
    from datasets import structured3d_dataset as ref_s3d

    from mono_depth_estimation_tpu.data.structured3d import (
        Structured3DDataset,
    )

    ref = ref_s3d.Structured3DDataset(
        str(structured3d_dir), dataset_type="perspective",
        output_size=(24, 32), resize=24, split="train",
    )
    ours = Structured3DDataset(
        structured3d_dir, dataset_type="perspective", output_size=(24, 32),
        resize=24, split="train",
    )
    assert sorted(ref.images) == sorted(str(p) for p in ours.images)
    by_path_ref = {
        img: ref.get_raw(i) for i, img in enumerate(ref.images)
    }
    for i, img in enumerate(ours.images):
        rgb_o, depth_o = ours.get_raw(i)
        rgb_r, depth_r = by_path_ref[str(img)]
        np.testing.assert_array_equal(rgb_o, np.asarray(rgb_r.convert("RGB")))
        np.testing.assert_array_equal(depth_o, depth_r)
