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
    with h5py.File(root / "nyu_depth_v2_labeled_corrected.mat", "w") as f:
        f["images"] = rng.integers(0, 255, (n, 3, w, h), dtype=np.uint8)
        f["depths"] = rng.uniform(0.5, 9.0, (n, w, h)).astype(np.float32)
        f["depths_corrected"] = rng.uniform(0.5, 9.0, (n, w, h)).astype(np.float32)
        f["labels"] = rng.integers(0, 5, (n, w, h)).astype(np.uint16)
        f["masks"] = np.zeros((n, w, h), np.uint8)
    savemat(root / "split.mat", {
        "trainNdxs": np.array([[1], [2]]), "testNdxs": np.array([[3], [4]]),
    })
    savemat(root / "classMapping40.mat", {
        "mapClass": np.arange(1, 6).reshape(1, -1),
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
