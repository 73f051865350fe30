"""Dataset loader tests over a synthetic on-disk CelebA-HQ-style tree."""

import numpy as np
import pytest
from PIL import Image

from e4s2024_tpu.data.datasets import FaceMaskDataset, list_images
from e4s2024_tpu.data.labels import celebahq19_to_face12, ffhq19_to_face12
from e4s2024_tpu.utils.image import to_pm1, from_pm1, colorize_label_map, vis_faces_grid


@pytest.fixture
def tree(tmp_path):
    rng = np.random.default_rng(0)
    for mode in ("train", "test"):
        (tmp_path / mode / "images").mkdir(parents=True)
        (tmp_path / mode / "labels").mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            lbl = rng.integers(0, 19, (32, 32), dtype=np.uint8)
            Image.fromarray(img).save(tmp_path / mode / "images" / f"{i:05d}.png")
            Image.fromarray(lbl, mode="L").save(tmp_path / mode / "labels" / f"{i:05d}.png")
    return tmp_path


def test_listing_and_modes(tree):
    ds = FaceMaskDataset(str(tree), mode="all")
    assert len(ds) == 12
    ds_train = FaceMaskDataset(str(tree), mode="train", fraction=0.5)
    assert len(ds_train) == 3


def test_item_format(tree):
    ds = FaceMaskDataset(str(tree), mode="train")
    img, lbl = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert lbl.shape == (32, 32) and lbl.max() < 12  # converted to 12-class


def test_paired_mode(tree):
    ds = FaceMaskDataset(str(tree), mode="train", paired=True)
    (src, _), (tgt, _) = ds[0][0], ds[0][1]
    assert src.shape == tgt.shape == (32, 32, 3)
    assert len(ds) == 3


def test_batches_and_sharding(tree):
    ds = FaceMaskDataset(str(tree), mode="all")
    it = ds.batches(4, onehot_size=16, shuffle=False)
    img, onehot = next(it)
    assert img.shape == (4, 32, 32, 3)
    assert onehot.shape == (4, 16, 16, 12)
    np.testing.assert_allclose(onehot.sum(-1), 1.0)
    # host sharding splits the index space
    it0 = ds.batches(2, shuffle=False, shard=(0, 2), onehot_size=None)
    it1 = ds.batches(2, shuffle=False, shard=(1, 2), onehot_size=None)
    next(it0), next(it1)


def test_label_conversions_range():
    assert celebahq19_to_face12(np.arange(19)).max() == 11
    assert ffhq19_to_face12(np.arange(19)).max() == 11
    # hat/cloth/neck_l go to background
    assert celebahq19_to_face12(np.array([14, 16, 18])).tolist() == [0, 0, 0]


def test_image_utils_roundtrip(rng):
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    np.testing.assert_allclose(from_pm1(to_pm1(img)), img, atol=1)
    vis = colorize_label_map(np.arange(12).reshape(3, 4))
    assert vis.shape == (3, 4, 3)
    grid = vis_faces_grid([[img, img], [img, img]])
    assert grid.shape == (16, 16, 3)
