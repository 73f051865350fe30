"""Native data-prep library vs numpy fallback parity + throughput sanity."""

import numpy as np
import pytest

from e4s2024_tpu.data import native


def test_native_builds():
    assert native.native_available(), "native lib should build in this image"


def test_images_pm1_parity(rng):
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    got = native.images_to_pm1(imgs)
    want = imgs.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_onehot_parity(rng):
    lbl = rng.integers(0, 12, (2, 37, 53), dtype=np.uint8)
    got = native.labels_to_onehot(lbl, 16, 12)
    ih = (np.arange(16) * 37) // 16
    iw = (np.arange(16) * 53) // 16
    small = lbl[:, ih][:, :, iw]
    want = np.eye(12, dtype=np.float32)[small]
    np.testing.assert_array_equal(got, want)


def test_onehot_out_of_range_class(rng):
    lbl = np.full((1, 8, 8), 18, np.uint8)  # class >= K -> all-zero row
    got = native.labels_to_onehot(lbl, 8, 12)
    np.testing.assert_array_equal(got, 0.0)


def test_hflip_parity(rng):
    img = rng.integers(0, 256, (33, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.hflip(img), img[:, ::-1])
