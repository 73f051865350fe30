"""Color transfer tests: statistical properties + mode dispatch."""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s2024_tpu.ops.color import (
    skin_color_transfer, reinhard_color_transfer, linear_color_transfer,
    color_transfer_mkl, color_transfer_sot, color_hist_match,
    _rgb_to_lab, _lab_to_rgb,
)


def _img(rng, mean, std):
    return np.clip(rng.standard_normal((32, 32, 3)) * std + mean, 0, 1).astype(np.float32)


def test_lab_roundtrip(rng):
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    back = np.asarray(_lab_to_rgb(_rgb_to_lab(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_lab_matches_cv2(rng):
    import cv2
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    got = np.asarray(_rgb_to_lab(jnp.asarray(rgb)))
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    np.testing.assert_allclose(got, want, atol=0.5)  # cv2 uses slightly different CIE constants


@pytest.mark.parametrize("mode", ["lct", "rct", "mkl", "sot", "hist", "mix", "idt"])
def test_modes_move_statistics(rng, mode):
    src = _img(rng, 0.3, 0.08)   # dark-ish
    ref = _img(rng, 0.7, 0.05)   # bright-ish
    out = skin_color_transfer(src, ref, mode)
    assert out.shape == src.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # output mean should move toward the reference mean
    d_before = abs(src.mean() - ref.mean())
    d_after = abs(out.mean() - ref.mean())
    assert d_after < d_before * 0.5, (mode, d_before, d_after)


def test_rct_exact_stats(rng):
    src = _img(rng, 0.4, 0.1)
    ref = _img(rng, 0.6, 0.05)
    out = np.asarray(reinhard_color_transfer(jnp.asarray(src), jnp.asarray(ref)))
    lab_out = np.asarray(_rgb_to_lab(jnp.asarray(out)))
    lab_ref = np.asarray(_rgb_to_lab(jnp.asarray(ref)))
    # L-channel mean matched within clipping error
    assert abs(lab_out[..., 0].mean() - lab_ref[..., 0].mean()) < 2.0


def test_hist_match_quantiles(rng):
    src = _img(rng, 0.3, 0.1)
    ref = _img(rng, 0.7, 0.05)
    out = color_hist_match(src, ref)
    np.testing.assert_allclose(np.quantile(out, 0.5), np.quantile(ref, 0.5), atol=0.02)


def test_unknown_mode():
    with pytest.raises(ValueError):
        skin_color_transfer(np.zeros((4, 4, 3)), np.zeros((4, 4, 3)), "nope")
