"""Tests for morphology, pyramid blending, soft erosion, and alignment warps
(PIL is the oracle for the warps, cv2 for the pyramids)."""

import cv2
import numpy as np
import PIL.Image
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from e4s2024_tpu.ops.morphology import dilation, erosion
from e4s2024_tpu.ops.blend import (
    pyr_down, pyr_up, laplacian_pyramid_blend, soft_erosion, blend_with_mask,
    facial_mask_from_seg12,
)
from e4s2024_tpu.pipelines.alignment import (
    crop_quad, warp_perspective, perspective_coefficients,
    paste_back_coefficients, compute_transform_from_landmarks, quad_from_cxy,
)


def test_dilation_erosion_matches_maxpool(rng):
    x = (rng.random((1, 16, 16, 1)) > 0.7).astype(np.float32)
    got_d = np.asarray(dilation(jnp.asarray(x), 5))
    got_e = np.asarray(erosion(jnp.asarray(x), 5))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want_d = F.max_pool2d(xt, 5, 1, 2).permute(0, 2, 3, 1).numpy()
    want_e = -F.max_pool2d(-xt, 5, 1, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got_d, want_d)
    np.testing.assert_array_equal(got_e, want_e)


def test_pyr_down_up_matches_cv2(rng):
    x = rng.random((32, 32, 3)).astype(np.float32)
    got_down = np.asarray(pyr_down(jnp.asarray(x)[None]))[0]
    want_down = cv2.pyrDown(x)
    np.testing.assert_allclose(got_down, want_down, atol=1e-5)
    got_up = np.asarray(pyr_up(jnp.asarray(want_down)[None]))[0]
    want_up = cv2.pyrUp(want_down)
    np.testing.assert_allclose(got_up, want_up, atol=1e-5)


def test_laplacian_blend_dc_and_mask(rng):
    a = jnp.full((1, 64, 64, 3), 200.0)
    b = jnp.full((1, 64, 64, 3), 50.0)
    m = jnp.zeros((1, 64, 64, 1)).at[:, :, :32].set(1.0)
    out = np.asarray(laplacian_pyramid_blend(a, b, m, num_levels=5))
    # multiband blending leaks DC near the seam by design (coarse-level mask
    # blur) — check the sides approach their sources and the seam is monotone
    assert np.abs(out[0, :, :4] - 200.0).max() < 12.0
    assert np.abs(out[0, :, -4:] - 50.0).max() < 12.0
    assert out[0, 32, 8, 0] > out[0, 32, 56, 0]
    mid = out[0, 32, :, 0]
    assert np.all(np.diff(mid) <= 1e-3)  # monotone decreasing across the seam


def test_soft_erosion_properties(rng):
    m = np.zeros((1, 64, 64, 1), np.float32)
    m[:, 16:48, 16:48] = 1.0
    soft, hard = soft_erosion(jnp.asarray(m), kernel_size=15, threshold=0.6)
    soft = np.asarray(soft)
    assert soft.max() <= 1.0 + 1e-6
    assert soft[0, 32, 32, 0] == 1.0          # interior stays 1
    assert soft[0, 16, 16, 0] < 1.0           # corner softened
    assert soft[0, 0, 0, 0] == 0.0


def test_blend_with_mask_nan_safe():
    bottom = jnp.zeros((4, 4, 3))
    up = jnp.ones((4, 4, 3))
    mask = jnp.full((4, 4, 1), jnp.nan)
    out = np.asarray(blend_with_mask(bottom, up, mask, 0.75))
    np.testing.assert_array_equal(out, 0.0)


def test_facial_mask_classes():
    seg = jnp.asarray(np.arange(12).reshape(1, 3, 4))
    m = np.asarray(facial_mask_from_seg12(seg))
    on = {1, 2, 3, 5, 6, 8, 9}
    for c in range(12):
        assert m.reshape(-1)[c] == (1.0 if c in on else 0.0)


def _checker(h, w):
    img = np.zeros((h, w, 3), np.float32)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 128
    img[:, :, 1] = np.linspace(0, 255, w)[None, :]
    return img


def test_crop_quad_matches_pil(rng):
    img = _checker(64, 64)
    # non-integer quad: avoids sampling positions landing exactly on .5 ties,
    # where PIL and jnp bilinear can legitimately pick different neighbors
    c = np.array([30.3, 34.2])
    x = np.array([14.1, 3.2])
    y = np.array([-3.2, 14.1])
    quad = quad_from_cxy(c, x, y)
    got = np.asarray(crop_quad(jnp.asarray(img), jnp.asarray(quad + 0.5), 32))
    pil = PIL.Image.fromarray(img.astype(np.uint8))
    want = pil.transform((32, 32), PIL.Image.QUAD, (quad + 0.5).flatten(),
                         PIL.Image.BILINEAR)
    want = np.asarray(want).astype(np.float32)
    # uint8 rounding in the oracle -> tolerance 1
    assert np.abs(got - want).mean() < 1.0


def test_warp_perspective_matches_pil(rng):
    img = _checker(48, 48)
    src = [(0, 0), (0, 32), (32, 32), (32, 0)]
    dst_quad = np.array([[5.3, 6.2], [8.1, 40.4], [43.2, 38.7], [40.6, 4.9]])
    coeffs = perspective_coefficients(dst_quad, src)
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(coeffs), (48, 48)))
    pil = PIL.Image.fromarray(img.astype(np.uint8))
    want = np.asarray(
        pil.transform((48, 48), PIL.Image.PERSPECTIVE, tuple(coeffs),
                      PIL.Image.BILINEAR)
    ).astype(np.float32)
    assert np.abs(got - want).mean() < 1.5


def test_paste_back_roundtrip():
    """crop then paste back: interior pixels survive the round trip.

    Uses smooth ramps — high-frequency content is necessarily blurred by the
    double bilinear resample at half-pixel offsets (same as the reference's
    PIL path)."""
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :, 0] = np.arange(64)[None, :]
    img[:, :, 1] = np.arange(64)[:, None]
    c = np.array([32.0, 32.0]); x = np.array([16.0, 0.0]); y = np.array([0.0, 16.0])
    quad = quad_from_cxy(c, x, y)
    crop = np.asarray(crop_quad(jnp.asarray(img), jnp.asarray(quad + 0.5), 32))
    coeffs = paste_back_coefficients(quad, 32)
    pasted = np.asarray(warp_perspective(jnp.asarray(crop), jnp.asarray(coeffs), (64, 64)))
    # inside the quad (with margin), pasted == original
    inner = slice(24, 40)
    assert np.abs(pasted[inner, inner] - img[inner, inner]).mean() < 2.0


def test_compute_transform_shapes():
    lm = np.stack([np.linspace(10, 50, 68), np.linspace(20, 60, 68)], axis=1)
    c, x, y = compute_transform_from_landmarks(lm)
    assert c.shape == (2,) and x.shape == (2,) and y.shape == (2,)
    q = quad_from_cxy(c, x, y)
    assert q.shape == (4, 2)


def test_planar_variants_match_nhwc(rng):
    """Planar (B, C, H, W) compositing ops must equal their NHWC forms."""
    from e4s2024_tpu.ops.blend import (
        pyr_down, pyr_up, pyr_down_planar, pyr_up_planar,
        soft_erosion, soft_erosion_planar,
        laplacian_pyramid_blend, laplacian_pyramid_blend_planar,
    )
    from e4s2024_tpu.ops.morphology import dilation, dilation_planar
    from e4s2024_tpu.ops.resize import resize_bilinear, resize_bilinear_planar

    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    xp = x.transpose(0, 3, 1, 2)
    to_nhwc = lambda t: np.asarray(t.transpose(0, 2, 3, 1))

    np.testing.assert_allclose(to_nhwc(pyr_down_planar(xp)),
                               np.asarray(pyr_down(x)), atol=1e-6)
    np.testing.assert_allclose(to_nhwc(pyr_up_planar(xp)),
                               np.asarray(pyr_up(x)), atol=1e-6)
    np.testing.assert_allclose(to_nhwc(dilation_planar(xp, 5)),
                               np.asarray(dilation(x, 5)), atol=0)
    np.testing.assert_allclose(to_nhwc(resize_bilinear_planar(xp, (48, 48))),
                               np.asarray(resize_bilinear(x, (48, 48))),
                               atol=1e-6)

    m = jnp.asarray((rng.random((2, 32, 32, 2)) > 0.5).astype(np.float32))
    sp, hp = soft_erosion_planar(m.transpose(0, 3, 1, 2))
    sn, hn = soft_erosion(m)
    np.testing.assert_allclose(to_nhwc(sp), np.asarray(sn), atol=1e-6)
    np.testing.assert_array_equal(to_nhwc(hp.astype(jnp.float32)),
                                  np.asarray(hn.astype(jnp.float32)))

    a = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32) * 255)
    b = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32) * 255)
    mk = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32))
    np.testing.assert_allclose(
        to_nhwc(laplacian_pyramid_blend_planar(
            a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2),
            mk.transpose(0, 3, 1, 2), num_levels=4)),
        np.asarray(laplacian_pyramid_blend(a, b, mk, num_levels=4)),
        atol=1e-3)


def test_degenerate_landmarks_raise():
    """Coincident or NaN landmarks must fail loudly, not propagate a NaN
    quad into silently-garbage crops (found driving swap_all on a
    featureless frame)."""
    import pytest

    with pytest.raises(ValueError, match="degenerate"):
        compute_transform_from_landmarks(np.full((68, 2), 5.0))
    with pytest.raises(ValueError, match="degenerate"):
        compute_transform_from_landmarks(np.full((68, 2), np.nan))
