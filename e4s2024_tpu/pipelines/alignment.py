"""FFHQ-style face alignment: quad computation, crop, perspective paste-back.

Re-design of the reference's STIT-derived alignment stack (reference
utils/alignment.py:150-284): the quad math stays numpy (it is a handful of
scalars per face), but the actual resampling — quad crop and inverse-perspective
paste-back, which the reference does through PIL on CPU — is a jitted bilinear
gather that runs on device as part of the swap pipeline.

Landmark detection is pluggable: any (68, 2) landmark array works (the
reference uses dlib / face_alignment, alignment.py:41-80, neither of which has
a TPU analogue; see e4s2024_tpu.pipelines.swap for the detector hook).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d


def compute_transform_from_landmarks(lm: np.ndarray, scale: float = 1.0):
    """FFHQ crop frame (c, x, y) from 68-point landmarks (reference
    alignment.py:191-222)."""
    lm = np.asarray(lm, dtype=np.float64)
    eye_left = lm[36:42].mean(axis=0)
    eye_right = lm[42:48].mean(axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[48] + lm[54]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    norm = np.hypot(*x)
    if not np.isfinite(lm).all() or norm < 1e-8:
        # degenerate landmarks (all-coincident points / NaNs from an upstream
        # detector failure) would yield a NaN quad and silently produce
        # garbage crops downstream — fail loudly instead
        raise ValueError(
            "degenerate 68-pt landmarks: cannot derive an FFHQ crop frame")
    x /= norm
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    x *= scale
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    return c, x, y


def quad_from_cxy(c: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Quad corners (NW, SW, SE, NE) from the crop frame (alignment.py:94)."""
    return np.stack([c - x - y, c - x + y, c + x + y, c + x - y])


def smooth_video_quads(cs, xs, ys, center_sigma=1.0, xy_sigma=3.0):
    """Temporal gaussian smoothing of per-frame crop frames (alignment.py:246-251)."""
    cs, xs, ys = np.stack(cs), np.stack(xs), np.stack(ys)
    if center_sigma:
        cs = gaussian_filter1d(cs, sigma=center_sigma, axis=0)
    if xy_sigma:
        xs = gaussian_filter1d(xs, sigma=xy_sigma, axis=0)
        ys = gaussian_filter1d(ys, sigma=xy_sigma, axis=0)
    return [quad_from_cxy(c, x, y) for c, x, y in zip(cs, xs, ys)]


def perspective_coefficients(pa, pb) -> np.ndarray:
    """8 perspective coeffs mapping pb -> pa... precisely: the coeffs such that
    points pa in the OUTPUT map to pb in the INPUT (PIL convention; reference
    alignment.py:273-284 `calc_alignment_coefficients`)."""
    matrix = []
    for p1, p2 in zip(pa, pb):
        matrix.append([p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]])
        matrix.append([0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]])
    a = np.asarray(matrix, dtype=np.float64)
    b = np.asarray(pb, dtype=np.float64).reshape(8)
    return np.linalg.solve(a.T @ a, a.T @ b)


def _bilinear_gather(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at float positions (pixel-index space); PIL-style
    zero fill outside."""
    h, w, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = xs - x0
    ty = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - tx)[..., None] + v01 * tx[..., None]
    bot = v10 * (1 - tx)[..., None] + v11 * tx[..., None]
    return top * (1 - ty)[..., None] + bot * ty[..., None]


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_quad(img: jnp.ndarray, quad: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear quad crop, PIL Image.transform(QUAD) semantics (alignment.py:144:
    the reference passes quad + 0.5, which cancels PIL's half-pixel offset —
    pass the raw quad here).

    img: (H, W, C); quad: (4, 2) float (NW, SW, SE, NE) in (x, y) order.
    """
    s = out_size
    # PIL evaluates the transform at output pixel centers (x + 0.5) and samples
    # the source at (coord - 0.5) in array-index space.
    jj = (jnp.arange(s, dtype=jnp.float32) + 0.5)[None, :].repeat(s, 0)
    ii = (jnp.arange(s, dtype=jnp.float32) + 0.5)[:, None].repeat(s, 1)
    u = jj / s
    v = ii / s
    nw, sw, se, ne = quad[0], quad[1], quad[2], quad[3]
    pos = (
        nw[None, None]
        + u[..., None] * (ne - nw)[None, None]
        + v[..., None] * (sw - nw)[None, None]
        + (u * v)[..., None] * (se - sw - ne + nw)[None, None]
    )
    return _bilinear_gather(img, pos[..., 0] - 0.5, pos[..., 1] - 0.5)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_perspective(img: jnp.ndarray, coeffs: jnp.ndarray,
                     out_hw: tuple[int, int]) -> jnp.ndarray:
    """PIL Image.transform(PERSPECTIVE) semantics: for each output pixel (x, y),
    sample input at ((a x + b y + c) / (g x + h y + 1), (d x + e y + f) / (...)).

    img: (H, W, C); coeffs: (8,). Used for paste-back onto the original frame
    (reference Face_swap_with_two_imgs.py:264-279).
    """
    oh, ow = out_hw
    a, b, c, d, e, f, g, h = [coeffs[i] for i in range(8)]
    # PIL: evaluate at output pixel centers, sample source at (coord - 0.5).
    xx = (jnp.arange(ow, dtype=jnp.float32) + 0.5)[None, :].repeat(oh, 0)
    yy = (jnp.arange(oh, dtype=jnp.float32) + 0.5)[:, None].repeat(ow, 1)
    den = g * xx + h * yy + 1.0
    xs = (a * xx + b * yy + c) / den - 0.5
    ys = (d * xx + e * yy + f) / den - 0.5
    return _bilinear_gather(img, xs, ys)


def paste_back_coefficients(quad: np.ndarray, crop_size: int) -> np.ndarray:
    """Coefficients for pasting a crop back into the frame: frame pixel ->
    crop pixel (reference Face_swap_with_two_imgs.py:97 builds these from the
    crop quad + 0.5)."""
    corners = [(0, 0), (0, crop_size), (crop_size, crop_size), (crop_size, 0)]
    return perspective_coefficients(np.asarray(quad) + 0.5, corners)
