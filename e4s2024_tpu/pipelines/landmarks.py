"""Landmark track smoothing + moving-least-squares image deformation.

Counterparts of the reference's video helpers:
- Kalman / Savitzky-Golay smoothing of per-frame landmark tracks
  (reference swap_face_fine/landmark_smooth.py:6-104),
- `image_deformation(image, ref, mode='rigid')` — MLS warping of a face toward
  reference landmarks (reference swap_face_fine/deformation_demo.py:450-600,
  Schaefer et al. 2006 rigid MLS), vectorized as a jitted inverse warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import savgol_filter


def kalman_smooth_landmarks(tracks: np.ndarray,
                            process_noise: float = 1e-3,
                            measurement_noise: float = 1e-2) -> np.ndarray:
    """Constant-position Kalman smoothing per coordinate.

    tracks: (F, P, 2) landmark tracks. Returns same shape."""
    f, p, d = tracks.shape
    x = tracks.reshape(f, p * d).astype(np.float64)
    est = np.empty_like(x)
    est[0] = x[0]
    var = np.ones(p * d)
    for t in range(1, f):
        var = var + process_noise
        k = var / (var + measurement_noise)
        est[t] = est[t - 1] + k * (x[t] - est[t - 1])
        var = (1 - k) * var
    return est.reshape(f, p, d).astype(tracks.dtype)


def savgol_smooth_landmarks(tracks: np.ndarray, window: int = 7,
                            order: int = 2) -> np.ndarray:
    """Savitzky-Golay smoothing along the frame axis (landmark_smooth.py:84)."""
    f = tracks.shape[0]
    window = min(window, f if f % 2 == 1 else f - 1)
    if window <= order:
        return tracks
    return savgol_filter(tracks, window, order, axis=0).astype(tracks.dtype)


@functools.partial(jax.jit, static_argnames=("height", "width", "alpha"))
def mls_rigid_deformation_grid(src_pts: jnp.ndarray, dst_pts: jnp.ndarray,
                               height: int, width: int,
                               alpha: float = 1.0) -> jnp.ndarray:
    """Rigid MLS inverse-warp grid (Schaefer 2006 §2.3).

    For each OUTPUT pixel v, find where to sample the source: control points
    `dst_pts` (in the output) map to `src_pts` (in the source).

    Returns (H, W, 2) sample positions (x, y).
    """
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    v = jnp.stack([xx, yy], -1).reshape(-1, 2)          # (N, 2)
    p = dst_pts.astype(jnp.float32)                      # (K, 2) in output
    q = src_pts.astype(jnp.float32)                      # (K, 2) in source

    d2 = jnp.sum(jnp.square(v[:, None] - p[None]), -1)   # (N, K)
    w = 1.0 / jnp.maximum(d2, 1e-8) ** alpha
    wsum = jnp.sum(w, -1, keepdims=True)
    p_star = (w @ p) / wsum                              # (N, 2)
    q_star = (w @ q) / wsum
    ph = p[None] - p_star[:, None]                       # (N, K, 2)
    qh = q[None] - q_star[:, None]

    # rigid MLS: similarity transform without scaling
    def perp(a):
        return jnp.stack([-a[..., 1], a[..., 0]], -1)

    vp = v - p_star                                       # (N, 2)
    a1 = jnp.sum(w * jnp.sum(qh * ph, -1), -1)            # (N,)
    a2 = jnp.sum(w * jnp.sum(qh * perp(ph), -1), -1)
    mu = jnp.sqrt(a1**2 + a2**2) + 1e-8
    r1 = jnp.stack([a1, -a2], -1) / mu[:, None]
    r2 = jnp.stack([a2, a1], -1) / mu[:, None]
    fx = vp[:, 0] * r1[:, 0] + vp[:, 1] * r2[:, 0]
    fy = vp[:, 0] * r1[:, 1] + vp[:, 1] * r2[:, 1]
    out = jnp.stack([fx, fy], -1) + q_star
    return out.reshape(height, width, 2)


@jax.jit
def warp_with_grid(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample img (H, W, C) at grid (H', W', 2) (x, y) positions."""
    h, w, _ = img.shape
    xs = jnp.clip(grid[..., 0], 0.0, w - 1.0)
    ys = jnp.clip(grid[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]
    top = img[y0, x0] * (1 - tx) + img[y0, x1] * tx
    bot = img[y1, x0] * (1 - tx) + img[y1, x1] * tx
    return top * (1 - ty) + bot * ty


def image_deformation(image: np.ndarray, landmarks: np.ndarray,
                      ref_landmarks: np.ndarray) -> np.ndarray:
    """Warp `image` so its landmarks move toward `ref_landmarks` (rigid MLS,
    the reference's image_deformation mode='rigid')."""
    h, w = image.shape[:2]
    grid = mls_rigid_deformation_grid(
        jnp.asarray(landmarks), jnp.asarray(ref_landmarks), h, w)
    out = warp_with_grid(jnp.asarray(image, jnp.float32), grid)
    return np.asarray(out)
