"""ArcFace 5-point similarity alignment.

Port of the reference's root alignment.py (`estimate_norm` / `norm_crop`,
reference /alignment.py:24-150): Umeyama similarity fit of 5 facial landmarks
to the arcface/ffhq/set1 template points, then affine warp. The warp runs as a
jitted bilinear gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TEMPLATES = {
    "arcface": np.array([
        [38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
        [41.5493, 92.3655], [70.7299, 92.2041]], np.float32),
    "set1": np.array([
        [41.125, 50.75], [71.75, 49.4375], [49.875, 73.0625],
        [45.9375, 87.9375], [70.4375, 87.9375]], np.float32),
    "ffhq": np.array([
        [192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
        [201.26117, 371.41043], [313.08905, 371.15118]], np.float32),
}


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 similarity transform mapping src points to dst (Umeyama 1991)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    ss = src - mu_s
    dd = dst - mu_d
    cov = dd.T @ ss / n
    u, s, vt = np.linalg.svd(cov)
    d = np.ones(2)
    if np.linalg.det(cov) < 0:
        d[-1] = -1
    r = u @ np.diag(d) @ vt
    var_s = (ss**2).sum() / n
    scale = (s * d).sum() / var_s
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m


def estimate_norm(landmark5: np.ndarray, image_size: int = 112,
                  mode: str = "arcface") -> np.ndarray:
    """2x3 warp matrix from 5 landmarks to the template (reference
    /alignment.py:100-139). Templates are defined for 112 (arcface/set1) or
    512 (ffhq) and scaled to image_size."""
    tmpl = TEMPLATES[mode].copy()
    base = 512.0 if mode == "ffhq" else 112.0
    tmpl = tmpl * (image_size / base)
    return umeyama_similarity(np.asarray(landmark5, np.float64), tmpl)


@functools.partial(jax.jit, static_argnames=("out_size",))
def warp_affine(img: jnp.ndarray, m: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """cv2.warpAffine semantics: for output (x, y), sample input at
    M^{-1} (x, y). img: (H, W, C); m: (2, 3)."""
    a = jnp.concatenate([m, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    inv = jnp.linalg.inv(a)
    xx = jnp.arange(out_size, dtype=jnp.float32)[None, :].repeat(out_size, 0)
    yy = jnp.arange(out_size, dtype=jnp.float32)[:, None].repeat(out_size, 1)
    xs = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    ys = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]

    h, w, _ = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0, x0) * (1 - tx) + tap(y0, x0 + 1) * tx
    bot = tap(y0 + 1, x0) * (1 - tx) + tap(y0 + 1, x0 + 1) * tx
    return top * (1 - ty) + bot * ty


def norm_crop(img: np.ndarray, landmark5: np.ndarray, image_size: int = 112,
              mode: str = "arcface"):
    """Aligned crop + the warp matrix (reference /alignment.py:142-150)."""
    m = estimate_norm(landmark5, image_size, mode)
    warped = warp_affine(jnp.asarray(img, jnp.float32), jnp.asarray(m),
                         image_size)
    return np.asarray(warped), m


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_affine_hw(img: jnp.ndarray, m: jnp.ndarray,
                   out_hw: tuple[int, int]) -> jnp.ndarray:
    """warp_affine with a rectangular output (for pasting aligned crops back
    onto full frames). img: (H, W, C); m: (2, 3) mapping OUTPUT -> img coords
    is m^{-1}, cv2 semantics like `warp_affine`."""
    oh, ow = out_hw
    a = jnp.concatenate([m, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    inv = jnp.linalg.inv(a)
    xx = jnp.arange(ow, dtype=jnp.float32)[None, :].repeat(oh, 0)
    yy = jnp.arange(oh, dtype=jnp.float32)[:, None].repeat(ow, 1)
    xs = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    ys = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]

    h, w, _ = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0, x0) * (1 - tx) + tap(y0, x0 + 1) * tx
    bot = tap(y0 + 1, x0) * (1 - tx) + tap(y0 + 1, x0 + 1) * tx
    return top * (1 - ty) + bot * ty


def invert_affine(m: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine (for crop -> frame paste-back)."""
    a = np.vstack([np.asarray(m, np.float64), [0.0, 0.0, 1.0]])
    return np.linalg.inv(a)[:2]
