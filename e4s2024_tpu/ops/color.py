"""Skin color transfer — the classical DFL-family algorithms.

TPU-native (jnp) re-implementations of the modes the reference exposes through
`skin_color_transfer` (reference swap_face_fine/color_transfer.py:164-530):
lct (linear/PCA), rct (Reinhard LAB stats), mkl (Monge-Kantorovich linear),
sot (sliced optimal transport), idt (iterative distribution transfer),
hist (per-channel histogram match), mix.

Linear modes (lct/rct/mkl) are closed-form matmuls/eigh on 3x3 statistics and
run jitted on device. The histogram-based modes (idt/hist) are data-dependent
resampling and run host-side in numpy, as in the reference.

All images float in [0, 1], HWC RGB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- colorspace

_RGB2LMS = jnp.asarray([[0.3811, 0.5783, 0.0402],
                        [0.1967, 0.7244, 0.0782],
                        [0.0241, 0.1288, 0.8444]])


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)


def _rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """CIELAB (D65), cv2 float convention (sRGB gamma applied): L in [0,100]."""
    rgb = _srgb_to_linear(rgb)
    m = jnp.asarray([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]])
    xyz = rgb @ m.T
    xyz = xyz / jnp.asarray([0.950456, 1.0, 1.088754])

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xyz[..., 0]), f(xyz[..., 1]), f(xyz[..., 2])
    L = jnp.where(xyz[..., 1] > 0.008856,
                  116.0 * jnp.cbrt(xyz[..., 1]) - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def _lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t**3
        return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    xyz = jnp.stack([finv(fx), finv(fy), finv(fz)], axis=-1)
    xyz = xyz * jnp.asarray([0.950456, 1.0, 1.088754])
    m_inv = jnp.asarray([[3.240479, -1.537150, -0.498535],
                         [-0.969256, 1.875992, 0.041556],
                         [0.055648, -0.204043, 1.057311]])
    return _linear_to_srgb(xyz @ m_inv.T)


# ---------------------------------------------------------------- linear modes

def _masked_stats(x_flat, mask_flat):
    w = mask_flat[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x_flat * w, axis=0) / n
    var = jnp.sum(jnp.square(x_flat - mean) * w, axis=0) / n
    return mean, jnp.sqrt(var + 1e-8)


@jax.jit
def reinhard_color_transfer(target: jnp.ndarray, source: jnp.ndarray,
                            target_mask: jnp.ndarray | None = None,
                            source_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """rct: match per-channel LAB mean/std of target to source (reference
    color_transfer.py:294; Reinhard et al. 2001)."""
    t_lab = _rgb_to_lab(target).reshape(-1, 3)
    s_lab = _rgb_to_lab(source).reshape(-1, 3)
    tm = (jnp.ones(t_lab.shape[0]) if target_mask is None
          else (target_mask.reshape(-1) >= 0.5).astype(jnp.float32))
    sm = (jnp.ones(s_lab.shape[0]) if source_mask is None
          else (source_mask.reshape(-1) >= 0.5).astype(jnp.float32))
    t_mean, t_std = _masked_stats(t_lab, tm)
    s_mean, s_std = _masked_stats(s_lab, sm)
    out = (t_lab - t_mean) * (s_std / t_std) + s_mean
    out = out.reshape(target.shape)
    return jnp.clip(_lab_to_rgb(out), 0.0, 1.0)


def _cov(x_flat):
    mean = jnp.mean(x_flat, axis=0)
    xc = x_flat - mean
    return xc.T @ xc / (x_flat.shape[0] - 1), mean


@jax.jit
def linear_color_transfer(target: jnp.ndarray, source: jnp.ndarray,
                          eps: float = 1e-5) -> jnp.ndarray:
    """lct (pca mode): whiten target covariance, recolor with source's
    (reference color_transfer.py:345)."""
    t = target.reshape(-1, 3)
    s = source.reshape(-1, 3)
    ct, mt = _cov(t)
    cs, ms = _cov(s)
    dt, ut = jnp.linalg.eigh(ct + eps * jnp.eye(3))
    ds, us = jnp.linalg.eigh(cs + eps * jnp.eye(3))
    qt = ut @ jnp.diag(jnp.sqrt(jnp.maximum(dt, eps))) @ ut.T
    qs = us @ jnp.diag(jnp.sqrt(jnp.maximum(ds, eps))) @ us.T
    m = qs @ jnp.linalg.inv(qt)
    out = (t - mt) @ m.T + ms
    return jnp.clip(out.reshape(target.shape), 0.0, 1.0)


@jax.jit
def color_transfer_mkl(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Monge-Kantorovich linear transfer (reference color_transfer.py:218;
    Pitie & Kokaram 2007). x0 recolored toward x1."""
    eps = 1e-12
    a_flat = x0.reshape(-1, 3)
    b_flat = x1.reshape(-1, 3)
    a, ma = _cov(a_flat)
    b, mb = _cov(b_flat)
    da2, ua = jnp.linalg.eigh(a)
    da = jnp.sqrt(jnp.maximum(da2, eps))
    c = (da[:, None] * (ua.T @ b @ ua)) * da[None, :]
    dc2, uc = jnp.linalg.eigh(c)
    dc = jnp.sqrt(jnp.maximum(dc2, eps))
    da_inv = 1.0 / da
    t = (ua * da_inv[None, :]) @ (uc * dc[None, :]) @ uc.T @ (da_inv[:, None] * ua.T)
    out = (a_flat - ma) @ t + mb
    return jnp.clip(out.reshape(x0.shape), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("steps", "batch_size"))
def color_transfer_sot(src: jnp.ndarray, trg: jnp.ndarray, *, steps: int = 10,
                       batch_size: int = 5, seed: int = 0) -> jnp.ndarray:
    """Sliced optimal transport (reference color_transfer.py:164): advect src
    colors toward trg along random 1-D projections via sort matching."""
    h, w, c = src.shape
    n = h * w
    x = src.reshape(n, c)
    y = trg.reshape(n, c)
    key = jax.random.PRNGKey(seed)

    def step(x, key):
        def one_dir(carry, k):
            adv = carry
            d = jax.random.normal(k, (c,))
            d = d / jnp.linalg.norm(d)
            px = x @ d
            py = y @ d
            ix = jnp.argsort(px)
            iy = jnp.argsort(py)
            a = py[iy] - px[ix]
            adv = adv.at[ix].add(a[:, None] * d[None, :])
            return adv, None

        keys = jax.random.split(key, batch_size)
        adv, _ = jax.lax.scan(one_dir, jnp.zeros_like(x), keys)
        return x + adv / batch_size

    keys = jax.random.split(key, steps)
    x = jax.lax.fori_loop(0, steps, lambda i, xv: step(xv, keys[i]), x)
    return jnp.clip(x.reshape(h, w, c), 0.0, 1.0)


# ---------------------------------------------------------------- histogram modes

def channel_hist_match(source: np.ndarray, template: np.ndarray) -> np.ndarray:
    """Match one channel's histogram to a template (reference
    color_transfer.py:409)."""
    oldshape = source.shape
    s = source.ravel()
    t = template.ravel()
    s_values, bin_idx, s_counts = np.unique(s, return_inverse=True,
                                            return_counts=True)
    t_values, t_counts = np.unique(t, return_counts=True)
    s_quantiles = np.cumsum(s_counts).astype(np.float64) / s.size
    t_quantiles = np.cumsum(t_counts).astype(np.float64) / t.size
    interp = np.interp(s_quantiles, t_quantiles, t_values)
    return interp[bin_idx].reshape(oldshape)


def color_hist_match(src: np.ndarray, trg: np.ndarray) -> np.ndarray:
    """Per-channel histogram matching (reference color_transfer.py:437)."""
    out = np.stack([channel_hist_match(src[..., i], trg[..., i])
                    for i in range(src.shape[-1])], axis=-1)
    return np.clip(out, 0.0, 1.0).astype(src.dtype)


def color_transfer_idt(i0: np.ndarray, i1: np.ndarray, bins: int = 256,
                       n_rot: int = 20, seed: int = 0) -> np.ndarray:
    """Iterative distribution transfer (reference color_transfer.py:249):
    repeated random-rotation histogram matching."""
    from scipy.stats import special_ortho_group

    rng = np.random.default_rng(seed)
    h, w, c = i0.shape
    d0 = i0.reshape(-1, c).T.astype(np.float64)
    d1 = i1.reshape(-1, c).T.astype(np.float64)
    relaxation = 1.0 / n_rot
    for _ in range(n_rot):
        r = special_ortho_group.rvs(c, random_state=rng)
        d0r = r @ d0
        d1r = r @ d1
        d_r = np.empty_like(d0r)
        for j in range(c):
            lo = min(d0r[j].min(), d1r[j].min())
            hi = max(d0r[j].max(), d1r[j].max())
            p0r, edges = np.histogram(d0r[j], bins=bins, range=(lo, hi))
            p1r, _ = np.histogram(d1r[j], bins=bins, range=(lo, hi))
            cp0r = p0r.cumsum().astype(np.float64)
            cp0r /= max(cp0r[-1], 1)
            cp1r = p1r.cumsum().astype(np.float64)
            cp1r /= max(cp1r[-1], 1)
            f = np.interp(cp0r, cp1r, edges[1:])
            d_r[j] = np.interp(d0r[j], edges[1:], f, left=0, right=bins)
        d0 = relaxation * np.linalg.solve(r, d_r - d0r) + d0
    return np.clip(d0.T.reshape(h, w, c), 0.0, 1.0).astype(i0.dtype)


def color_transfer_mix(src: np.ndarray, trg: np.ndarray) -> np.ndarray:
    """mkl then per-channel histogram match (reference color_transfer.py:451)."""
    stage1 = np.asarray(color_transfer_mkl(jnp.asarray(src), jnp.asarray(trg)))
    return color_hist_match(stage1, trg)


def skin_color_transfer(img: np.ndarray, ref: np.ndarray,
                        mode: str = "rct") -> np.ndarray:
    """Dispatch like the reference's ct_mode switch (color_transfer.py:477+).

    img/ref: HWC float RGB in [0,1]. Returns the recolored img."""
    if mode == "lct":
        return np.asarray(linear_color_transfer(jnp.asarray(img), jnp.asarray(ref)))
    if mode == "rct":
        return np.asarray(reinhard_color_transfer(jnp.asarray(img), jnp.asarray(ref)))
    if mode == "mkl":
        return np.asarray(color_transfer_mkl(jnp.asarray(img), jnp.asarray(ref)))
    if mode == "sot":
        return np.asarray(color_transfer_sot(jnp.asarray(img), jnp.asarray(ref)))
    if mode == "idt":
        return color_transfer_idt(img, ref)
    if mode == "hist":
        return color_hist_match(img, ref)
    if mode in ("mix", "adaptive"):
        return color_transfer_mix(img, ref)
    raise ValueError(f"unknown color transfer mode {mode!r}")
