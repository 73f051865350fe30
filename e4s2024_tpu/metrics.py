"""Evaluation metrics: SSIM / PSNR / RMSE reconstruction eval + ID retrieval.

Re-design of reference metric/ (metric_utils.py:22-67: skimage compare_ssim
with gaussian_weights=True, use_sample_covariance=False — the SEAN issue-#5
protocol — over CelebA-HQ test recons; face_recognition/find_faces.py: ArcFace
cosine retrieval). skimage is not in this image, so SSIM is implemented here
(Wang et al. 2004, gaussian 11x11 sigma 1.5) as a jitted NHWC op and verified
against the published formula.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable 'valid' filtering per channel. x: (B, H, W, C)."""
    k = len(taps)
    c = x.shape[-1]
    kh = jnp.asarray(taps).reshape(k, 1, 1, 1)
    kw = jnp.asarray(taps).reshape(1, k, 1, 1)
    x = lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over channels (gaussian-weighted windows, population
    covariance — the protocol of reference metric_utils.py:51).

    a/b: (B, H, W, C) float. Returns (B,)."""
    taps = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2(a, taps)
    mu_b = _filter2(b, taps)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _filter2(a * a, taps) - mu_aa
    var_b = _filter2(b * b, taps) - mu_bb
    cov = _filter2(a * b, taps) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * cov + c2)) / (
        (mu_aa + mu_bb + c1) * (var_a + var_b + c2))
    return jnp.mean(s, axis=(1, 2, 3))


@functools.partial(jax.jit, static_argnames=("data_range",))
def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """(B,) peak signal-to-noise ratio."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


@jax.jit
def rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,) root-mean-square error (on [0,1] images in the reference protocol)."""
    return jnp.sqrt(jnp.mean(jnp.square(a - b), axis=(1, 2, 3)))


def reconstruction_metrics(recons: np.ndarray, gts: np.ndarray) -> dict:
    """Batch eval following reference metric_utils.calculate_metrics: SSIM on
    [0,1], PSNR on [0,255], RMSE on [0,1]. Inputs uint8 or [0,255] float NHWC."""
    r = np.asarray(recons, dtype=np.float32)
    g = np.asarray(gts, dtype=np.float32)
    return {
        "ssim": float(np.mean(np.asarray(ssim(jnp.asarray(g / 255.0),
                                              jnp.asarray(r / 255.0))))),
        "psnr": float(np.mean(np.asarray(psnr(jnp.asarray(g), jnp.asarray(r),
                                              data_range=255.0)))),
        "rmse": float(np.mean(np.asarray(rmse(jnp.asarray(g / 255.0),
                                              jnp.asarray(r / 255.0))))),
    }


def id_retrieval(query_embeddings: jnp.ndarray,
                 gallery_embeddings: jnp.ndarray,
                 true_indices: np.ndarray) -> float:
    """Top-1 ArcFace retrieval accuracy (reference
    metric/face_recognition/find_faces.py): cosine similarity of L2-normalized
    embeddings; fraction of queries whose nearest gallery item is correct."""
    sims = query_embeddings @ gallery_embeddings.T
    pred = jnp.argmax(sims, axis=1)
    return float(jnp.mean((pred == jnp.asarray(true_indices)).astype(jnp.float32)))
