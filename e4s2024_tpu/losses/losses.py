"""Training losses (TPU-native, functional).

Ports of reference criteria/: adversarial softplus losses (adv_loss.py:8-25),
R1 gradient penalty (adv_loss.py:29-40 — no conv2d_gradfix needed, JAX autodiff
through `lax.conv` is exact at every order), W-norm (w_norm.py), and the shared
multiscale feature-cosine loss used by both IDLoss (id_loss.py:31-57) and
FaceParsingLoss (face_parsing_loss.py:53-78).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from e4s2024_tpu.ops.pool import adaptive_avg_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear


def softplus(x):
    return jax.nn.softplus(x)


def adv_g_loss(fake_pred: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating generator loss (reference adv_loss.py:13)."""
    return jnp.mean(softplus(-fake_pred))


def adv_d_loss(real_pred: jnp.ndarray, fake_pred: jnp.ndarray) -> jnp.ndarray:
    """Discriminator loss (reference adv_loss.py:22)."""
    return jnp.mean(softplus(-real_pred)) + jnp.mean(softplus(fake_pred))


def r1_penalty(d_apply: Callable[[jnp.ndarray], jnp.ndarray],
               real_img: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty: E[||∇_x D(x)||^2] (reference adv_loss.py:29).

    `d_apply` maps images -> per-sample logits. Differentiable (second-order
    grads flow through jax.grad exactly)."""
    grad = jax.grad(lambda x: jnp.sum(d_apply(x)))(real_img)
    return jnp.mean(jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1))


def w_norm_loss(latent: jnp.ndarray, latent_avg: jnp.ndarray | None = None,
                start_from_latent_avg: bool = True) -> jnp.ndarray:
    """||w - w_avg||_2 summed over (layer, dim), averaged over (batch, comp)
    (reference w_norm.py:11)."""
    if start_from_latent_avg and latent_avg is not None:
        latent = latent - latent_avg
    norms = jnp.sqrt(jnp.sum(jnp.square(latent), axis=(2, 3)))
    return jnp.sum(norms) / (latent.shape[0] * latent.shape[1])


def feature_cosine_loss(feats_pred: Sequence[jnp.ndarray],
                        feats_target: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """sum over scales of mean_i (1 - <f(ŷ)_i, f(y)_i>); targets are
    stop-gradiented (reference id_loss.py:40-56). Features are L2-normalized
    by the extractors."""
    total = 0.0
    for fp, ft in zip(feats_pred, feats_target):
        ft = jax.lax.stop_gradient(ft)
        sim = jnp.sum(fp * ft, axis=-1)
        total = total + jnp.mean(1.0 - sim)
    return total


def id_loss_crop(x: jnp.ndarray) -> jnp.ndarray:
    """The IDLoss input pipeline (reference id_loss.py:24-28): adaptive-pool to
    256, crop rows 35:223 / cols 32:220, adaptive-pool to 112. NHWC."""
    if x.shape[1] != 256:
        x = adaptive_avg_pool2d(x, (256, 256))
    x = x[:, 35:223, 32:220, :]
    return adaptive_avg_pool2d(x, (112, 112))


def multiscale_lpips(lpips_apply: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                     y_hat: jnp.ndarray, y: jnp.ndarray,
                     n_scales: int = 3, min_size: int = 31) -> jnp.ndarray:
    """LPIPS summed over an adaptive-avg-pool pyramid (full, /2, /4), matching
    reference training/coach.py:476-487.

    Scales below `min_size` are skipped: under 31 px the AlexNet conv/pool
    stack produces a zero-sized spatial dim (pool2 needs a 3-px input that a
    16-px image can't supply) and the spatial mean over the empty axis is
    NaN — the torch reference errors outright on such inputs (it only ever
    runs the pyramid at >=256 px), so skipping is a strict extension that
    keeps tiny-config training finite."""
    total = 0.0
    size = y_hat.shape[1]
    for i in range(n_scales):
        s = size // (2**i)
        if s < min_size:
            break
        a = adaptive_avg_pool2d(y_hat, (s, s))
        b = adaptive_avg_pool2d(y, (s, s))
        total = total + lpips_apply(a, b)
    return total


def g_path_lengths_penalty(grads: jnp.ndarray, mean_path_length: jnp.ndarray,
                           decay: float = 0.01):
    """StyleGAN2 path-length regularizer (reference adv_loss.py:43-59; unused
    by the reference coach but part of the loss inventory).

    Given grads = d<fake, noise>/dlatents (B, n_latent, 512) — obtained via
    jax.grad of sum(generator(latents) * noise) with noise ~ N(0, 1/(H*W)) —
    compute the penalty and the EMA'd mean path length."""
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grads), axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths)
                                            - mean_path_length)
    penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths
