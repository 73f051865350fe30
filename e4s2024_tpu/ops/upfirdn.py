"""upfirdn2d — upsample / FIR filter / downsample resampling, TPU-native.

This is the JAX/XLA replacement for the reference's CUDA kernel package
(reference models/stylegan2/op/upfirdn2d.py:142 and upfirdn2d_kernel.cu): the whole
operation is exactly one dilated, padded, strided *depthwise* convolution, which XLA
maps directly onto the TPU convolution units — no custom autograd is needed because
JAX differentiates `lax.conv_general_dilated` exactly (the reference needed a
hand-written double-backward; we get it for free).

Semantics (matching the reference's `upfirdn2d_native`, upfirdn2d.py:150):
  1. zero-stuff the input by `up` along H and W (up-1 zeros after each sample),
  2. pad with (pad0 before, pad1 after) on both axes (negative pads crop),
  3. convolve with the (mathematically convolved, i.e. flipped-correlated) 2D FIR
     kernel,
  4. subsample by `down` starting at index 0.

Layout: NHWC. The FIR kernel is a 2D (kh, kw) float array shared by all channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    Mirrors reference models/stylegan2/model.py:23 (`make_kernel`): outer-product of a
    1D tap vector with itself, normalized to sum 1.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k)


@functools.partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Apply upsample→FIR→downsample to an NHWC tensor.

    Args:
      x: (N, H, W, C) input.
      kernel: (kh, kw) FIR kernel (same for every channel).
      up / down: integer resampling factors (applied to both H and W).
      pad: (pad0, pad1) applied to both H and W, may be negative.

    Returns:
      (N, H', W', C) with H' = (H*up + pad0 + pad1 - kh) // down + 1.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # lhs_dilation inserts (up-1) zeros BETWEEN samples; the reference zero-stuffs
    # AFTER each sample (including the last), so fold the missing trailing zeros
    # into the trailing pad.
    trail = up - 1
    # Flip the kernel: torch's native path flips then cross-correlates (= true
    # convolution); lax.conv_general_dilated cross-correlates, so pre-flip here.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise conv: kernel HWIO = (kh, kw, 1, C), feature_group_count = C.
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))

    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down, down),
        padding=((pad0, pad1 + trail), (pad0, pad1 + trail)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def _resample_pads(kernel_size: int, factor: int, up: bool) -> tuple[int, int]:
    p = kernel_size - factor
    if up:
        return (p + 1) // 2 + factor - 1, p // 2
    return (p + 1) // 2, p // 2


def upsample_2x(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR-interpolated upsample (reference model.py:34 `Upsample`)."""
    pad = _resample_pads(kernel.shape[0], factor, up=True)
    return upfirdn2d(x, kernel * (factor**2), up=factor, down=1, pad=pad)


def downsample_2x(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Anti-aliased downsample (reference model.py:56 `Downsample`)."""
    pad = _resample_pads(kernel.shape[0], factor, up=False)
    return upfirdn2d(x, kernel, up=1, down=factor, pad=pad)


def blur(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    pad: tuple[int, int],
    upsample_factor: int = 1,
) -> jnp.ndarray:
    """Plain FIR blur with explicit pads (reference model.py:78 `Blur`)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
