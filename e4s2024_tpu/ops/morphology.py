"""Differentiable grayscale morphology on NHWC tensors.

TPU-native replacement for the reference's kornia-ported unfold/conv morphology
(reference utils/morphology.py:23-110): flat structuring elements map directly
onto `lax.reduce_window` max/min — one fused windowed reduction instead of an
unfold + max over a (B, C, H, W, k, k) tensor.

Semantics match kornia 'geodesic' borders (out-of-image pixels ignored) for
flat (all-ones) kernels, which is the only structuring element the reference
pipelines use (e.g. swap_face_mask.py:382, video_swap_ft_coach.py:64-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _window_reduce(x: jnp.ndarray, size: int, op, init) -> jnp.ndarray:
    pad = size // 2
    return lax.reduce_window(
        x, init, op,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, size - 1 - pad), (pad, size - 1 - pad), (0, 0)),
    )


@functools.partial(jax.jit, static_argnames=("size",))
def dilation(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Max over a size x size flat structuring element. x: (B, H, W, C)."""
    return _window_reduce(x, size, lax.max, -jnp.inf).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def erosion(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Min over a size x size flat structuring element."""
    return _window_reduce(x, size, lax.min, jnp.inf).astype(x.dtype)


def opening(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return dilation(erosion(x, size), size)


def closing(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return erosion(dilation(x, size), size)


def _window_reduce_planar(t: jnp.ndarray, size: int, op, init) -> jnp.ndarray:
    pad = size // 2
    return lax.reduce_window(
        t, init, op,
        window_dimensions=(1, 1, size, size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, size - 1 - pad),
                 (pad, size - 1 - pad)),
    )


@functools.partial(jax.jit, static_argnames=("size",))
def dilation_planar(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """dilation on (B, C, H, W) planar masks — (H, W) minor tiles the TPU
    HBM layout exactly (NHWC 1-channel masks pad C to 128 lanes)."""
    return _window_reduce_planar(t, size, lax.max, -jnp.inf).astype(t.dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def erosion_planar(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """erosion on (B, C, H, W) planar masks."""
    return _window_reduce_planar(t, size, lax.min, jnp.inf).astype(t.dtype)
