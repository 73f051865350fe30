"""Pooling ops with exact torch semantics (adaptive average pool, max pool).

The reference's loss stack leans on `AdaptiveAvgPool2d` for staged resizing
(criteria/id_loss.py:12-15, face_parsing_loss.py:26); parity requires torch's
exact bin arithmetic: bin i covers [floor(i*H/out), ceil((i+1)*H/out)).
Implemented as two small dense bin-weight matmuls — MXU-friendly and jit-static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _bin_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) averaging matrix with torch AdaptiveAvgPool bin edges."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


@functools.partial(jax.jit, static_argnames=("out_hw",))
def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d for NHWC input."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_bin_matrix(oh, h))
    mw = jnp.asarray(_bin_matrix(ow, w))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bhwc->bhpc", mw, x)


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jnp.ndarray:
    """torch MaxPool2d(kernel, stride) for NHWC input (floor mode)."""
    stride = stride or window
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: jnp.ndarray, window: int = 2,
               stride: int | None = None) -> jnp.ndarray:
    """torch F.avg_pool2d(kernel, stride) for NHWC input (no padding)."""
    stride = stride or window
    s = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return s / (window * window)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
