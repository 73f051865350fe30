"""Image resizing with PyTorch-`F.interpolate`-matching semantics.

The reference pipeline resizes constantly (masks nearest, images bilinear, FPN
lateral adds bilinear+align_corners). To reach near-pixel checkpoint parity these
must match torch exactly, so they are implemented as explicit gathers/lerps rather
than `jax.image.resize`. All functions take/return NHWC and are jit-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size",))
def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src index = floor(dst * in / out).

    Integer-ratio resizes (every use in this framework) lower to strided
    slices / broadcasts instead of gathers: floor(i*h/th) == i*(h//th) when
    th | h, and == i // (th//h) when h | th — gathers on NHWC tensors with
    tiny channel counts stream the 128-lane-padded layout."""
    b, h, w, c = x.shape
    th, tw = size
    if (h, w) == (th, tw):
        return x
    if h % th == 0 and w % tw == 0:
        return x[:, :: h // th, :: w // tw]
    if th % h == 0 and tw % w == 0:
        ry, rx = th // h, tw // w
        out = jnp.broadcast_to(x[:, :, None, :, None, :],
                               (b, h, ry, w, rx, c))
        return out.reshape(b, th, tw, c)
    ih = (jnp.arange(th) * h) // th
    iw = (jnp.arange(tw) * w) // tw
    return x[:, ih][:, :, iw]


def _linear_weights(out_size: int, in_size: int, align_corners: bool):
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,))
        else:
            src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    t = (src - i0).astype(jnp.float32)
    return i0, i1, t


@functools.lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int,
                   align_corners: bool) -> np.ndarray:
    """(out, in) bilinear interpolation matrix — exactly 2 non-zeros per row.

    Bilinear resize as two small matmuls is the TPU-native form: the
    jnp.take/gather row-selection alternative streams poorly on TPU (the
    _parse12 program lost ~2 ms per crop to the gathered 8x logits
    upsample), while the matmul rides the MXU."""
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,))
        else:
            src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = (src - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - t)
    np.add.at(m, (np.arange(out_size), i1), t)
    return m


@functools.partial(jax.jit, static_argnames=("size", "align_corners"))
def _resize_bilinear_impl(x, size, align_corners):
    _, h, w, _ = x.shape
    th, tw = size
    if (h, w) == (th, tw):
        return x
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mh = jnp.asarray(_interp_matrix(th, h, align_corners))
    mw = jnp.asarray(_interp_matrix(tw, w, align_corners))
    out = jnp.einsum("oh,bhwc->bowc", mh, xf)
    out = jnp.einsum("pw,bowc->bopc", mw, out)
    return out.astype(dt)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False)."""
    return _resize_bilinear_impl(x, size, False)


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True)."""
    return _resize_bilinear_impl(x, size, True)


@functools.partial(jax.jit, static_argnames=("size", "align_corners"))
def resize_bilinear_planar(t: jnp.ndarray, size: tuple[int, int],
                           align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize on (..., H, W) planar tensors (torch semantics).

    Same math as resize_bilinear; planar layout keeps (H, W) minor, which
    tiles the TPU HBM layout exactly for mask-sized tensors."""
    h, w = t.shape[-2], t.shape[-1]
    th, tw = size
    if (h, w) == (th, tw):
        return t
    dt = t.dtype
    xf = t.astype(jnp.float32)
    mh = jnp.asarray(_interp_matrix(th, h, align_corners))
    mw = jnp.asarray(_interp_matrix(tw, w, align_corners))
    out = jnp.einsum("oh,...hw->...ow", mh, xf)
    out = jnp.einsum("pw,...ow->...op", mw, out)
    return out.astype(dt)
