"""Compositing: Laplacian-pyramid blending, soft erosion, gaussian blur, edges.

TPU-native replacements for the reference's CPU OpenCV/PIL compositing stages:
- multi-band blending (reference swap_face_fine/multi_band_blending.py:6-75,
  cv2.pyrDown/pyrUp pyramids) as jit-able FIR pyramids,
- SoftErosion mask softening (reference utils/paste_back_tricks.py:17-44),
- gaussian/sharpen/Sobel-edge helpers (paste_back_tricks.py:150-171),
- facial-mask extraction from 12-class maps (paste_back_tricks.py:173-198).

All NHWC float32; images in any range (blending is linear).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s2024_tpu.ops.resize import resize_bilinear_align_corners

# cv2 pyramid kernel: outer([1,4,6,4,1]/16)
_PYR_TAPS = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _sep_conv_reflect(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable symmetric FIR with REFLECT_101 border (cv2 default)."""
    k = len(taps)
    pad = k // 2
    c = x.shape[-1]
    kh = jnp.asarray(taps, x.dtype).reshape(k, 1, 1, 1)
    kw = jnp.asarray(taps, x.dtype).reshape(1, k, 1, 1)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        xp, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        xp, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown: gaussian blur then 2x subsample."""
    return _sep_conv_reflect(x, _PYR_TAPS)[:, ::2, ::2, :]


def pyr_up(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrUp: zero-stuff 2x then gaussian blur with 4x-gain kernel."""
    b, h, w, c = x.shape
    up = jnp.zeros((b, 2 * h, 2 * w, c), x.dtype).at[:, ::2, ::2, :].set(x)
    return _sep_conv_reflect(up, _PYR_TAPS * 2.0)


# ---- planar (NCHW) pyramid path -------------------------------------------
# TPU HBM layout tiles the LAST TWO dims to (8, 128); an NHWC image with
# C in {1..7} therefore pads the channel dim up to 128 lanes — a 512x512x1
# f32 mask occupies (and streams) 128x its logical size through every conv.
# The planar path keeps (H, W) minor, where 512x512 tiles perfectly, and
# expresses the separable 5-tap blur as shifted multiply-adds (no conv op,
# so XLA fuses the whole blur into one elementwise loop).


def _blur_planar(t: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable symmetric FIR with REFLECT_101 border on (..., H, W)."""
    k = len(taps)
    p = k // 2
    h, w = t.shape[-2], t.shape[-1]
    pad = [(0, 0)] * (t.ndim - 2)
    tp = jnp.pad(t, pad + [(p, p), (0, 0)], mode="reflect")
    t = sum(float(taps[i]) * lax.slice_in_dim(tp, i, i + h, axis=-2)
            for i in range(k))
    tp = jnp.pad(t, pad + [(0, 0), (p, p)], mode="reflect")
    return sum(float(taps[i]) * lax.slice_in_dim(tp, i, i + w, axis=-1)
               for i in range(k))


def _down2_axis(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """One axis of cv2.pyrDown as a DECIMATING filter: only the kept (even)
    output samples are computed (strided slices), instead of blurring the
    full signal and discarding 3/4 of it."""
    k = len(taps)
    p = k // 2
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (p, p)
    xp = jnp.pad(x, pad, mode="reflect")
    return sum(
        float(taps[i]) * lax.slice_in_dim(xp, i, i + n - 1, stride=2,
                                          axis=axis)
        for i in range(k))


def pyr_down_planar(t: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown on (..., H, W) planar tensors (decimating, fused)."""
    return _down2_axis(_down2_axis(t, _PYR_TAPS, -2), _PYR_TAPS, -1)


def _up2_axis(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """One axis of cv2.pyrUp as a POLYPHASE filter — no zero-stuffed scatter
    (scatters are slow on TPU). Blurring the zero-stuffed signal z (z[2k] =
    x[k]) with the 5-tap kernel t splits into two small FIRs on x:
      out[2y]   = t0*x[y-1] + t2*x[y] + t4*x[y+1]
      out[2y+1] = t1*x[y]   + t3*x[y+1]
    Border handling matches REFLECT_101 on z: x[-1] -> x[1] (reflect) but
    x[n] -> x[n-1] (edge), because z's reflected sample z[2n] is z[2n-2]."""
    n = x.shape[axis]
    left = lax.slice_in_dim(x, 1, 2, axis=axis)
    right = lax.slice_in_dim(x, n - 1, n, axis=axis)
    xp = jnp.concatenate([left, x, right], axis=axis)  # x[-1..n]

    def sl(lo):
        return lax.slice_in_dim(xp, lo, lo + n, axis=axis)

    t0, t1, t2, t3, t4 = (float(v) for v in taps)
    even = t0 * sl(0) + t2 * sl(1) + t4 * sl(2)
    odd = t1 * sl(1) + t3 * sl(2)
    ax = axis if axis >= 0 else x.ndim + axis
    out = jnp.stack([even, odd], axis=ax + 1)
    return out.reshape(x.shape[:ax] + (2 * n,) + x.shape[ax + 1:])


def pyr_up_planar(t: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrUp on (..., H, W) planar tensors (polyphase, scatter-free)."""
    taps = _PYR_TAPS * 2.0
    return _up2_axis(_up2_axis(t, taps, -2), taps, -1)


@functools.partial(jax.jit, static_argnames=("num_levels",))
def laplacian_pyramid_blend(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, num_levels: int = 10
) -> jnp.ndarray:
    """Blend a (where mask=1) over b via per-band masking (reference
    multi_band_blending.py:6-47). Inputs NHWC; mask (B, H, W, 1) in [0, 1];
    spatial size must be divisible by 2**(num_levels-1)."""
    # a/b/mask are packed along a planar channel axis and the whole blend
    # runs in (B, C, H, W) layout — see the planar-path note below: NHWC
    # masks/RGB pad the 128-lane channel dim, planar keeps (H, W) minor.
    out = laplacian_pyramid_blend_planar(
        a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2),
        mask.transpose(0, 3, 1, 2), num_levels=num_levels)
    return out.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("num_levels",))
def laplacian_pyramid_blend_planar(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, num_levels: int = 10
) -> jnp.ndarray:
    """laplacian_pyramid_blend on (B, C, H, W) planar tensors,
    mask (B, 1, H, W). num_levels is clamped so the coarsest level is
    >= 2 px (the reference's 10 levels at 1024^2 bottom out at 2 px;
    smaller images take proportionally fewer levels)."""
    import math as _math

    num_levels = min(num_levels,
                     int(_math.log2(min(a.shape[-2], a.shape[-1]))))
    c = a.shape[1]
    g = [jnp.concatenate([a, b, mask], axis=1)]
    for _ in range(num_levels - 1):
        g.append(pyr_down_planar(g[-1]))

    def split(t):
        return t[:, :c], t[:, c:2 * c], t[:, 2 * c:]

    # band-limited (Laplacian) levels, coarse-to-fine, blended per level
    ga, gb, gm = split(g[num_levels - 1])
    out = ga * gm + gb * (1.0 - gm)
    for i in range(num_levels - 1, 0, -1):
        up = pyr_up_planar(g[i])
        ua, ub, _ = split(up)
        pa, pb, pm = split(g[i - 1])
        ls = (pa - ua) * pm + (pb - ub) * (1.0 - pm)
        out = pyr_up_planar(out) + ls
    return out


@functools.partial(jax.jit, static_argnames=("kernel_size", "iterations"))
def soft_erosion(
    x: jnp.ndarray,
    kernel_size: int = 15,
    threshold: float = 0.6,
    iterations: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MegaFS-style soft mask erosion (reference paste_back_tricks.py:17-44).

    x: (B, H, W, C) float mask(s) in [0,1] — channels are eroded
    independently (depthwise), so several masks can be packed into one call.
    Returns (soft mask, hard bool mask); normalization is per (batch, channel).
    """
    r = kernel_size // 2
    c = x.shape[-1]
    yy, xx = np.meshgrid(np.arange(kernel_size, dtype=np.float32),
                         np.arange(kernel_size, dtype=np.float32), indexing="ij")
    dist = np.sqrt((xx - r) ** 2 + (yy - r) ** 2)
    kern = dist.max() - dist
    kern /= kern.sum()
    kern = jnp.tile(jnp.asarray(kern)[:, :, None, None], (1, 1, 1, c))

    def conv(v):
        return lax.conv_general_dilated(
            v, kern, (1, 1), ((r, r), (r, r)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    for _ in range(iterations - 1):
        x = jnp.minimum(x, conv(x))
    x = conv(x)
    hard = x >= threshold
    below_max = jnp.max(jnp.where(hard, 0.0, x), axis=(1, 2), keepdims=True)
    out = jnp.where(hard, 1.0, x / jnp.maximum(below_max, 1e-8))
    return out, hard


def _soft_erosion_kernel(kernel_size: int) -> np.ndarray:
    r = kernel_size // 2
    yy, xx = np.meshgrid(np.arange(kernel_size, dtype=np.float32),
                         np.arange(kernel_size, dtype=np.float32),
                         indexing="ij")
    dist = np.sqrt((xx - r) ** 2 + (yy - r) ** 2)
    kern = dist.max() - dist
    return kern / kern.sum()


@functools.lru_cache(maxsize=None)
def _cone_svd_terms(kernel_size: int) -> tuple:
    """SVD of the radial cone kernel into separable rank-1 (col, row) taps.

    The cone is not separable, but its SVD truncated at machine precision is
    exact; each rank becomes two fused 1-D shift-add passes on (H, W)-minor
    tensors — a single-channel dense 15x15 conv costs ~2.7 ms at 512^2 on
    TPU (1-channel convs can't feed the MXU), the separable form ~0.2 ms."""
    k2 = _soft_erosion_kernel(kernel_size).astype(np.float64)
    u, s, vt = np.linalg.svd(k2)
    keep = s > s[0] * 1e-7
    return tuple(
        (tuple((np.sqrt(s[i]) * u[:, i]).astype(np.float64)),
         tuple((np.sqrt(s[i]) * vt[i]).astype(np.float64)))
        for i in np.where(keep)[0])


def _fir_axis_zero(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """1-D FIR with ZERO padding along `axis` (matches conv 'same' padding)."""
    k = len(taps)
    p = k // 2
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (p, p)
    xp = jnp.pad(x, pad)
    return sum(float(taps[i]) * lax.slice_in_dim(xp, i, i + n, axis=axis)
               for i in range(k))


@functools.partial(jax.jit, static_argnames=("kernel_size", "iterations"))
def soft_erosion_planar(
    t: jnp.ndarray,
    kernel_size: int = 15,
    threshold: float = 0.6,
    iterations: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """soft_erosion on (B, C, H, W) planar masks (channels independent).

    Same math as soft_erosion (normalization per batch/channel); keeps
    (H, W) minor so 512x512 masks tile the TPU HBM layout exactly instead of
    padding a tiny channel dim to 128 lanes. The cone filter runs as its
    (machine-precision-exact) SVD-separable decomposition — see
    _cone_svd_terms."""
    b, c, h, w = t.shape
    x = t

    def conv(v):
        out = None
        for col, row in _cone_svd_terms(kernel_size):
            part = _fir_axis_zero(_fir_axis_zero(v, col, -2), row, -1)
            out = part if out is None else out + part
        return out

    for _ in range(iterations - 1):
        x = jnp.minimum(x, conv(x))
    x = conv(x)
    hard = x >= threshold
    below_max = jnp.max(jnp.where(hard, 0.0, x), axis=(2, 3), keepdims=True)
    out = jnp.where(hard, 1.0, x / jnp.maximum(below_max, 1e-8))
    return out, hard


def gaussian_blur(x: jnp.ndarray, sigma: float, ksize: int | None = None) -> jnp.ndarray:
    """cv2-style gaussian blur (NHWC)."""
    if ksize is None:
        ksize = int(2 * round(3 * sigma) + 1)
    half = ksize // 2
    t = np.exp(-0.5 * (np.arange(-half, half + 1) / sigma) ** 2)
    t /= t.sum()
    return _sep_conv_reflect(x, t.astype(np.float32))


def sharpen(x: jnp.ndarray, sigma: float = 10.0) -> jnp.ndarray:
    """Unsharp mask: 1.5*x - 0.5*blur (reference paste_back_tricks.py:150)."""
    return 1.5 * x - 0.5 * gaussian_blur(x, sigma)


@jax.jit
def sobel_edge(img: jnp.ndarray) -> jnp.ndarray:
    """|Sobel_x| + |Sobel_y| grayscale edge magnitude of an RGB image in [0,255]
    (reference paste_back_tricks.py:157-171, before its blur/gain shaping)."""
    gray_w = jnp.asarray([0.299, 0.587, 0.114])
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    c = img.shape[-1]

    def conv(v, k):
        kk = jnp.tile(k[:, :, None, None], (1, 1, 1, v.shape[-1]))
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return lax.conv_general_dilated(
            vp, kk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=v.shape[-1])

    ex = jnp.abs(conv(img, kx))
    ey = jnp.abs(conv(img, ky))
    edge = jnp.clip(ex, 0, 255) + jnp.clip(ey, 0, 255)
    return jnp.einsum("bhwc,c->bhw", edge, gray_w)[..., None]


def facial_mask_from_seg12(
    seg: jnp.ndarray,
    target_hw: tuple[int, int] | None = None,
    classes: tuple[int, ...] = (1, 2, 3, 5, 6, 8, 9),
) -> jnp.ndarray:
    """Union of facial classes -> float mask (reference paste_back_tricks.py:173).

    seg: (B, H, W) int map. Returns (B, H', W', 1) float in [0,1] (bilinear,
    align_corners=True, matching the reference's interpolate)."""
    mask = jnp.zeros_like(seg, dtype=jnp.float32)
    for c in classes:
        mask = mask + (seg == c).astype(jnp.float32)
    mask = mask[..., None]
    if target_hw is not None:
        mask = resize_bilinear_align_corners(mask, target_hw)
    return mask


def blend_with_mask(bottom: jnp.ndarray, up: jnp.ndarray,
                    up_mask: jnp.ndarray, up_ratio: float = 1.0) -> jnp.ndarray:
    """bottom*(1-m) + up*m with m = up_mask*up_ratio, NaNs in the mask zeroed
    (reference paste_back_tricks.py:131-148)."""
    m = jnp.nan_to_num(up_mask) * up_ratio
    return bottom * (1.0 - m) + up * m
