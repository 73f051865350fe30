"""Modulated convolution (StyleGAN2) and its regional, mask-conditioned variant.

TPU-native re-design of the reference's ModulatedConv2d + the per-component loop
in StyledConv/ToRGB (reference models/stylegan2/model.py:184-320 and :382-423).

Key identity (exact, not an approximation): modulation scales *input channels*
and demodulation scales *output channels*, both spatially constant, so

    conv(x, scale*W*s_b) * d_b  ==  conv(x * s_b, scale*W) * d_b

i.e. a per-sample-weight grouped conv (what the reference and stock StyleGAN2
implementations do, model.py:283-318) is equivalent to input-scale -> ONE
shared-weight conv -> output-scale. This matters doubly on TPU:

  - the conv keeps its natural (B, H, W, C) layout, so GSPMD can shard the
    batch axis cleanly (per-sample grouped weights fold batch into channels and
    break partitioning);
  - the demod coefficients collapse to a (Cin x Cout) matmul:
    d[b,o] = rsqrt(sum_i s[b,i]^2 * Wsq[i,o] + eps),
    Wsq[i,o] = scale^2 * sum_k W[k,i,o]^2 — no (B, Cout, Cin, kh, kw) weight
    tensor is ever materialized.

The regional variant folds (batch x component) into the *batch* axis of the
same shared-weight conv:

- ``exact`` mode: all B*K component convs in one batched conv, mask-contracted
  by einsum. Numerically identical to the reference loop.
- ``fast`` mode: per-pixel modulation on the input and per-pixel demodulation
  on the output — 1/K of the FLOPs; identical to ``exact`` for 1x1 kernels
  (ToRGB), differs only at region-boundary pixels for 3x3.

Layout: NHWC activations, HWIO weights. `weight` is the raw (unscaled)
parameter; the equalized-LR scale 1/sqrt(Cin*kh*kw) is applied inside.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s2024_tpu.ops.upfirdn import blur as fir_blur

_EPS = 1e-8


def _he_scale(weight: jnp.ndarray) -> float:
    kh, kw, cin, _ = weight.shape
    # python float (weak-typed): a np.float64 scalar would promote bf16
    # weights to float32
    return float(1.0 / np.sqrt(cin * kh * kw))


def _demod_coeff(weight: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """d[..., o] = rsqrt(sum_{i,k} (scale * W[k,i,o] * s[..., i])^2 + eps).

    style: (..., Cin) -> returns (..., Cout)."""
    scale = _he_scale(weight)
    wsq = (scale * weight) ** 2
    wsq = jnp.sum(wsq, axis=(0, 1))  # (Cin, Cout)
    return lax.rsqrt(jnp.square(style) @ wsq + _EPS)


def _conv(x, w, *, stride=1, padding=0, lhs_dilation=1):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _mod_conv_core(x, weight, style, demodulate, up, down, blur_kernel):
    """Shared-weight modulated conv on a plain batch.

    x: (B, H, W, Cin); style: (B, Cin). Returns (B, H', W', Cout)."""
    kh = weight.shape[0]
    w = _he_scale(weight) * weight
    xm = x * style[:, None, None, :]

    if up:
        # conv_transpose(stride 2, pad 0) == conv with 2x lhs_dilation and a
        # spatially flipped kernel, padding kh-1 (then FIR blur).
        out = _conv(xm, jnp.flip(w, (0, 1)), padding=kh - 1, lhs_dilation=2)
        if demodulate:
            out = out * _demod_coeff(weight, style)[:, None, None, :]
        p = blur_kernel.shape[0] - 2 - (kh - 1)
        return fir_blur(out, blur_kernel, pad=((p + 1) // 2 + 1, p // 2 + 1),
                        upsample_factor=2)
    if down:
        p = blur_kernel.shape[0] - 2 + (kh - 1)
        xm = fir_blur(xm, blur_kernel, pad=((p + 1) // 2, p // 2))
        out = _conv(xm, w, stride=2)
        if demodulate:
            out = out * _demod_coeff(weight, style)[:, None, None, :]
        return out

    out = _conv(xm, w, padding=kh // 2)
    if demodulate:
        out = out * _demod_coeff(weight, style)[:, None, None, :]
    return out


def modulated_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    style: jnp.ndarray,
    *,
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    blur_kernel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """StyleGAN2 modulated conv with one style per sample.

    Args:
      x: (B, H, W, Cin).
      weight: (kh, kw, Cin, Cout) raw parameter.
      style: (B, Cin) modulation scales (output of the modulation EqualLinear).
      up / down: 2x transposed-conv upsample / strided downsample with FIR blur
        exactly as reference model.py:287-310.

    Returns: (B, H', W', Cout).
    """
    return _mod_conv_core(x, weight, style, demodulate, up, down, blur_kernel)


def _nearest_resize_mask(segmap: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of a (B, H, W, K) one-hot map, torch
    F.interpolate 'nearest' semantics (index = floor(i * in / out)).
    Integer ratios (every generator layer) lower to strided slices /
    broadcasts — no gathers (see ops.resize.resize_nearest)."""
    from e4s2024_tpu.ops.resize import resize_nearest

    return resize_nearest(segmap, hw)


def regional_modulated_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    styles: jnp.ndarray,
    segmap: jnp.ndarray,
    *,
    demodulate: bool = True,
    up: bool = False,
    blur_kernel: jnp.ndarray | None = None,
    mode: str = "exact",
) -> jnp.ndarray:
    """Mask-conditioned modulated conv: per-region styles selected by a one-hot map.

    Equivalent to the reference's per-component loop (model.py:394-398):
      out = sum_k segmap_k * modulated_conv(x, styles[:, k])

    Args:
      x: (B, H, W, Cin).
      weight: (kh, kw, Cin, Cout).
      styles: (B, K, Cin) per-component modulation scales.
      segmap: (B, Hm, Wm, K) one-hot segmentation, resized (nearest) internally
        to the conv's output resolution.
      mode: "exact" (B*K batched conv, reference-identical) or "fast"
        (per-pixel modulation, ~K x fewer FLOPs, exact for 1x1 kernels).

    Returns: (B, Hout, Wout, Cout).
    """
    if mode not in ("exact", "fast"):
        raise ValueError(f"regional mode must be 'exact' or 'fast', got {mode!r}")
    b, h, w_, cin = x.shape
    k_sz = weight.shape[0]
    cout = weight.shape[3]
    num_comp = styles.shape[1]
    h_out, w_out = (2 * h, 2 * w_) if up else (h, w_)
    seg_out = _nearest_resize_mask(segmap, (h_out, w_out)).astype(x.dtype)

    if mode == "fast":
        seg_in = _nearest_resize_mask(segmap, (h, w_)).astype(x.dtype)
        s_pix = jnp.einsum("bhwk,bkc->bhwc", seg_in, styles)
        w = _he_scale(weight) * weight
        if up:
            out = _conv(x * s_pix, jnp.flip(w, (0, 1)), padding=k_sz - 1,
                        lhs_dilation=2)
            p = blur_kernel.shape[0] - 2 - (k_sz - 1)
            out = fir_blur(out, blur_kernel,
                           pad=((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2)
        else:
            out = _conv(x * s_pix, w, padding=k_sz // 2)
        if demodulate:
            demod = _demod_coeff(weight, styles)       # (B, K, Cout)
            d_pix = jnp.einsum("bhwk,bkc->bhwc", seg_out, demod)
            out = out * d_pix
        return out

    # exact: fold (B, K) into the BATCH axis of one shared-weight conv — the
    # batch stays a batch, so dp-sharding partitions cleanly under GSPMD.
    xk = (x[:, None] * styles[:, :, None, None, :]).reshape(
        b * num_comp, h, w_, cin)
    ones = jnp.ones((b * num_comp, cin), x.dtype)
    out = _mod_conv_core(xk, weight, ones, False, up, False, blur_kernel)
    if demodulate:
        demod = _demod_coeff(weight, styles).reshape(b * num_comp, cout)
        out = out * demod[:, None, None, :]
    out = out.reshape(b, num_comp, h_out, w_out, cout)
    return jnp.einsum("bkhwc,bhwk->bhwc", out, seg_out)
