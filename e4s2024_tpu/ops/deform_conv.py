"""Modulated deformable convolution (DCNv2) — TPU-native formulation.

Parity target: the reference's `swap_face_fine/archs/arch_util.py:209`
`DCNv2Pack` (offsets/masks predicted from a *separate* feature map, per
"Delving Deep into Deformable Alignment in Video Super-Resolution") on top of
basicsr's `modulated_deform_conv` CUDA op
(`swap_face_fine/ops/dcn/deform_conv.py:149`). Note the reference defines but
never instantiates DCNv2Pack in its shipped pipelines; it is provided here for
inventory completeness and for EDVR/BasicVSR-style alignment heads.

TPU design: a deformable conv is a *gather* followed by a *matmul* —
  1. build the (dy, dx)-perturbed sampling grid for every kernel tap,
  2. bilinearly gather all taps at once (vectorised `take_along_axis` on the
     flattened spatial axis; zero padding outside the frame),
  3. modulate each tap by its sigmoid mask,
  4. contract taps x input channels against the weight in ONE einsum — this is
     the im2col formulation, so the FLOPs land on the MXU as a single
     (B*Ho*Wo, K*Cin) x (K*Cin, Cout) matmul instead of the reference's
     hand-written CUDA loop.

Offset layout: we use the structured layout `offset[..., g, k, (dy, dx)]` and
`mask[..., g, k]` rather than torch's flat interleaved channel layout; a torch
checkpoint's `conv_offset` output channels map onto ours by a fixed
permutation (torch channel 2*(g*K+k)+{0,1} -> ours (g, k, {0,1}), mask channel
g*K+k -> (g, k)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(x: jnp.ndarray, pos_y: jnp.ndarray,
                     pos_x: jnp.ndarray) -> jnp.ndarray:
    """Sample x (B, H, W, C) at float positions (B, ...) with zero padding.

    Returns (B, ..., C). Positions fully outside [-1, H] x [-1, W] contribute 0
    (matching the CUDA op's `dmcn_im2col_bilinear` zero-border behavior).
    """
    b, h, w, c = x.shape
    batch_shape = pos_y.shape
    pos_y = pos_y.reshape(b, -1)
    pos_x = pos_x.reshape(b, -1)

    y0 = jnp.floor(pos_y)
    x0 = jnp.floor(pos_x)
    wy1 = pos_y - y0
    wx1 = pos_x - x0

    xf = x.reshape(b, h * w, c)
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yi = y0 + dy
            xi = x0 + dx
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
            gathered = jnp.take_along_axis(
                xf, idx.astype(jnp.int32)[..., None], axis=1)
            out = out + gathered * (wy * wx * valid)[..., None]
    return out.reshape(*batch_shape, c)


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2), NHWC.

    Args:
      x: (B, H, W, Cin) input.
      offset: (B, Ho, Wo, G, K, 2) per-tap (dy, dx) in pixels, G deformable
        groups, K = kh * kw taps in row-major kernel order.
      mask: (B, Ho, Wo, G, K) modulation scalars (already sigmoided).
      weight: (kh, kw, Cin, Cout).
      bias: optional (Cout,).

    Returns (B, Ho, Wo, Cout) where Ho/Wo follow standard conv arithmetic.
    """
    b, h, w, cin = x.shape
    kh, kw, wc, cout = weight.shape
    if wc != cin:
        raise ValueError(f"weight Cin {wc} != input Cin {cin}")
    _, ho, wo, g, k, _ = offset.shape
    if k != kh * kw:
        raise ValueError(f"offset taps {k} != kh*kw {kh * kw}")
    if cin % g:
        raise ValueError(f"Cin {cin} not divisible by deformable_groups {g}")
    cg = cin // g

    # base sampling grid: out position * stride - pad + dilation * tap
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh) * dilation,
                          jnp.arange(kw) * dilation, indexing="ij")
    base_y = oy[:, None, None] + ky.reshape(-1)  # (Ho, 1, K)
    base_x = ox[None, :, None] + kx.reshape(-1)  # (1, Wo, K)

    pos_y = base_y[None, :, :, None, :] + offset[..., 0]  # (B, Ho, Wo, G, K)
    pos_x = base_x[None, :, :, None, :] + offset[..., 1]

    # fold deformable groups into batch so each group samples its own slice
    xg = x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(
        b * g, h, w, cg)
    py = pos_y.transpose(0, 3, 1, 2, 4).reshape(b * g, ho, wo, k)
    px = pos_x.transpose(0, 3, 1, 2, 4).reshape(b * g, ho, wo, k)
    sampled = _bilinear_gather(xg, py, px)  # (B*G, Ho, Wo, K, Cg)
    sampled = sampled.reshape(b, g, ho, wo, k, cg).transpose(0, 2, 3, 4, 1, 5)
    sampled = sampled * mask.transpose(0, 1, 2, 4, 3)[..., None]

    # one im2col matmul: (B,Ho,Wo,K,G,Cg) x (K,G,Cg,Cout)
    wk = weight.reshape(kh * kw, g, cg, cout)
    out = jnp.einsum("bhwkgc,kgco->bhwo", sampled, wk,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


class DCNv2Pack(nn.Module):
    """Deformable-alignment conv: offsets/masks from a second feature map.

    Mirrors reference arch_util.py:209-236 `DCNv2Pack.forward`: a plain conv
    over `feat` predicts 3*G*K channels, chunked into (dy, dx, mask-logits);
    mask = sigmoid. `conv_offset` is zero-initialised (basicsr
    `init_offset`), so at init the layer behaves as 0.5 * standard conv.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
        ks, g = self.kernel_size, self.deformable_groups
        k = ks * ks
        raw = nn.Conv(3 * g * k, (ks, ks), strides=self.stride,
                      padding=self.padding,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="conv_offset")(feat)
        b, ho, wo, _ = raw.shape
        o1, o2, m = jnp.split(raw, 3, axis=-1)
        offset = jnp.stack([o1.reshape(b, ho, wo, g, k),
                            o2.reshape(b, ho, wo, g, k)], axis=-1)
        mask = jax.nn.sigmoid(m.reshape(b, ho, wo, g, k))

        cin = x.shape[-1]
        fan = cin * k

        def _uniform_pm(key, shape, dtype=jnp.float32):
            bound = 1 / np.sqrt(fan)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weight = self.param("weight", _uniform_pm,
                            (ks, ks, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=self.stride,
            padding=self.padding, dilation=self.dilation)
