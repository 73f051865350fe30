"""Mask-guided pSp-style encoder (RGI encoder) in Flax.

Re-design of the reference's FSEncoder_PSP (reference
models/encoders/psp_encoders.py:319) and its IR-SE building blocks
(models/encoders/helpers.py:56-144):

- IR-SE-50-like body with InstanceNorm ("bottleneck_IR_SE_Ours"), feature taps
  after units 6 / 20 / 23,
- per-region style vectors by masked average pooling at the 3 tap scales,
  vectorized as one einsum per scale (the reference loops over batch x class,
  psp_encoders.py:366-373),
- 1280-d per-region style vector = concat(256, 512, 512).

Layout: NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s2024_tpu.ops.resize import resize_nearest


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=False): normalize each (sample, channel) over H,W."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class SEModule(nn.Module):
    """Squeeze-and-excitation (reference helpers.py:56)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(s)
        return x * nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """IR-SE residual unit, InstanceNorm flavor (reference helpers.py:122
    `bottleneck_IR_SE_Ours`)."""

    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if cin == self.depth:
            # MaxPool2d(kernel=1, stride=s) == strided subsampling
            shortcut = x[:, :: self.stride, :: self.stride]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=self.stride, use_bias=False,
                name="shortcut_conv",
            )(x)
            shortcut = instance_norm(shortcut)
        res = instance_norm(x)
        res = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, name="conv1")(res)
        res = PReLU(name="prelu")(res)
        res = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(res)
        res = instance_norm(res)
        res = SEModule(name="se")(res)
        return res + shortcut


# (depth, stride) per unit for the RGI encoder body (reference
# psp_encoders.py:323-328): 3x128 + 4x256 + 14x512 + 3x512, stride 2 at each
# group start. `num_units` exists only for cheap CI configs.
def rgi_body_plan(num_units: tuple = (3, 4, 14, 3)) -> list[tuple[int, int]]:
    plan: list[tuple[int, int]] = []
    for depth, num in zip((128, 256, 512, 512), num_units):
        plan.append((depth, 2))
        plan.extend((depth, 1) for _ in range(num - 1))
    return plan


def masked_average_pool(feats: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
    """Per-region average of feature vectors.

    feats: (B, H, W, C); segmap: (B, Hm, Wm, K) one-hot (resized to H,W nearest).
    Returns (B, K, C); regions with zero area get a zero vector (matching
    reference psp_encoders.py:368-373).
    """
    seg = resize_nearest(segmap, (feats.shape[1], feats.shape[2]))
    seg = (seg > 0).astype(feats.dtype)
    summed = jnp.einsum("bhwc,bhwk->bkc", feats, seg)
    area = jnp.sum(seg, axis=(1, 2))[..., None]  # (B, K, 1)
    return jnp.where(area > 0, summed / jnp.maximum(area, 1.0), 0.0)


class FSEncoderPSP(nn.Module):
    """Mask-guided style encoder: per-region 1280-d style vectors.

    Input: 256x256 image (NHWC, [-1,1]) + one-hot segmap (any resolution).
    Returns (style_vectors (B,K,1280), structure_feats (B,16,16,512) zeros —
    the reference's structure branch is disabled, psp_encoders.py:392).

    `num_units` shrinks the body for cheap CI configs; the reference
    architecture is the default. Taps default to the last unit of groups
    2/3/4 (units 6/20/23 at full depth).
    """

    num_units: tuple = (3, 4, 14, 3)
    taps: Sequence[int] | None = None

    @nn.compact
    def __call__(self, x, segmap):
        n = self.num_units
        taps = self.taps or (n[0] + n[1] - 1, n[0] + n[1] + n[2] - 1,
                             sum(n) - 1)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        x = instance_norm(x)
        x = PReLU(name="input_prelu")(x)

        tapped = []
        for i, (depth, stride) in enumerate(rgi_body_plan(n)):
            x = BottleneckIRSE(depth, stride, name=f"body_{i}")(x)
            if i in taps:
                tapped.append(x)

        codes = [masked_average_pool(t, segmap) for t in tapped]
        style_vectors = jnp.concatenate(codes, axis=-1)  # (B, K, 256+512+512)
        structure_feats = jnp.zeros_like(x)
        return style_vectors, structure_feats


class FSEncoderSEAN(nn.Module):
    """SEAN-style per-region encoder — the alternative `fsencoder_type`
    (reference psp_encoders.py:238-316, selected by opts.fsencoder_type,
    networks.py:57-63; default is psp).

    256^2 input: reflect-pad conv to ngf, 2 stride-2 downs, 1 transposed-conv
    upsample (128^2 feats), tanh style head -> masked avg pool (B, K, 512),
    plus a 3-conv structure branch to 16^2 x 512.
    """

    ngf: int = 32
    output_nc: int = 512

    @nn.compact
    def __call__(self, x, segmap):
        def refl_conv(v, feats, k, name):
            pad = k // 2
            v = jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode="reflect")
            return nn.Conv(feats, (k, k), padding="VALID", name=name)(v)

        def lrelu(v):
            return jnp.where(v >= 0, v, 0.2 * v)

        h = lrelu(instance_norm(refl_conv(x, self.ngf, 3, "head")))
        for i in range(2):  # in_size=256 -> n_downsampling=2
            mult = 2**i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        name=f"down_{i}")(h)
            h = lrelu(instance_norm(h))
        # upsample back to 128^2 (psp_encoders.py:267-272); padding (1, 2)
        # replicates torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
        # exactly (lo = k-1-p, hi = k-1-p+op) with the converter-flipped
        # kernel
        h = nn.ConvTranspose(self.ngf * 8, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), name="up")(h)
        h = lrelu(instance_norm(h))

        codes = jnp.tanh(refl_conv(h, self.output_nc, 3, "style_conv"))
        style_vectors = masked_average_pool(codes, segmap)

        s = h
        for i in range(3):
            s = nn.Conv(512, (3, 3), strides=2, padding=1,
                        name=f"structure_{i}")(s)
            s = lrelu(instance_norm(s))
        return style_vectors, s
