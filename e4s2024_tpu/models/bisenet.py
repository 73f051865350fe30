"""BiSeNet face parser (19-class) in Flax — the mask extractor for all pipelines.

Port of the reference's swap_face_fine/face_parsing/model.py:234 `BiSeNet`
(ResNet-18 context path, attention refinement, feature fusion; the spatial path
is replaced by the res8 feature, model.py:252-254) and the `FaceParser`
preprocessing wrapper (face_parsing_demo.py:127-177): bicubic anti-aliased
downsample to 512, ImageNet normalization, argmax over the main head.

Frozen/inference-only (FrozenBatchNorm).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear, resize_bilinear_align_corners, resize_nearest

_SEG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_SEG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ConvBNReLU(nn.Module):
    features: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.ks, self.ks), strides=self.stride,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv1")(x)
        res = nn.relu(FrozenBatchNorm(name="bn1")(res))
        res = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name="conv2")(res)
        res = FrozenBatchNorm(name="bn2")(res)
        if x.shape[-1] != self.features or self.stride != 1:
            sc = nn.Conv(self.features, (1, 1), strides=self.stride,
                         use_bias=False, name="down_conv")(x)
            sc = FrozenBatchNorm(name="down_bn")(sc)
        else:
            sc = x
        return nn.relu(sc + res)


class Resnet18(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        for i in range(2):
            x = BasicBlock(64, name=f"layer1_{i}")(x)
        f8 = x
        for i in range(2):
            f8 = BasicBlock(128, stride=2 if i == 0 else 1, name=f"layer2_{i}")(f8)
        f16 = f8
        for i in range(2):
            f16 = BasicBlock(256, stride=2 if i == 0 else 1, name=f"layer3_{i}")(f16)
        f32 = f16
        for i in range(2):
            f32 = BasicBlock(512, stride=2 if i == 0 else 1, name=f"layer4_{i}")(f32)
        return f8, f16, f32


class AttentionRefinement(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.features, name="conv")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_atten")(atten)
        atten = FrozenBatchNorm(name="bn_atten")(atten)
        return feat * nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, fsp, fcp):
        feat = ConvBNReLU(self.features, ks=1, padding=0, name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1))
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features // 4, (1, 1), use_bias=False, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.features, (1, 1), use_bias=False, name="conv2")(atten)
        atten = nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = 19
    # aux heads (out16/out32) exist for training-time deep supervision; the
    # inference path only needs the main head
    aux_heads: bool = True

    @nn.compact
    def __call__(self, x, aux: bool | None = None, upsample: bool = True):
        """upsample=False returns the main logits at 1/8 resolution (NHWC):
        callers that argmax can then do the bilinear upsample in PLANAR
        layout — 19 channels in NHWC pad to the TPU's 128 lanes, so the
        full-res NHWC logits tensor streams ~6.7x its logical bytes."""
        aux = self.aux_heads if aux is None else aux
        h, w = x.shape[1], x.shape[2]
        f8, f16, f32 = Resnet18(name="resnet")(x)

        avg = jnp.mean(f32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, (f32.shape[0], f32.shape[1], f32.shape[2], 128))

        f32_arm = AttentionRefinement(128, name="arm32")(f32) + avg_up
        f32_up = resize_nearest(f32_arm, (f16.shape[1], f16.shape[2]))
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up)

        f16_arm = AttentionRefinement(128, name="arm16")(f16) + f32_up
        f16_up = resize_nearest(f16_arm, (f8.shape[1], f8.shape[2]))
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up)

        fuse = FeatureFusion(256, name="ffm")(f8, f16_up)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(fuse)

        up = lambda o: resize_bilinear_align_corners(o, (h, w))
        if not aux and not self.is_initializing():
            return (up(out) if upsample else out), None, None
        out16 = BiSeNetOutput(64, self.n_classes, name="conv_out16")(f16_up)
        out32 = BiSeNetOutput(64, self.n_classes, name="conv_out32")(f32_up)
        return up(out), up(out16), up(out32)


def _bicubic_taps(factor: int, a: float = -0.5) -> np.ndarray:
    size = factor * 4
    xs = (np.arange(size) - np.floor(size / 2) + 0.5) / factor
    ax = np.abs(xs)
    k = np.where(
        ax <= 1.0, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2.0, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("factor",))
def bicubic_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Anti-aliased bicubic downsample (reference face_parsing_demo.py:15-88
    `BicubicDownSample`): separable 4f-tap filter, stride f, reflect padding."""
    if factor == 1:
        return x
    taps = _bicubic_taps(factor)
    size = len(taps)
    pad = size - factor
    p0, p1 = pad // 2, pad - pad // 2
    c = x.shape[-1]
    kh = jnp.asarray(taps).reshape(size, 1, 1, 1)
    kw = jnp.asarray(taps).reshape(1, size, 1, 1)
    xp = jnp.pad(x, ((0, 0), (p0, p1), (0, 0), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        xp, jnp.tile(kh, (1, 1, 1, c)), (factor, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    xp = jnp.pad(x, ((0, 0), (0, 0), (p0, p1), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        xp, jnp.tile(kw, (1, 1, 1, c)), (1, factor), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def face_parsing(params: dict, img01: jnp.ndarray) -> jnp.ndarray:
    """Parse faces: (B, H, W, 3) in [0, 1] -> (B, 512, 512) int 19-class map.

    Mirrors FaceParser.forward (face_parsing_demo.py:162-171): bicubic
    downsample (inputs >= 512) or bilinear upsample (< 512) to 512, normalize,
    BiSeNet main head, argmax.
    """
    h = img01.shape[1]
    if h >= 512:
        x = jnp.clip(bicubic_downsample(img01, h // 512), 0.0, 1.0)
    else:
        x = resize_bilinear(img01, (512, 512))
    x = (x - _SEG_MEAN) / _SEG_STD
    logits, _, _ = BiSeNet().apply({"params": params}, x, aux=False)
    return jnp.argmax(logits, axis=-1)
