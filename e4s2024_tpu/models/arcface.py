"""ArcFace IR-SE-50 backbone (frozen, for the ID loss) in Flax.

Port of the reference's `Backbone` (reference models/encoders/model_irse.py:9)
with the BatchNorm-flavored IR-SE units (models/encoders/helpers.py:97). Used
inference-only: BatchNorm runs on stored running statistics (FrozenBatchNorm),
Dropout is identity.

Multi-scale feature taps after units 2/6/20/23 + final embedding, each
L2-normalized (model_irse.py:44-69).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e4s2024_tpu.models.encoders import PReLU, SEModule


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """torch-style l2_norm (reference helpers.py:15): x / ||x||."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / (norm + eps)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm using stored running stats (torch eval mode)."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        out = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out * scale + bias
        return out


def arcface_body_plan() -> list[tuple[int, int]]:
    """(depth, stride) per unit, num_layers=50 (reference helpers.py:30-36)."""
    plan: list[tuple[int, int]] = []
    for depth, num in ((64, 3), (128, 4), (256, 14), (512, 3)):
        plan.append((depth, 2))
        plan.extend((depth, 1) for _ in range(num - 1))
    return plan


class BottleneckIRSEBN(nn.Module):
    """IR-SE unit, BatchNorm flavor (reference helpers.py:97 `bottleneck_IR_SE`)."""

    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if cin == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride,
                               use_bias=False, name="shortcut_conv")(x)
            shortcut = FrozenBatchNorm(name="shortcut_bn")(shortcut)
        res = FrozenBatchNorm(name="bn0")(x)
        res = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, name="conv1")(res)
        res = PReLU(name="prelu")(res)
        res = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(res)
        res = FrozenBatchNorm(name="bn2")(res)
        res = SEModule(name="se")(res)
        return res + shortcut


class ArcFaceBackbone(nn.Module):
    """IR-SE-50 face recognition backbone, 112x112 input, 512-d embedding."""

    taps: tuple[int, ...] = (2, 6, 20, 23)

    @nn.compact
    def __call__(self, x, multi_scale: bool = False):
        b = x.shape[0]
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        x = FrozenBatchNorm(name="input_bn")(x)
        x = PReLU(name="input_prelu")(x)

        tapped = []
        for i, (depth, stride) in enumerate(arcface_body_plan()):
            x = BottleneckIRSEBN(depth, stride, name=f"body_{i}")(x)
            if multi_scale and i in self.taps:
                tapped.append(x.reshape(b, -1))

        x = FrozenBatchNorm(name="output_bn")(x)
        # NHWC -> flatten matching torch's NCHW flatten order (C, H, W)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        kernel = self.param("output_fc_kernel", nn.initializers.normal(0.01),
                            (x.shape[-1], 512))
        bias = self.param("output_fc_bias", nn.initializers.zeros, (512,))
        x = x @ kernel + bias
        x = FrozenBatchNorm1D(name="output_bn1d")(x)

        if multi_scale:
            return [l2_normalize(t) for t in tapped] + [l2_normalize(x)]
        return [l2_normalize(x)]


class FrozenBatchNorm1D(nn.Module):
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        out = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out * scale + bias
        return out
