"""LPIPS (v0.1, AlexNet) perceptual metric in Flax.

Port of the reference's criteria/lpips (lpips.py:8, networks.py:77): torchvision
AlexNet features tapped after each ReLU, channel-unit-normalized, squared diffs
weighted by learned 1x1 "lin" heads, spatially averaged and summed.

Frozen, inference-only. Weights come from torchvision alexnet + the LPIPS v0.1
lin weights via the converter. Input: NHWC in [-1, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e4s2024_tpu.ops.pool import max_pool2d

# LPIPS input standardization constants (reference networks.py:41-44).
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-wise unit normalization (reference lpips/utils.py:6)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-16)
    return x / (norm + eps)


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features with taps after ReLUs 2/5/8/10/12."""

    @nn.compact
    def __call__(self, x):
        x = (x - _SHIFT) / _SCALE
        feats = []
        # conv indices/names follow torchvision's alexnet.features numbering
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        x = nn.relu(x)
        feats.append(_unit_normalize(x))          # layer 2
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(192, (5, 5), padding=2, name="conv3")(x)
        x = nn.relu(x)
        feats.append(_unit_normalize(x))          # layer 5
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(384, (3, 3), padding=1, name="conv6")(x)
        x = nn.relu(x)
        feats.append(_unit_normalize(x))          # layer 8
        x = nn.Conv(256, (3, 3), padding=1, name="conv8")(x)
        x = nn.relu(x)
        feats.append(_unit_normalize(x))          # layer 10
        x = nn.Conv(256, (3, 3), padding=1, name="conv10")(x)
        x = nn.relu(x)
        feats.append(_unit_normalize(x))          # layer 12
        return feats


class LPIPS(nn.Module):
    """Full LPIPS head: sum over scales of lin-weighted mean squared feature diff."""

    n_channels: tuple[int, ...] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, x, y):
        net = AlexNetFeatures(name="net")
        fx = net(x)
        fy = net(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(a - b)
            w = self.param(f"lin_{i}", nn.initializers.ones,
                           (self.n_channels[i],))
            # 1x1 conv with (C,) weight, no bias == channel-weighted sum
            per_pixel = jnp.einsum("bhwc,c->bhw", diff, w)
            total = total + jnp.mean(per_pixel, axis=(1, 2))  # (B,)
        return jnp.sum(total) / x.shape[0]
