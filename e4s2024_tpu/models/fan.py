"""FAN 68-point facial landmark network in Flax — in-framework landmarks.

The reference obtains 68-pt landmarks from dlib or the `face_alignment`
package's FAN (reference utils/alignment.py:41-64 `get_landmark`, the `fa`
branch). This is a TPU-native implementation of that FAN (2DFAN4: 4 stacked
depth-4 hourglasses over 256 features, 68 heatmaps at 64x64), matching the
public face-alignment architecture so its released `2DFAN4` checkpoints
convert directly (convert/torch_loader.py::convert_fan).

Input: (B, 256, 256, 3) RGB in [0, 1]. Output: list of (B, 64, 64, 68)
heatmaps, one per hourglass module (use the last).

`heatmaps_to_landmarks` decodes heatmaps to sub-pixel coordinates on device
(argmax + quarter-pixel neighbor offset — the face-alignment
`get_preds_fromhm` rule) so batched video landmarking never leaves the chip.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.ops.pool import avg_pool2d
from e4s2024_tpu.ops.resize import resize_nearest


class ConvBlock(nn.Module):
    """Pre-activation 3-branch residual block (face-alignment ConvBlock):
    three bn-relu-conv3x3 stages at C/2, C/4, C/4, concatenated; 1x1
    projection shortcut when the channel count changes."""

    features: int

    @nn.compact
    def __call__(self, x):
        inp = x
        o1 = nn.relu(FrozenBatchNorm(name="bn1")(x))
        o1 = nn.Conv(self.features // 2, (3, 3), padding=1, use_bias=False,
                     name="conv1")(o1)
        o2 = nn.relu(FrozenBatchNorm(name="bn2")(o1))
        o2 = nn.Conv(self.features // 4, (3, 3), padding=1, use_bias=False,
                     name="conv2")(o2)
        o3 = nn.relu(FrozenBatchNorm(name="bn3")(o2))
        o3 = nn.Conv(self.features // 4, (3, 3), padding=1, use_bias=False,
                     name="conv3")(o3)
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if inp.shape[-1] != self.features:
            inp = nn.relu(FrozenBatchNorm(name="down_bn")(inp))
            inp = nn.Conv(self.features, (1, 1), use_bias=False,
                          name="down_conv")(inp)
        return out + inp


class HourGlass(nn.Module):
    """Recursive hourglass (face-alignment HourGlass, depth levels)."""

    depth: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x):
        def level(n, inp):
            up1 = ConvBlock(self.features, name=f"b1_{n}")(inp)
            low = avg_pool2d(inp, 2, 2)
            low = ConvBlock(self.features, name=f"b2_{n}")(low)
            if n > 1:
                low = level(n - 1, low)
            else:
                low = ConvBlock(self.features, name=f"b2_plus_{n}")(low)
            low = ConvBlock(self.features, name=f"b3_{n}")(low)
            up2 = resize_nearest(low, up1.shape[1:3])
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    """Stacked-hourglass landmark net (face-alignment FAN / 2DFAN4)."""

    num_modules: int = 4
    features: int = 256
    num_landmarks: int = 68
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        f = self.features
        x = nn.Conv(f // 4, (7, 7), strides=2, padding=3, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = ConvBlock(f // 2, name="conv2")(x)
        x = avg_pool2d(x, 2, 2)
        x = ConvBlock(f // 2, name="conv3")(x)
        x = ConvBlock(f, name="conv4")(x)

        outputs = []
        previous = x
        for i in range(self.num_modules):
            hg = HourGlass(self.depth, f, name=f"m{i}")(previous)
            ll = ConvBlock(f, name=f"top_m_{i}")(hg)
            ll = nn.Conv(f, (1, 1), name=f"conv_last{i}")(ll)
            ll = nn.relu(FrozenBatchNorm(name=f"bn_end{i}")(ll))
            tmp_out = nn.Conv(self.num_landmarks, (1, 1), name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = nn.Conv(f, (1, 1), name=f"bl{i}")(ll)
                tmp = nn.Conv(f, (1, 1), name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp
        return outputs


def heatmaps_to_landmarks(hm: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, K) heatmaps -> (B, K, 2) sub-pixel (x, y) in heatmap pixels
    (0-based), using face-alignment's argmax + 0.25 * sign(neighbor-diff)
    refinement (`get_preds_fromhm`)."""
    b, h, w, k = hm.shape
    flat = hm.transpose(0, 3, 1, 2).reshape(b, k, h * w)
    idx = jnp.argmax(flat, axis=-1)  # (B, K)
    px = idx % w
    py = idx // w
    # neighbor differences at the peak (clamped indexing at the borders —
    # face_alignment only refines interior peaks; border peaks get 0 offset)
    def at(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None],
                                   axis=-1)[..., 0]

    interior = ((px > 0) & (px < w - 1) & (py > 0) & (py < h - 1))
    dx = jnp.sign(at(0, 1) - at(0, -1)) * 0.25 * interior
    dy = jnp.sign(at(1, 0) - at(-1, 0)) * 0.25 * interior
    return jnp.stack([px + dx, py + dy], axis=-1)
