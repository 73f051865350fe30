"""Hopenet head-pose estimator (frozen) in Flax.

Port of the reference's Hopenet (reference head_pose_esit/hopenet.py:7:
ResNet-50 backbone + 3 binned-angle heads; 66 bins, angle = E[softmax] * 3 - 99)
used to gate reenactment on the source/target pose gap
(Face_swap_with_two_imgs.py:117,688-700).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            sc = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                         use_bias=False, name="down_conv")(x)
            sc = FrozenBatchNorm(name="down_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Hopenet(nn.Module):
    num_bins: int = 66
    layers: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        """x: (B, 224, 224, 3) ImageNet-normalized. Returns (yaw, pitch, roll)
        bin logits, each (B, num_bins)."""
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        planes = (64, 128, 256, 512)
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                down = bi == 0
                x = Bottleneck(p, stride, down, name=f"layer{li + 1}_{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        yaw = nn.Dense(self.num_bins, name="fc_yaw")(x)
        pitch = nn.Dense(self.num_bins, name="fc_pitch")(x)
        roll = nn.Dense(self.num_bins, name="fc_roll")(x)
        return yaw, pitch, roll


class PoseEstimator:
    """Euler angles from an aligned face crop + pose-gap gate."""

    def __init__(self, params: dict):
        self.model = Hopenet()
        self.params = params
        idx = jnp.arange(66, dtype=jnp.float32)

        def fwd(p, img):
            y, pi, r = self.model.apply({"params": p}, img)

            def expect(logits):
                return jnp.sum(jax.nn.softmax(logits, -1) * idx, -1) * 3.0 - 99.0

            return expect(y), expect(pi), expect(r)

        from e4s2024_tpu.utils.packing import jit_with_packed_params

        self._fwd = jit_with_packed_params(fwd, params)

    def estimate(self, img255: jnp.ndarray):
        """img255: (B, H, W, 3) [0,255] -> (yaw, pitch, roll) in degrees."""
        x = jnp.asarray(img255, jnp.float32) / 255.0
        if x.shape[1] != 224:
            x = resize_bilinear(x, (224, 224))
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        return self._fwd(x)

    def pose_gap(self, img_a255, img_b255) -> float:
        """Max |angle difference| across yaw/pitch/roll — the reenactment gate
        (reference Face_swap_with_two_imgs.py:688-700)."""
        ya, pa, ra = self.estimate(img_a255)
        yb, pb, rb = self.estimate(img_b255)
        return float(jnp.max(jnp.stack([jnp.abs(ya - yb), jnp.abs(pa - pb),
                                        jnp.abs(ra - rb)])))


def convert_hopenet(sd) -> dict:
    """Map a torch Hopenet (ResNet-50) state_dict onto Hopenet params."""
    from e4s2024_tpu.convert.torch_loader import _bn, _conv, _linear, strip_module_prefix

    sd = strip_module_prefix(sd)
    params = {"conv1": _conv(sd, "conv1"), "bn1": _bn(sd, "bn1")}
    for li, n in enumerate((3, 4, 6, 3)):
        for bi in range(n):
            t = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv(sd, f"{t}.conv1"), "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": _conv(sd, f"{t}.conv2"), "bn2": _bn(sd, f"{t}.bn2"),
                "conv3": _conv(sd, f"{t}.conv3"), "bn3": _bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, f"{t}.downsample.0")
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f"layer{li + 1}_{bi}"] = blk
    for head in ("fc_yaw", "fc_pitch", "fc_roll"):
        params[head] = _linear(sd, head)
    return params
