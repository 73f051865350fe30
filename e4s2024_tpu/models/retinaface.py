"""RetinaFace face detector in Flax — in-framework face detection.

TPU-native port of the detector the reference uses inside GPEN
(swap_face_fine/gpen/face_detect/facemodels/retinaface.py:48 `RetinaFace`,
net.py:40-136 `SSH`/`FPN`/`MobileNetV1`): a MobileNetV1-0.25 or ResNet-50
backbone, a 3-level FPN, SSH context modules and per-level 1x1 heads emitting
2 anchors/cell of (class, box, 5-pt landmark) regressions
(data/config.py `cfg_mnet`/`cfg_re50`).

Differences from the reference (deliberate, TPU-first):
  - NHWC layouts throughout; the three per-level heads share one reshape —
    channel order after the 1x1 conv already matches torch's
    permute(0,2,3,1).view(B,-1,k) row order (h, w, anchor).
  - The trained checkpoints are BGR (+ mean (104,117,123)); `convert_retinaface`
    folds the BGR flip into the stem conv so this net takes RGB directly.
  - Anchor generation / box decode are jit-static jnp (priors are a
    trace-time constant); NMS is a fixed-size on-device top-k pass
    (pipelines/detect.py) instead of the reference's numpy py_cpu_nms.

Inference-only (FrozenBatchNorm, eval semantics).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_nearest


# anchor/variance settings (reference data/config.py cfg_mnet / cfg_re50)
CFG_MNET = {
    "backbone": "mobilenet",
    "min_sizes": ((16, 32), (64, 128), (256, 512)),
    "steps": (8, 16, 32),
    "variance": (0.1, 0.2),
    "in_channel": 32,
    "out_channel": 64,
}
CFG_RE50 = {
    "backbone": "resnet50",
    "min_sizes": ((16, 32), (64, 128), (256, 512)),
    "steps": (8, 16, 32),
    "variance": (0.1, 0.2),
    "in_channel": 256,
    "out_channel": 256,
}


class ConvBNLeaky(nn.Module):
    """conv_bn / conv_bn1X1 / conv_bn_no_relu (reference net.py:9-27)."""

    features: int
    ks: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.ks - 1) // 2
        x = nn.Conv(self.features, (self.ks, self.ks), strides=self.stride,
                    padding=pad, use_bias=False,
                    feature_group_count=self.groups, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=self.leaky)
        return x


class ConvDW(nn.Module):
    """Depthwise-separable block (reference net.py:29-38 `conv_dw`)."""

    features: int
    stride: int = 1
    leaky: float = 0.1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ConvBNLeaky(c, 3, self.stride, self.leaky, groups=c, name="dw")(x)
        return ConvBNLeaky(self.features, 1, 1, self.leaky, name="pw")(x)


class MobileNetV1Backbone(nn.Module):
    """MobileNetV1 x0.25 3-stage backbone (reference net.py:102-124)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBNLeaky(8, 3, 2, 0.1, name="stem")(x)
        for i, (f, s) in enumerate(((16, 1), (32, 2), (32, 1), (64, 2),
                                    (64, 1))):
            x = ConvDW(f, s, name=f"s1_{i}")(x)
        f1 = x  # stride 8, 64ch
        x = ConvDW(128, 2, name="s2_0")(x)
        for i in range(5):
            x = ConvDW(128, 1, name=f"s2_{i + 1}")(x)
        f2 = x  # stride 16, 128ch
        x = ConvDW(256, 2, name="s3_0")(x)
        x = ConvDW(256, 1, name="s3_1")(x)
        return f1, f2, x  # stride 32, 256ch


class ResNet50Backbone(nn.Module):
    """torchvision resnet50 trunk returning layer2/3/4 features
    (reference retinaface.py:68-72 with cfg_re50 return_layers). Reuses the
    Hopenet Bottleneck (same torchvision block, same param names)."""

    @nn.compact
    def __call__(self, x):
        from e4s2024_tpu.models.hopenet import Bottleneck

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        feats = []
        for li, (planes, blocks) in enumerate(
                ((64, 3), (128, 4), (256, 6), (512, 3))):
            for b in range(blocks):
                x = Bottleneck(planes,
                               stride=2 if (li > 0 and b == 0) else 1,
                               downsample=b == 0,
                               name=f"layer{li + 1}_{b}")(x)
            feats.append(x)
        return feats[1], feats[2], feats[3]  # 512, 1024, 2048 ch


class SSH(nn.Module):
    """Context module (reference net.py:40-66)."""

    features: int

    @nn.compact
    def __call__(self, x):
        leaky = 0.1 if self.features <= 64 else 0.0
        c3 = ConvBNLeaky(self.features // 2, 3, relu=False, name="conv3x3")(x)
        c5_1 = ConvBNLeaky(self.features // 4, 3, leaky=leaky,
                           name="conv5x5_1")(x)
        c5 = ConvBNLeaky(self.features // 4, 3, relu=False,
                         name="conv5x5_2")(c5_1)
        c7_2 = ConvBNLeaky(self.features // 4, 3, leaky=leaky,
                           name="conv7x7_2")(c5_1)
        c7 = ConvBNLeaky(self.features // 4, 3, relu=False,
                         name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """3-level FPN with nearest upsampling (reference net.py:68-98)."""

    features: int

    @nn.compact
    def __call__(self, f1, f2, f3):
        leaky = 0.1 if self.features <= 64 else 0.0
        o1 = ConvBNLeaky(self.features, 1, leaky=leaky, name="output1")(f1)
        o2 = ConvBNLeaky(self.features, 1, leaky=leaky, name="output2")(f2)
        o3 = ConvBNLeaky(self.features, 1, leaky=leaky, name="output3")(f3)
        o2 = o2 + resize_nearest(o3, o2.shape[1:3])
        o2 = ConvBNLeaky(self.features, 3, leaky=leaky, name="merge2")(o2)
        o1 = o1 + resize_nearest(o2, o1.shape[1:3])
        o1 = ConvBNLeaky(self.features, 3, leaky=leaky, name="merge1")(o1)
        return o1, o2, o3


class RetinaFace(nn.Module):
    """Full detector. Input: (B, H, W, 3) RGB float in [0, 255] (the converter
    folds the checkpoint's BGR+mean preprocessing into the stem). Output:
    (loc (B, N, 4), conf (B, N, 2) softmaxed, landms (B, N, 10)) with N =
    sum over levels of 2 * ceil(H/step) * ceil(W/step), rows ordered
    (level, h, w, anchor) to match the reference prior ordering."""

    backbone: str = "mobilenet"  # or "resnet50"
    out_channel: int = 64
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        if self.backbone == "mobilenet":
            f1, f2, f3 = MobileNetV1Backbone(name="body")(x)
        elif self.backbone == "resnet50":
            f1, f2, f3 = ResNet50Backbone(name="body")(x)
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        feats = FPN(self.out_channel, name="fpn")(f1, f2, f3)
        feats = [SSH(self.out_channel, name=f"ssh{i + 1}")(f)
                 for i, f in enumerate(feats)]
        locs, confs, lms = [], [], []
        b = x.shape[0]
        a = self.num_anchors
        for i, f in enumerate(feats):
            # NHWC 1x1 head output reshapes directly to torch's
            # permute(0,2,3,1).view(B,-1,k) row order
            locs.append(nn.Conv(a * 4, (1, 1), name=f"bbox_head{i}")(f)
                        .reshape(b, -1, 4))
            confs.append(nn.Conv(a * 2, (1, 1), name=f"class_head{i}")(f)
                         .reshape(b, -1, 2))
            lms.append(nn.Conv(a * 10, (1, 1), name=f"landmark_head{i}")(f)
                       .reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        lm = jnp.concatenate(lms, axis=1)
        return loc, conf, lm


def generate_priors(image_hw: tuple[int, int],
                    cfg: dict = CFG_MNET) -> np.ndarray:
    """(N, 4) anchors in normalized (cx, cy, w, h) — trace-time constant
    (reference layers/functions/prior_box.py:7-35 `PriorBox`)."""
    h, w = image_hw
    anchors = []
    for min_sizes, step in zip(cfg["min_sizes"], cfg["steps"]):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        ji, ii = np.meshgrid(np.arange(fw), np.arange(fh))  # (fh, fw)
        cx = (ji + 0.5) * step / w
        cy = (ii + 0.5) * step / h
        for_level = []
        for ms in min_sizes:
            skx, sky = ms / w, ms / h
            for_level.append(np.stack(
                [cx, cy, np.full_like(cx, skx, dtype=np.float64),
                 np.full_like(cy, sky, dtype=np.float64)], axis=-1))
        # (fh, fw, A, 4) -> rows ordered (h, w, anchor)
        lvl = np.stack(for_level, axis=2).reshape(-1, 4)
        anchors.append(lvl)
    return np.concatenate(anchors, axis=0).astype(np.float32)


def decode_boxes(loc: jnp.ndarray, priors: jnp.ndarray,
                 variance=(0.1, 0.2)) -> jnp.ndarray:
    """(..., N, 4) regressions -> (x1, y1, x2, y2) normalized boxes
    (reference utils/box_utils.py:209-227 `decode`)."""
    cxy = priors[..., :2] + loc[..., :2] * variance[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variance[1])
    tl = cxy - wh / 2.0
    return jnp.concatenate([tl, tl + wh], axis=-1)


def decode_landms(pre: jnp.ndarray, priors: jnp.ndarray,
                  variance=(0.1, 0.2)) -> jnp.ndarray:
    """(..., N, 10) regressions -> (..., N, 5, 2) normalized landmark points
    (reference utils/box_utils.py:229-247 `decode_landm`)."""
    p = pre.reshape(*pre.shape[:-1], 5, 2)
    return priors[..., None, :2] + p * variance[0] * priors[..., None, 2:]
