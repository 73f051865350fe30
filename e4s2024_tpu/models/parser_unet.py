"""Face-parsing U-Net (frozen, for the face-parsing loss) in Flax.

Port of the reference's criteria/face_parsing/unet.py:6 (feature_scale=4 ->
filters [16, 32, 64, 128, 256], 19 classes, deconv upsampling) with
conv-BN-ReLU double blocks (model_utils.py:177 `unetConv2`). Inference-only:
FrozenBatchNorm on running stats.

`extract_feats` returns the 5 encoder features L2-normalized (unet.py:72-93),
which is all the FaceParsingLoss needs; `__call__` runs the full segmentation
head (used for the 19-class parsing `inference`, face_parsing_loss.py:39).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e4s2024_tpu.models.arcface import FrozenBatchNorm, l2_normalize
from e4s2024_tpu.ops.pool import max_pool2d


class UnetConv2(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x)
        x = FrozenBatchNorm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(x)
        x = FrozenBatchNorm(name="bn2")(x)
        return nn.relu(x)


class UnetUp(nn.Module):
    features: int

    @nn.compact
    def __call__(self, skip, x):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2), name="up")(x)
        off = x.shape[1] - skip.shape[1]
        if off != 0:
            skip = jnp.pad(skip, ((0, 0), (off // 2, off // 2),
                                  (off // 2, off // 2), (0, 0)))
        return UnetConv2(self.features, name="conv")(
            jnp.concatenate([skip, x], axis=-1)
        )


class ParsingUNet(nn.Module):
    n_classes: int = 19
    feature_scale: int = 4

    def setup(self):
        f = [x // self.feature_scale for x in (64, 128, 256, 512, 1024)]
        self.conv1 = UnetConv2(f[0], name="conv1")
        self.conv2 = UnetConv2(f[1], name="conv2")
        self.conv3 = UnetConv2(f[2], name="conv3")
        self.conv4 = UnetConv2(f[3], name="conv4")
        self.center = UnetConv2(f[4], name="center")
        self.up_concat4 = UnetUp(f[3], name="up_concat4")
        self.up_concat3 = UnetUp(f[2], name="up_concat3")
        self.up_concat2 = UnetUp(f[1], name="up_concat2")
        self.up_concat1 = UnetUp(f[0], name="up_concat1")
        self.final = nn.Conv(self.n_classes, (1, 1), name="final")

    def _encode(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(max_pool2d(c1, 2))
        c3 = self.conv3(max_pool2d(c2, 2))
        c4 = self.conv4(max_pool2d(c3, 2))
        center = self.center(max_pool2d(c4, 2))
        return c1, c2, c3, c4, center

    def __call__(self, x):
        c1, c2, c3, c4, center = self._encode(x)
        up4 = self.up_concat4(c4, center)
        up3 = self.up_concat3(c3, up4)
        up2 = self.up_concat2(c2, up3)
        up1 = self.up_concat1(c1, up2)
        return self.final(up1)

    def extract_feats(self, x):
        b = x.shape[0]
        feats = self._encode(x)
        return [l2_normalize(t.reshape(b, -1)) for t in feats]
