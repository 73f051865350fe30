"""VGG16 feature extractor (frozen) + masked Gram style loss.

Ports of the reference's criteria/style_loss.py (VGG16_Activations :83,
StyleLoss :104: VGG16 activations at selected torchvision indices, optional
image masking, Gram-matrix L2). lambda=0 by default in training
(train_options.py:58) but part of the loss inventory.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear

# torchvision vgg16.features layout: (layer_index, kind, channels)
_VGG16_LAYOUT = []
_cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M"]
_i = 0
for _c in _cfg:
    if _c == "M":
        _VGG16_LAYOUT.append((_i, "pool", None))
        _i += 1
    else:
        _VGG16_LAYOUT.append((_i, "conv", _c))
        _i += 1
        _VGG16_LAYOUT.append((_i, "relu", None))
        _i += 1

VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """Run vgg16.features, returning activations at `taps` (torchvision
    indices)."""

    taps: tuple = (21,)

    @nn.compact
    def __call__(self, x):
        out = []
        max_tap = max(self.taps)
        for idx, kind, ch in _VGG16_LAYOUT:
            if kind == "conv":
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = max_pool2d(x, 2, 2)
            if idx in self.taps:
                out.append(x)
            if idx >= max_tap:
                break
        return out


def gram_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) normalized Gram."""
    b, h, w, c = feats.shape
    f = feats.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


class StyleGramLoss:
    """Masked Gram-matrix style loss (reference style_loss.py:104-254)."""

    def __init__(self, params: dict, taps: tuple = (21,),
                 normalize: bool = False):
        self.model = VGG16Features(taps=taps)
        self.params = params
        self.normalize = normalize

        def fwd(p, x, x_hat, mask_x, mask_x_hat):
            x = resize_bilinear(x, (256, 256))
            x_hat = resize_bilinear(x_hat, (256, 256))
            if self.normalize:
                x = ((x + 1) / 2 - VGG_MEAN) / VGG_STD
                x_hat = ((x_hat + 1) / 2 - VGG_MEAN) / VGG_STD
            if mask_x is not None:
                x = x * resize_bilinear(mask_x, (256, 256))
                x_hat = x_hat * resize_bilinear(mask_x_hat, (256, 256))
            fx = self.model.apply({"params": p}, x)
            fxh = self.model.apply({"params": p}, x_hat)
            loss = 0.0
            for a, b in zip(fx, fxh):
                loss = loss + jnp.mean(jnp.square(gram_matrix(a) - gram_matrix(b)))
            return loss

        from e4s2024_tpu.utils.packing import jit_with_packed_params

        self._fwd = jit_with_packed_params(fwd, params)

    def __call__(self, x, x_hat, mask_x=None, mask_x_hat=None):
        return self._fwd(x, x_hat, mask_x, mask_x_hat)
