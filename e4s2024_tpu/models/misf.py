"""MISF inpainting (Multi-level Interactive Siamese Filtering) in Flax.

Parity target: reference `swap_face_fine/MISF/src/networks.py:35`
`InpaintGenerator` + `swap_face_fine/MISF/kpn/network.py:83` `KPN` /
`KernelConv` (:170), driven by `swap_face_fine/MISF/inpainting.py:46`
`inpainting_face`. Used as an alternative face-region inpainter to GCFSR
(the reference ships no public MISF checkpoint — its paths point at an
internal cluster — so random-init/training-ready parity is the target).

Architecture: an encoder/resblock/decoder inpainting backbone whose features
are refreshed by *predictive filtering*: a KPN branch (blind-estimation UNet,
kernel_size=[3], kpn/config.py:73-81 defaults) predicts per-pixel 3x3 kernels
that are applied depthwise at the 64x64 feature level (256 ch) and again at
the full-res image level (3 ch).

TPU formulation of KernelConv: per-pixel filtering = 9 static shifted slices
of the padded map, one multiply, one sum — XLA fuses it into a single
elementwise kernel; no gather, no dynamic shapes.

Kernel-head note: torch broadcasts `num_kernels` predicted kernel sets to the
256 feature channels by nearest-resizing the *flattened* (num*9) channel axis
(network.py:158), which misaligns kernel taps unless num == 256. We keep the
clean semantics (each kernel set repeated per channel group); identical when
num_kernels == feature channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s2024_tpu.models.encoders import instance_norm
from e4s2024_tpu.ops.resize import resize_bilinear


def per_pixel_filter(x: jnp.ndarray, kernels: jnp.ndarray,
                     ksize: int = 3) -> jnp.ndarray:
    """Spatially-varying depthwise filter (reference KernelConv, network.py:216).

    x: (B, H, W, C); kernels: (B, H, W, C, ksize**2) per-pixel per-channel
    taps in row-major tap order. Returns (B, H, W, C).
    """
    p = ksize // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    shifts = [xp[:, i:i + h, j:j + w] for i in range(ksize)
              for j in range(ksize)]
    stack = jnp.stack(shifts, axis=-1)  # (B, H, W, C, K^2)
    return jnp.sum(stack * kernels, axis=-1)


class _Basic(nn.Module):
    """KPN `Basic` (kpn/network.py:35): three 3x3 conv+relu (attention off by
    default, kpn/config.py:78-79)."""

    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(self.features, (3, 3), padding=1,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class KPN(nn.Module):
    """Kernel-prediction UNet (kpn/network.py:83-168, default opts).

    Takes the 4-ch masked input and the generator's 128-ch stride-2 feature;
    returns (feature_kernels (B, H/4, W/4, feat_channels, 9),
             image_kernels   (B, H, W, 3, 9))."""

    num_kernels: int = 256
    feat_channels: int = 256

    @nn.compact
    def __call__(self, inp4, feat128):
        if self.feat_channels % self.num_kernels:
            raise ValueError("num_kernels must divide feat_channels")
        c1 = _Basic(64, name="conv1")(inp4)
        c2 = _Basic(128, name="conv2")(nn.avg_pool(c1, (2, 2), (2, 2)))
        c2 = jnp.concatenate([c2, feat128], axis=-1)
        c3 = _Basic(256, name="conv3")(nn.avg_pool(c2, (2, 2), (2, 2)))

        k = nn.Conv(self.num_kernels * 9, (1, 1), name="kernels")(c3)
        b, h4, w4, _ = k.shape
        k = k.reshape(b, h4, w4, self.num_kernels, 9)
        k = jnp.repeat(k, self.feat_channels // self.num_kernels, axis=3)

        c4 = _Basic(512, name="conv4")(c3)
        c7 = _Basic(256, name="conv7")(jnp.concatenate([c3, c4], axis=-1))
        up7 = resize_bilinear(c7, (c2.shape[1], c2.shape[2]))
        c8 = _Basic(128, name="conv8")(jnp.concatenate([c2, up7], axis=-1))
        up8 = resize_bilinear(c8, (c1.shape[1], c1.shape[2]))
        c9 = _Basic(64, name="conv9")(jnp.concatenate([c1, up8], axis=-1))
        ki = nn.Conv(3 * 9, (1, 1), name="core_img")(c9)
        ki = ki.reshape(b, ki.shape[1], ki.shape[2], 3, 9)
        return k, ki


class _ResnetBlockD2(nn.Module):
    """InpaintGenerator residual block (networks.py:210): dilated 3x3 +
    plain 3x3, reflect padding, InstanceNorm(affine=False)."""

    features: int
    dilation: int = 2

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        r = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)), mode="reflect")
        r = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_dilation=(d, d), name="conv1")(r)
        r = nn.relu(instance_norm(r))
        r = jnp.pad(r, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        r = nn.Conv(self.features, (3, 3), padding="VALID", name="conv2")(r)
        return x + instance_norm(r)


class MISFGenerator(nn.Module):
    """InpaintGenerator (networks.py:35-107): input (B, H, W, 4) =
    cat(masked image in [0,1], mask); output inpainted image in [0,1]."""

    residual_blocks: int = 8
    num_kernels: int = 256

    @nn.compact
    def __call__(self, x4):
        e0 = jnp.pad(x4, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        e0 = nn.Conv(64, (7, 7), padding="VALID", name="encoder0")(e0)
        e0 = nn.relu(instance_norm(e0))
        e1 = nn.Conv(128, (4, 4), strides=2, padding=1, name="encoder1")(e0)
        e1 = nn.relu(instance_norm(e1))

        kernels, kernels_img = KPN(num_kernels=self.num_kernels,
                                   name="kpn_model")(x4, e1)

        x = nn.Conv(256, (4, 4), strides=2, padding=1, name="encoder2")(e1)
        x = nn.relu(instance_norm(x))
        x = per_pixel_filter(x, kernels)

        for i in range(self.residual_blocks):
            x = _ResnetBlockD2(256, name=f"middle{i}")(x)

        # torch ConvTranspose2d(k=4, s=2, p=1) == flax SAME transpose (the
        # converter flips the torch kernel spatially)
        x = nn.ConvTranspose(128, (4, 4), strides=(2, 2), padding="SAME",
                             name="decoder0")(x)
        x = nn.relu(instance_norm(x))
        x = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME",
                             name="decoder1")(x)
        x = nn.relu(instance_norm(x))
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(3, (7, 7), padding="VALID", name="decoder2")(x)

        x = per_pixel_filter(x, kernels_img)
        return (jnp.tanh(x) + 1.0) / 2.0


class MISFInpainter:
    """Host-facing wrapper mirroring inpainting.py:46 `inpainting_face`:
    mask out the hole, run the generator, paste the prediction back into
    the hole only."""

    def __init__(self, params: dict, num_kernels: int = 256):
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        self.model = MISFGenerator(num_kernels=num_kernels)
        self._apply = jit_with_packed_params(
            lambda p, img, mask: self._forward(p, img, mask), params)
        self.params = params

    def _forward(self, params, img01, mask):
        masked = img01 * (1.0 - mask)
        x4 = jnp.concatenate([masked, mask], axis=-1)
        out = self.model.apply({"params": params}, x4)
        return out * mask + img01 * (1.0 - mask)

    def __call__(self, img01: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """img01: (B, H, W, 3) in [0,1]; mask: (B, H, W, 1), 1 = hole."""
        return self._apply(img01, mask)
