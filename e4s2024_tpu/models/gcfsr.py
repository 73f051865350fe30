"""GCFSR face inpainting (256^2) in Flax.

Port of the reference's `FaceInpaintingArch` (reference
swap_face_fine/gcfsr_arch.py:1347; loaded from net_g_50000.pth in
face_inpainting.py:13-50): an encoder-conditioned StyleGAN2 decoder where

- the encoder downsamples the masked image (+mask channel) to 16^2 and
  produces the W+ latents from a 4^2 bottleneck,
- per-resolution "condition" branches produce (scale1, scale2, shift): scale
  pairs are linear in the mask-area scalar `in_size`, shifts are convs of the
  encoder features; selected convs apply out*scale1_n + shift*scale2_n with
  L2-normalized scales (gcfsr_arch.py:702-747).

Reuses the modulated-conv/FIR ops of the StyleGAN2 core (the basicsr variants
are numerically identical to the rosinality ones already implemented).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s2024_tpu.models.stylegan2 import ConvLayer, EqualLinear, ModulatedConv
from e4s2024_tpu.ops.fused_act import fused_leaky_relu
from e4s2024_tpu.ops.resize import resize_bilinear, resize_nearest


def gcfsr_channels(channel_multiplier: int = 2, narrow: float = 1.0):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow),
        64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


class GCFSRStyleConv(nn.Module):
    """StyleConv (gcfsr_arch.py:289): modconv + broadcast noise + bias-act."""

    features: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv(self.features, 3, upsample=self.upsample,
                            name="conv")(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is not None:
            out = out + nw * noise
        bias = self.param("act_bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(out, bias)


class GCFSRStyleConvNSS(nn.Module):
    """StyleConv_norm_scale_shift (gcfsr_arch.py:708): conv + noise, then
    out*scale1_n + shift*scale2_n with L2-normalized scale pair, then act."""

    features: int

    @nn.compact
    def __call__(self, x, style, scale1, scale2, shift, noise=None):
        out = ModulatedConv(self.features, 3, name="conv")(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is not None:
            out = out + nw * noise
        norm = jax.lax.rsqrt(jnp.square(scale1) + jnp.square(scale2) + 1e-8)
        s1 = (scale1 * norm)[:, None, None, :]
        s2 = (scale2 * norm)[:, None, None, :]
        out = out * s1 + shift * s2
        bias = self.param("act_bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(out, bias)


class GCFSRToRGB(nn.Module):
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        from e4s2024_tpu.ops.upfirdn import make_kernel, upsample_2x

        out = ModulatedConv(3, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None and self.upsample:
            skip = upsample_2x(skip, jnp.asarray(make_kernel([1, 3, 3, 1])))
            out = out + skip
        elif skip is not None:
            out = out + skip
        return out


class FaceInpainting(nn.Module):
    """FaceInpaintingArch (gcfsr_arch.py:1347). Input: (B, S, S, 4) masked
    image + mask channel in [0, 1]; `in_size`: (B, 1) mask-area fraction."""

    out_size: int = 256
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x, in_size, noise=None):
        ch = gcfsr_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.out_size))
        num_latent = (log_size - 2) * 2 - 2
        num_layers = (log_size - 4) * 2 + 1
        if noise is None:
            noise = [None] * num_layers

        feat = ConvLayer(ch[self.out_size], 3, name="conv_body_first")(x)
        n_cond = log_size - 2  # resolutions out_size .. 16
        scales1, scales2, shifts = [], [], []

        def cond(j, f):
            s1 = EqualLinear(f.shape[-1], bias_init=1.0,
                             name=f"condition_scale1_{j}")(in_size)
            s2 = EqualLinear(f.shape[-1], bias_init=1.0,
                             name=f"condition_scale2_{j}")(in_size)
            sh = ConvLayer(f.shape[-1], 3, activate=False,
                           name=f"condition_shift_{j}")(f)
            return s1, s2, sh

        s1, s2, sh = cond(0, feat)
        scales1.append(s1); scales2.append(s2); shifts.append(sh)
        j = 1
        for i in range(log_size - 1, 3, -1):  # downs to 16^2
            feat = ConvLayer(ch[2**i], 3, downsample=True,
                             name=f"conv_body_down_{log_size - 1 - i}")(feat)
            if j < n_cond:
                s1, s2, sh = cond(j, feat)
                scales1.append(s1); scales2.append(s2); shifts.append(sh)
                j += 1
        scales1, scales2, shifts = scales1[::-1], scales2[::-1], shifts[::-1]

        b = feat.shape[0]
        tmp = ConvLayer(ch[8], 3, downsample=True, name="final_down1")(feat)
        tmp = ConvLayer(ch[4] // 2, 3, downsample=True, name="final_down2")(tmp)
        tmp = jnp.transpose(tmp, (0, 3, 1, 2)).reshape(b, -1)  # torch flatten
        latent = EqualLinear(self.num_style_feat * num_latent,
                             activation="fused_lrelu", name="final_linear")(tmp)
        latent = latent.reshape(b, num_latent, self.num_style_feat)

        out = ConvLayer(ch[16], 3, name="final_conv")(feat)
        out = GCFSRStyleConvNSS(ch[16], name="style_conv1")(
            out, latent[:, 0], scales1[0], scales2[0], shifts[0], noise[0])
        skip = GCFSRToRGB(upsample=False, name="to_rgb1")(out, latent[:, 1])

        i = 1
        jj = 1
        n_pairs = log_size - 4
        for p in range(n_pairs):
            out = GCFSRStyleConv(ch[2 ** (p + 5)], upsample=True,
                                 name=f"style_convs_{2 * p}")(
                out, latent[:, i], noise[2 * p + 1])
            out = GCFSRStyleConvNSS(ch[2 ** (p + 5)],
                                    name=f"style_convs_{2 * p + 1}")(
                out, latent[:, i + 1], scales1[jj], scales2[jj], shifts[jj],
                noise[2 * p + 2])
            skip = GCFSRToRGB(name=f"to_rgbs_{p}")(out, latent[:, i + 2], skip)
            i += 2
            jj += 1
        return skip, latent


class FaceInpainter:
    """The `inpainting(img, mask)` entry (reference face_inpainting.py:20-50):
    mask out the hole, run at 256^2, paste the completion into the hole."""

    def __init__(self, params: dict, model: FaceInpainting | None = None):
        from e4s2024_tpu.utils.packing import pack_pytree, unpack_pytree

        self.model = model or FaceInpainting()
        self.size = self.model.out_size
        self.params = params
        self._packed, meta = pack_pytree(params)

        def fwd(packed, img255, hole_mask):
            p = unpack_pytree(packed, meta)
            h = img255.shape[1]
            s = self.size
            img = img255.astype(jnp.float32) / 255.0
            img_s = resize_bilinear(img, (s, s))
            mask = hole_mask.astype(jnp.float32)[..., None]
            mask = (resize_bilinear(mask, (s, s)) > 0).astype(jnp.float32)
            lq = img_s * (1.0 - mask)
            x = jnp.concatenate([lq, mask], axis=-1)
            cond = jnp.mean(mask, axis=(1, 2, 3))[:, None]
            out = jnp.clip(self.model.apply({"params": p}, x, cond)[0],
                           0.0, 1.0)
            # composite at the ORIGINAL resolution so pixels outside the
            # hole are untouched (reference composites at its native 256)
            if h != s:
                out = resize_bilinear(out, (h, h))
            mask_h = hole_mask.astype(jnp.float32)[..., None]
            if mask_h.shape[1] != h:
                mask_h = (resize_bilinear(mask_h, (h, h)) > 0).astype(
                    jnp.float32)
            return (img * (1.0 - mask_h) + out * mask_h) * 255.0

        # one jitted program with packed params (see GPENEnhancer note)
        self._fwd = jax.jit(fwd)

    def inpaint(self, img255: jnp.ndarray, hole_mask: jnp.ndarray) -> jnp.ndarray:
        """img255: (B, H, W, 3) [0,255]; hole_mask: (B, Hm, Wm) float/bool."""
        return self._fwd(self._packed, jnp.asarray(img255),
                         jnp.asarray(hole_mask))
