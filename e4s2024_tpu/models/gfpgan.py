"""GFPGAN (v1.3/v1.4 "clean" architecture) face restoration in Flax.

Port of the reference's GFPGANv1Clean (reference swap_face_fine/GFPGAN/gfpgan/
archs/gfpganv1_clean_arch.py:153 + stylegan2_clean_arch.py; the enhancer behind
`face_restoration`, Face_swap_with_two_imgs.py:610): a U-Net encoder providing
per-resolution SFT (scale, shift) conditions to a bilinear "clean" StyleGAN2
decoder (no FIR ops), with sft_half (conditions modulate half the channels)
and different_w (per-layer W codes).

Uses the same input-scale -> shared-conv -> output-scale modulated-conv
identity as the core StyleGAN2 (SPMD-friendly, no per-sample weights); the
clean variant stores pre-scaled weights and multiplies activations by sqrt(2).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s2024_tpu.ops.resize import resize_bilinear


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def gfpgan_channels(channel_multiplier: int = 2, narrow: float = 1.0):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow),
        64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


class CleanModulatedConv(nn.Module):
    """stylegan2_clean_arch.py:24 ModulatedConv2d: plain Linear modulation,
    pre-scaled weight, optional bilinear up/down before the conv."""

    features: int
    kernel_size: int = 3
    demodulate: bool = True
    sample_mode: str | None = None

    @nn.compact
    def __call__(self, x, style):
        cin = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape)
            / math.sqrt(cin * k * k),
            (k, k, cin, self.features))
        s = nn.Dense(cin, bias_init=nn.initializers.ones, name="modulation")(style)
        if self.sample_mode == "upsample":
            x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
        elif self.sample_mode == "downsample":
            x = resize_bilinear(x, (x.shape[1] // 2, x.shape[2] // 2))
        xm = x * s[:, None, None, :]
        out = lax.conv_general_dilated(
            xm, weight, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            wsq = jnp.sum(jnp.square(weight), axis=(0, 1))  # (Cin, Cout)
            demod = lax.rsqrt(jnp.square(s) @ wsq + 1e-8)
            out = out * demod[:, None, None, :]
        return out


class CleanStyleConv(nn.Module):
    features: int
    sample_mode: str | None = None

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = CleanModulatedConv(self.features, 3, sample_mode=self.sample_mode,
                                 name="conv")(x, style) * math.sqrt(2.0)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is not None:
            out = out + nw * noise
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, self.features))
        return _lrelu(out + bias)


class CleanToRGB(nn.Module):
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = CleanModulatedConv(3, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            if self.upsample:
                skip = resize_bilinear(skip, (2 * skip.shape[1], 2 * skip.shape[2]))
            out = out + skip
        return out


class GFPGANResBlock(nn.Module):
    """gfpganv1_clean_arch.py:120 ResBlock (bilinear down/up)."""

    features: int
    mode: str = "down"

    @nn.compact
    def __call__(self, x):
        out = _lrelu(nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv1")(x))
        if self.mode == "down":
            size = (x.shape[1] // 2, x.shape[2] // 2)
        else:
            size = (2 * x.shape[1], 2 * x.shape[2])
        out = resize_bilinear(out, size)
        out = _lrelu(nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out))
        skip = resize_bilinear(x, size)
        skip = nn.Conv(self.features, (1, 1), use_bias=False, name="skip")(skip)
        return out + skip


class CSFTDecoder(nn.Module):
    """StyleGAN2GeneratorCSFT (gfpganv1_clean_arch.py:11): clean decoder with
    SFT modulation on half the channels (sft_half=True)."""

    out_size: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0
    sft_half: bool = True

    @nn.compact
    def __call__(self, latent, conditions, noise=None):
        ch = gfpgan_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.out_size))
        num_layers = (log_size - 2) * 2 + 1
        if noise is None:
            noise = [None] * num_layers

        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.tile(const, (latent.shape[0], 1, 1, 1))
        out = CleanStyleConv(ch[4], name="style_conv1")(out, latent[:, 0],
                                                        noise[0])
        skip = CleanToRGB(upsample=False, name="to_rgb1")(out, latent[:, 1])

        i = 1
        for p in range(log_size - 2):
            f = ch[2 ** (p + 3)]
            out = CleanStyleConv(f, sample_mode="upsample",
                                 name=f"style_convs_{2 * p}")(
                out, latent[:, i], noise[2 * p + 1])
            if i < len(conditions):
                if self.sft_half:
                    half = out.shape[-1] // 2
                    same, sft = out[..., :half], out[..., half:]
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = jnp.concatenate([same, sft], axis=-1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = CleanStyleConv(f, name=f"style_convs_{2 * p + 1}")(
                out, latent[:, i + 1], noise[2 * p + 2])
            skip = CleanToRGB(name=f"to_rgbs_{p}")(out, latent[:, i + 2], skip)
            i += 2
        return skip


class GFPGANv1Clean(nn.Module):
    """Full restorer: U-Net conditions + CSFT decoder. Input 512^2 in [-1, 1]."""

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0
    different_w: bool = True
    sft_half: bool = True

    @nn.compact
    def __call__(self, x):
        unet_ch = gfpgan_channels(self.channel_multiplier, self.narrow * 0.5)
        log_size = int(math.log2(self.out_size))
        num_latent = log_size * 2 - 2

        feat = _lrelu(nn.Conv(unet_ch[self.out_size], (1, 1),
                              name="conv_body_first")(x))
        skips = []
        for i in range(log_size, 2, -1):
            feat = GFPGANResBlock(unet_ch[2 ** (i - 1)], "down",
                                  name=f"conv_body_down_{log_size - i}")(feat)
            skips.insert(0, feat)
        feat = _lrelu(nn.Conv(unet_ch[4], (3, 3), padding=1,
                              name="final_conv")(feat))

        b = feat.shape[0]
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        w_out = (num_latent * self.num_style_feat if self.different_w
                 else self.num_style_feat)
        style_code = nn.Dense(w_out, name="final_linear")(flat)
        if self.different_w:
            latent = style_code.reshape(b, num_latent, self.num_style_feat)
        else:
            latent = jnp.tile(style_code[:, None], (1, num_latent, 1))

        conditions = []
        for i in range(log_size - 2):
            feat = feat + skips[i]
            feat = GFPGANResBlock(unet_ch[2 ** (i + 3)], "up",
                                  name=f"conv_body_up_{i}")(feat)
            # reference: sft channels = unet channels (== half the decoder
            # width) when sft_half, else double (gfpganv1_clean_arch.py:264-270)
            sft_out = unet_ch[2 ** (i + 3)]
            if not self.sft_half:
                sft_out *= 2

            def head(v, name):
                v = _lrelu(nn.Conv(v.shape[-1], (3, 3), padding=1,
                                   name=f"{name}_0")(v))
                return nn.Conv(sft_out, (3, 3), padding=1, name=f"{name}_2")(v)

            conditions.append(head(feat, f"condition_scale_{i}"))
            conditions.append(head(feat, f"condition_shift_{i}"))

        image = CSFTDecoder(self.out_size, self.channel_multiplier, self.narrow,
                            self.sft_half, name="stylegan_decoder")(
            latent, conditions)
        return image, latent


class GFPGANEnhancer:
    """Aligned-crop restoration at 512^2 (the reference's `face_restoration`)."""

    def __init__(self, params: dict, model: GFPGANv1Clean | None = None):
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        self.model = model or GFPGANv1Clean()
        self.params = params

        def fwd(p, img255):
            h = img255.shape[1]
            s = self.model.out_size
            x = img255.astype(jnp.float32) / 127.5 - 1.0
            if h != s:
                x = resize_bilinear(x, (s, s))
            out = self.model.apply({"params": p}, x)[0]
            out = jnp.clip((out.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
            if h != s:
                out = resize_bilinear(out, (h, h))
            return out

        # one jitted program, packed params (see utils.packing)
        self._fwd = jit_with_packed_params(fwd, params)

    def enhance_aligned(self, img255: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(jnp.asarray(img255))
