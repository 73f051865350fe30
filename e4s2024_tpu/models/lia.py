"""LIA (Latent Image Animator) face reenactment in Flax.

Parity target: the reference's `swap_face_fine/LIA/networks/` —
`generator.py:6` Generator = styleGAN2-style appearance encoder
(`encoder.py:202` EncoderApp + 5-layer motion MLP, `encoder.py:241`) and the
flow-warping synthesis decoder (`styledecoder.py:455` Synthesis with
`styledecoder.py:395` ToFlow warps and `styledecoder.py:423` Direction —
orthogonalised motion dictionary via QR), driven by `run_demo.py:99
run_online` (h_start = the source's own motion code, so the latent becomes
wa + direction(target motion)). Checkpoint path is internal
(run_demo.py:54); convert weights via `convert.torch_loader.convert_lia`.

Reuses this repo's StyleGAN2 building blocks (equalized lr, modulated
convs, FIR resampling); the per-scale warps are `grid_sample_2d` on NHWC
feature maps.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.stylegan2 import (
    ConvLayer,
    EqualConv2d,
    EqualLinear,
    ModulatedConv,
    ResBlock,
    StyledConv,
)
from e4s2024_tpu.ops.fused_act import fused_leaky_relu
from e4s2024_tpu.models.tpsmm import grid_sample_2d
from e4s2024_tpu.ops.upfirdn import make_kernel, upsample_2x

# encoder channel plan is fixed (encoder.py:205); the synthesis plan scales
# the >=64px levels by channel_multiplier (styledecoder.py:469)
_ENC_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                 256: 64, 512: 32, 1024: 16}


def _syn_channels(cm: int) -> dict[int, int]:
    ch = dict(_ENC_CHANNELS)
    for r in (64, 128, 256, 512, 1024):
        ch[r] = ch[r] * cm
    return ch


class LIAEncoderApp(nn.Module):
    """Appearance encoder (encoder.py:202): 1x1 conv, ResBlocks down to 4,
    then a 4x4 valid conv to the w vector. Returns (w, feats) where feats
    are the per-scale activations from 8px up to full res."""

    size: int = 256
    w_dim: int = 512

    @nn.compact
    def __call__(self, x):
        log_size = int(math.log2(self.size))
        res = [ConvLayer(_ENC_CHANNELS[self.size], 1, name="conv0")(x)]
        for j, i in enumerate(range(log_size, 2, -1)):
            res.append(ResBlock(_ENC_CHANNELS[2 ** (i - 1)],
                                name=f"res{j}")(res[-1]))
        w = EqualConv2d(self.w_dim, 4, padding=0, use_bias=False,
                        name="final")(res[-1])
        return w[:, 0, 0, :], res[::-1][1:]


class LIAEncoder(nn.Module):
    """Appearance + motion encoder (encoder.py:241): the motion code is a
    stack of 5 plain equalized linears (no activations in the reference)."""

    size: int = 256
    dim: int = 512
    dim_motion: int = 20

    def setup(self):
        self.net_app = LIAEncoderApp(self.size, self.dim)
        self.fc = [EqualLinear(self.dim, name=f"fc{i}") for i in range(4)] + \
            [EqualLinear(self.dim_motion, name="fc4")]

    def _motion(self, h):
        for layer in self.fc:
            h = layer(h)
        return h

    def enc_motion(self, x):
        h, _ = self.net_app(x)
        return self._motion(h)

    def __call__(self, source, target, h_start=None):
        h_source, feats = self.net_app(source)
        h_target, _ = self.net_app(target)
        h_motion = [self._motion(h_target)]
        if h_start is not None:
            h_motion += [self._motion(h_source), h_start]
        return h_source, h_motion, feats


class Direction(nn.Module):
    """Orthogonal motion dictionary (styledecoder.py:423): QR of a learned
    (512, M) matrix; direction(alpha) = alpha @ Q^T."""

    motion_dim: int = 20

    @nn.compact
    def __call__(self, alpha):
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (512, self.motion_dim))
        q, _ = jnp.linalg.qr(weight + 1e-8)
        if alpha is None:
            return q
        return alpha @ q.T


class LIAToRGB(nn.Module):
    """LIA's ToRGB (styledecoder.py:374): UNLIKE StyleGAN2's, it is not
    modulated — an activated equalized 1x1 conv (ConvLayer => EqualConv2d +
    FusedLeakyReLU) plus a standalone bias, no style input."""

    upsample: bool = True
    blur_taps: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, skip=None):
        out = EqualConv2d(3, 1, use_bias=False, name="conv")(x)
        act_bias = self.param("act_bias", nn.initializers.zeros, (3,))
        out = fused_leaky_relu(out, act_bias)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            if self.upsample:
                skip = upsample_2x(skip, jnp.asarray(
                    make_kernel(list(self.blur_taps))))
            out = out + skip
        return out


class ToFlow(nn.Module):
    """Per-scale warp head (styledecoder.py:395): a 1x1 modulated conv
    predicts (dx, dy, mask); the encoder feature is warped and blended with
    the synthesis stream."""

    blur_taps: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, feat, skip=None):
        out = ModulatedConv(3, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            skip = upsample_2x(skip, jnp.asarray(
                make_kernel(list(self.blur_taps))))
            out = out + skip

        h = x.shape[1]
        xs = np.linspace(-1, 1, h, dtype=np.float32)
        grid = jnp.asarray(np.stack(np.meshgrid(xs, xs), 2))  # (h, h, 2) xy
        sampler = jnp.tanh(out[..., 0:2])
        mask = jax.nn.sigmoid(out[..., 2:3])
        flow = sampler + grid
        feat_warp = grid_sample_2d(feat, flow, align_corners=False) * mask
        return feat_warp, feat_warp + x * (1.0 - mask), out


class LIASynthesis(nn.Module):
    """Flow-warping StyleGAN2 decoder (styledecoder.py:455)."""

    size: int = 256
    style_dim: int = 512
    motion_dim: int = 20
    channel_multiplier: int = 1

    @nn.compact
    def __call__(self, wa, alpha, feats):
        ch = _syn_channels(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        n_latent = log_size * 2 - 2

        direction = Direction(self.motion_dim, name="direction")
        if alpha is not None:
            if len(alpha) > 1:
                latent = wa + (direction(alpha[0]) - direction(alpha[2])) \
                    + direction(alpha[1])
            else:
                latent = wa + direction(alpha[0])
        else:
            latent = wa

        const = self.param("input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.broadcast_to(const, (wa.shape[0],) + const.shape[1:])
        out = StyledConv(ch[4], 3, name="conv1")(out, latent)

        # the reference repeats ONE latent row across all n_latent slots
        # (styledecoder.py:520-521), so indexing latent[:, i] is the identity;
        # we pass the single latent everywhere. NoiseInjection with noise=None
        # draws fresh random noise in torch — here synthesis is deterministic
        # (no noise), the only intentional deviation.
        del n_latent
        skip = None
        skip_flow = None
        for j, r in enumerate(range(3, log_size + 1)):
            out = StyledConv(ch[2 ** r], 3, upsample=True,
                             name=f"convs_{2 * j}")(out, latent)
            out = StyledConv(ch[2 ** r], 3,
                             name=f"convs_{2 * j + 1}")(out, latent)
            to_flow = ToFlow(name=f"to_flows_{j}")
            to_rgb = LIAToRGB(upsample=j > 0, name=f"to_rgbs_{j}")
            if out.shape[1] == 8:
                out_warp, out, skip_flow = to_flow(out, latent, feats[j])
                skip = to_rgb(out_warp)
            else:
                out_warp, out, skip_flow = to_flow(out, latent, feats[j],
                                                   skip_flow)
                skip = to_rgb(out_warp, skip=skip)
        return skip


class LIAGenerator(nn.Module):
    """generator.py:6 Generator: encoder + synthesis."""

    size: int = 256
    style_dim: int = 512
    motion_dim: int = 20
    channel_multiplier: int = 1

    def setup(self):
        self.enc = LIAEncoder(self.size, self.style_dim, self.motion_dim)
        self.dec = LIASynthesis(self.size, self.style_dim, self.motion_dim,
                                self.channel_multiplier)

    def enc_motion(self, x):
        return self.enc.enc_motion(x)

    def __call__(self, source_pm1, driving_pm1, h_start=None):
        wa, alpha, feats = self.enc(source_pm1, driving_pm1, h_start)
        return self.dec(wa, alpha, feats)


class LIADriver:
    """Host wrapper (run_demo.py:99 run_online): h_start is the source's own
    motion code, so latent = wa + direction(driving motion)."""

    def __init__(self, params: dict, size: int = 256, motion_dim: int = 20):
        self.gen = LIAGenerator(size=size, motion_dim=motion_dim)
        self.params = params
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        # packed params: per-leaf arg marshalling costs ~10 us/leaf/call
        self._animate = jit_with_packed_params(self._animate_p, params)

    def _animate_p(self, params, source_pm1, driving_pm1):
        h_start = self.gen.apply({"params": params}, source_pm1,
                                 method=LIAGenerator.enc_motion)
        return self.gen.apply({"params": params}, source_pm1, driving_pm1,
                              h_start)

    def __call__(self, source_pm1: jnp.ndarray,
                 driving_pm1: jnp.ndarray) -> jnp.ndarray:
        """(B, 256, 256, 3) in [-1, 1] -> reenacted source in [-1, 1]."""
        return self._animate(source_pm1, driving_pm1)
