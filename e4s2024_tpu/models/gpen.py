"""GPEN face restoration (the pipeline's default enhancer) in Flax.

Port of the reference's GPEN (reference swap_face_fine/gpen/face_model/
gpen_model.py:380 `Generator`, :637 `FullGenerator`; used at 512^2 via
GPENInfer, gpen_demo.py:18-121): a StyleGAN2-style decoder whose "noise"
inputs are the encoder's per-scale features, injected by CHANNEL CONCAT
(NoiseInjection(isconcat=True), gpen_model.py:287-303) so every styled conv
doubles its channel count.

Shares the equalized-LR / modulated-conv ops with e4s2024_tpu.models.stylegan2
(the reference's GPEN op package is a byte-identical copy of the StyleGAN2 CUDA
ops — SURVEY.md §2.1).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.stylegan2 import (
    ConvLayer,
    EqualLinear,
    ModulatedConv,
    pixel_norm,
)
from e4s2024_tpu.ops.fused_act import fused_leaky_relu
from e4s2024_tpu.ops.resize import resize_bilinear
from e4s2024_tpu.ops.upfirdn import make_kernel, upsample_2x


def gpen_channels(channel_multiplier: int = 2, narrow: float = 1.0) -> dict[int, int]:
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow),
        64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
        2048: int(8 * channel_multiplier * narrow),
    }


class GPENStyledConv(nn.Module):
    """Styled conv with concat-noise injection (gpen_model.py:318-356)."""

    features: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style, noise):
        out = ModulatedConv(self.features, 3, upsample=self.upsample,
                            name="conv")(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        out = jnp.concatenate([out, nw * noise], axis=-1)
        bias = self.param("act_bias", nn.initializers.zeros,
                          (2 * self.features,))
        return fused_leaky_relu(out, bias)


class GPENToRGB(nn.Module):
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(3, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            skip = upsample_2x(skip, jnp.asarray(make_kernel([1, 3, 3, 1])))
            out = out + skip
        return out


class GPENGenerator(nn.Module):
    """StyleGAN2 decoder with concat-noise (gpen_model.py:380-556)."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    lr_mlp: float = 0.01

    @property
    def log_size(self):
        return int(math.log2(self.size))

    @property
    def n_latent(self):
        return self.log_size * 2 - 2

    def setup(self):
        ch = gpen_channels(self.channel_multiplier, self.narrow)
        self.style_mlp = [
            EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                        activation="fused_lrelu", name=f"style_{i + 1}")
            for i in range(self.n_mlp)
        ]
        self.const_input = self.param("input", nn.initializers.normal(1.0),
                                      (1, 4, 4, ch[4]))
        self.conv1 = GPENStyledConv(ch[4], name="conv1")
        self.to_rgb1 = GPENToRGB(upsample=False, name="to_rgb1")
        convs, to_rgbs = [], []
        for i in range(3, self.log_size + 1):
            out_ch = ch[2**i]
            convs.append(GPENStyledConv(out_ch, upsample=True,
                                        name=f"convs_{2 * (i - 3)}"))
            convs.append(GPENStyledConv(out_ch, name=f"convs_{2 * (i - 3) + 1}"))
            to_rgbs.append(GPENToRGB(name=f"to_rgbs_{i - 3}"))
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style(self, z):
        w = pixel_norm(z)
        for layer in self.style_mlp:
            w = layer(w)
        return w

    def __call__(self, w, noise, input_is_latent=False):
        """w: (B, 512) encoder code; noise: list of per-layer (B, res, res, C)
        feature maps (encoder skips). Unless input_is_latent, w is mapped
        through the style MLP first — the reference FullGenerator calls its
        generator with input_is_latent=False (gpen_model.py:689), so the
        8-layer mapping network IS part of the restoration forward."""
        if not input_is_latent:
            w = self.style(w)
        latent = jnp.tile(w[:, None], (1, self.n_latent, 1))
        out = jnp.tile(self.const_input, (w.shape[0], 1, 1, 1))
        out = self.conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for j in range(len(self.to_rgbs)):
            out = self.convs[2 * j](out, latent[:, i], noise[2 * j + 1])
            out = self.convs[2 * j + 1](out, latent[:, i + 1], noise[2 * j + 2])
            skip = self.to_rgbs[j](out, latent[:, i + 2], skip=skip)
            i += 2
        return skip, latent


class GPENFullGenerator(nn.Module):
    """Encoder (ConvLayer chain to 4x4 + style head) + concat-noise decoder
    (gpen_model.py:637-692). Input/output 512^2 RGB in [-1, 1]."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x):
        ch = gpen_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.size))

        feats = []
        out = ConvLayer(ch[self.size], 1, name="ecd_0")(x)
        feats.append(out)
        for i in range(log_size, 2, -1):
            out = ConvLayer(ch[2 ** (i - 1)], 3, downsample=True,
                            name=f"ecd_{log_size - i + 1}")(out)
            feats.append(out)
        # torch NCHW (C,H,W) flatten order so converted final_linear weights
        # apply unpermuted (gpen_model.py:683 out.view(batch, -1))
        flat = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
        w = EqualLinear(self.style_dim, activation="fused_lrelu",
                        name="final_linear")(flat)

        # per-layer noise: each encoder feature used twice, coarse-to-fine,
        # dropping the first slot (gpen_model.py:686-688)
        doubled = [f for f in feats for _ in range(2)][::-1]
        noise = doubled[1:]
        gen = GPENGenerator(self.size, self.style_dim, self.n_mlp,
                            self.channel_multiplier, self.narrow,
                            name="generator")
        img, latent = gen(w, noise)
        return img, latent


class GPENEnhancer:
    """Aligned-crop face enhancement (the reference's GPENInfer.infer_image for
    already-aligned faces, gpen_demo.py:18-121 with aligned path)."""

    def __init__(self, params: dict, size: int = 512,
                 model: GPENFullGenerator | None = None):
        from e4s2024_tpu.utils.packing import pack_pytree, unpack_pytree

        self.size = size
        self.model = model or GPENFullGenerator(size=size)
        self.params = params
        # whole path in ONE jitted program with packed params: eager pre/post
        # glue and per-leaf argument marshalling both cost real milliseconds
        # per call on tunneled transports
        self._packed, meta = pack_pytree(params)

        def fwd(packed, img255):
            p = unpack_pytree(packed, meta)
            h = img255.shape[1]
            x = img255.astype(jnp.float32) / 127.5 - 1.0
            if h != self.size:
                x = resize_bilinear(x, (self.size, self.size))
            out = self.model.apply({"params": p}, x)[0]
            out = jnp.clip((out.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
            if h != self.size:
                out = resize_bilinear(out, (h, h))
            return out

        self._fwd = jax.jit(fwd)

    def enhance_aligned(self, img255: jnp.ndarray) -> jnp.ndarray:
        """img255: (B, H, W, 3) float [0,255] -> enhanced at the same size."""
        return self._fwd(self._packed, jnp.asarray(img255))


def landmarks68_to_5(lm68: np.ndarray) -> np.ndarray:
    """68-pt dlib landmarks -> the 5-pt (eyes, nose, mouth corners) set the
    ArcFace alignment templates expect."""
    lm68 = np.asarray(lm68, np.float64)
    return np.stack([
        lm68[36:42].mean(0), lm68[42:48].mean(0), lm68[30],
        lm68[48], lm68[54],
    ])


class GPENFullFrameEnhancer:
    """Full-frame restoration: detect -> align -> restore -> paste back
    (reference swap_face_fine/gpen/gpen_demo.py:18-121). Detection is the
    in-framework RetinaFace (pipelines/detect.py) — the reference's own GPEN
    detector (swap_face_fine/gpen/face_detect/retinaface_detection.py) — so
    multi-face frames restore every face from the detector's 5-pt landmarks,
    batched through one GPEN forward. A 68-pt `landmark_fn` hook is still
    accepted and takes precedence (single-face).

    The paste-back follows the reference's soft mask: an all-ones crop warped
    with the inverse affine, scaled down at the border so the restored face
    blends into the frame.
    """

    def __init__(self, enhancer: GPENEnhancer, landmark_fn=None,
                 border_frac: float = 0.05, detector=None, sr_upscaler=None):
        self.enhancer = enhancer
        self.landmark_fn = landmark_fn
        self.border_frac = border_frac
        self._detector = detector  # RetinaFaceDetector (or FaceLandmarkDetector)
        # background super-resolution: the reference's use_sr flow
        # (swap_face_fine/gpen/face_enhancement.py:63-67,105-108) RealESRNet-
        # upscales the WHOLE frame first, detects on the upscaled frame, and
        # pastes the restored faces onto it — faces restored by GPEN, the
        # background by SR. Anything with .upscale((B,H,W,3)[0,255]) -> x4
        # (RealESRGANUpscaler — RealESRNet is the same RRDB arch — or
        # SwinIRUpscaler).
        self.sr_upscaler = sr_upscaler

    def _faces_lm5(self, frame: np.ndarray) -> np.ndarray:
        """(F, 5, 2) five-point landmarks for every face in the frame."""
        if self.landmark_fn is not None:
            lm = self.landmark_fn(frame)
            if lm is None:
                return np.zeros((0, 5, 2), np.float32)
            return landmarks68_to_5(lm)[None]
        if self._detector is None:
            from e4s2024_tpu.pipelines.detect import default_landmarker

            self._detector = default_landmarker().detector
        det = getattr(self._detector, "detector", self._detector)
        _, _, lm5 = det.detect(frame)
        return lm5

    def enhance_frame(self, frame255: np.ndarray) -> np.ndarray:
        """frame255: (H, W, 3) uint8/float full frame. Returns the frame with
        every detected face restored; unchanged if detection finds none."""
        from e4s2024_tpu.pipelines.arcface_align import (
            estimate_norm, invert_affine, warp_affine, warp_affine_hw,
        )

        frame_np = np.asarray(frame255)
        if self.sr_upscaler is not None:
            # SR the whole frame, then detect + restore + paste on the
            # upscaled frame (reference face_enhancement.py:63-67)
            frame_np = np.asarray(self.sr_upscaler.upscale(
                jnp.asarray(frame_np, jnp.float32)[None])[0]).astype(
                    np.uint8)
        lm5s = self._faces_lm5(frame_np)
        if lm5s.shape[0] == 0:
            return frame_np
        s = self.enhancer.size
        mode = "set1" if s != 512 else "ffhq"
        frame = jnp.asarray(frame_np, jnp.float32)
        ms = [estimate_norm(lm5, s, mode=mode) for lm5 in lm5s]
        crops = jnp.stack([warp_affine(frame, jnp.asarray(m), s) for m in ms])
        restored = self.enhancer.enhance_aligned(crops)  # one batched forward

        # soft paste mask: ones-crop warped back, feathered at the border
        b = max(1, int(s * self.border_frac))
        ramp = np.minimum(np.arange(s, dtype=np.float32),
                          np.arange(s, dtype=np.float32)[::-1])
        ramp = np.clip(ramp / b, 0.0, 1.0)
        mask_j = jnp.asarray((ramp[:, None] * ramp[None, :])[..., None])
        hw = (frame.shape[0], frame.shape[1])
        out = frame
        for i, m in enumerate(ms):
            inv_m = jnp.asarray(invert_affine(m))
            pasted = warp_affine_hw(restored[i], inv_m, hw)
            alpha = warp_affine_hw(mask_j, inv_m, hw)
            out = pasted * alpha + out * (1.0 - alpha)
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)
