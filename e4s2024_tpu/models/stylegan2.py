"""Mask-conditioned StyleGAN2 generator + discriminator in Flax (TPU-native).

Re-design of the reference's regional StyleGAN2 (reference
models/stylegan2/model.py:482 `Generator`, :771 `Discriminator`, :351 `StyledConv`,
:426 `ToRGB`): same math and checkpoint-compatible parameterization, but

- NHWC activations / HWIO weights (TPU layout),
- the 12-component per-layer Python loop replaced by one grouped conv
  (`regional_modulated_conv2d`, see e4s2024_tpu.ops.modconv) with an optional
  `fast` per-pixel-modulation mode,
- noise injection is explicit (rng-keyed or provided), keeping forward pure.

Latent layout: `latent` is (B, K, n_latent, 512) — per-component W+ codes; layers
>= `remaining_layer_idx` use component 0 only (single shared style), matching
reference model.py:685-688.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from e4s2024_tpu.ops.modconv import modulated_conv2d, regional_modulated_conv2d
from e4s2024_tpu.ops.upfirdn import blur as fir_blur
from e4s2024_tpu.ops.upfirdn import make_kernel, upsample_2x

# StyleGAN2 channel schedule (reference model.py:512-522), channel_multiplier=2.
def channel_schedule(channel_multiplier: int = 2) -> dict[int, int]:
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def pixel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the channel (last) axis (reference model.py:15)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalized-LR linear (reference model.py:135). Kernel stored (in, out)."""

    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0
    activation: str | None = None  # None | "fused_lrelu"

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.features),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (kernel * scale)
        if self.use_bias:
            bias = self.param(
                "bias", lambda key, shape: jnp.full(shape, self.bias_init), (self.features,)
            )
            if self.activation == "fused_lrelu":
                return fused_leaky_relu(out, bias * self.lr_mul)
            out = out + bias * self.lr_mul
        elif self.activation == "fused_lrelu":
            return fused_leaky_relu(out, None)
        return out


class EqualConv2d(nn.Module):
    """Equalized-LR conv (reference model.py:97). Weight stored HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, cin, self.features)
        )
        scale = 1.0 / math.sqrt(cin * k * k)
        out = jax.lax.conv_general_dilated(
            x,
            weight * scale,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


class ModulatedConv(nn.Module):
    """Style-modulated conv (reference model.py:184). Owns the modulation MLP."""

    features: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_taps: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, segmap=None, *, regional_mode: str = "exact"):
        """style: (B, 512) plain, or (B, K, 512) with segmap (B, Hm, Wm, K)."""
        cin = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, cin, self.features)
        )
        mod = EqualLinear(cin, bias_init=1.0, name="modulation")
        bk = jnp.asarray(make_kernel(list(self.blur_taps)))

        if style.ndim == 3:
            b, ncomp, sdim = style.shape
            s = mod(style.reshape(b * ncomp, sdim)).reshape(b, ncomp, cin)
            assert segmap is not None, "regional style requires a segmap"
            if self.downsample:
                raise NotImplementedError("regional downsample is not used by E4S")
            return regional_modulated_conv2d(
                x, weight, s, segmap,
                demodulate=self.demodulate, up=self.upsample,
                blur_kernel=bk, mode=regional_mode,
            )
        s = mod(style)
        return modulated_conv2d(
            x, weight, s,
            demodulate=self.demodulate, up=self.upsample, down=self.downsample,
            blur_kernel=bk,
        )


class StyledConv(nn.Module):
    """ModulatedConv + noise injection + fused leaky-relu (reference model.py:351).

    When `mask_op` and a (B,K,512) style is given, regional modulation is used —
    the reference's 12-iteration component loop collapsed into one conv.
    """

    features: int
    kernel_size: int = 3
    upsample: bool = False
    demodulate: bool = True
    mask_op: bool = False

    @nn.compact
    def __call__(self, x, style, segmap=None, noise=None, *, regional_mode="exact"):
        conv = ModulatedConv(
            self.features, self.kernel_size,
            demodulate=self.demodulate, upsample=self.upsample, name="conv",
        )
        if self.mask_op:
            out = conv(x, style, segmap, regional_mode=regional_mode)
        else:
            out = conv(x, style)
        noise_w = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is not None:
            out = out + noise_w * noise
        bias = self.param("act_bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv to RGB + upsampled skip (reference model.py:426).

    The 1x1 kernel makes the `fast` regional mode numerically exact, so the
    regional path always uses it.
    """

    upsample: bool = True
    mask_op: bool = False
    blur_taps: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, segmap=None, skip=None):
        conv = ModulatedConv(3, 1, demodulate=False, name="conv")
        if self.mask_op:
            out = conv(x, style, segmap, regional_mode="fast")
        else:
            out = conv(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias
        if skip is not None:
            skip = upsample_2x(skip, jnp.asarray(make_kernel(list(self.blur_taps))))
            out = out + skip
        return out


class Generator(nn.Module):
    """Mask-conditioned StyleGAN2 generator (reference model.py:482).

    `split_layer_idx` / `remaining_layer_idx` follow the reference: layers with
    latent index >= remaining_layer_idx use one shared (non-regional) style.
    """

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    split_layer_idx: int = 5
    remaining_layer_idx: int = 13

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    def setup(self):
        channels = channel_schedule(self.channel_multiplier)

        self.style_mlp = [
            EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"style_{i + 1}",
            )
            for i in range(self.n_mlp)
        ]
        self.const_input = self.param(
            "input", nn.initializers.normal(1.0), (1, 4, 4, channels[4])
        )
        self.conv1 = StyledConv(channels[4], 3, mask_op=True, name="conv1")
        self.to_rgb1 = ToRGB(upsample=False, mask_op=True, name="to_rgb1")

        convs = []
        to_rgbs = []
        in_ch = channels[4]
        for i in range(3, self.log_size + 1):
            out_ch = channels[2**i]
            masked_conv = not i > (2 + self.remaining_layer_idx // 2)
            masked_rgb = not (
                self.remaining_layer_idx != 17 and i >= (2 + self.remaining_layer_idx // 2)
            )
            convs.append(StyledConv(out_ch, 3, upsample=True, mask_op=masked_conv,
                                    name=f"convs_{2 * (i - 3)}"))
            convs.append(StyledConv(out_ch, 3, mask_op=masked_conv,
                                    name=f"convs_{2 * (i - 3) + 1}"))
            to_rgbs.append(ToRGB(mask_op=masked_rgb, name=f"to_rgbs_{i - 3}"))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    def style(self, z: jnp.ndarray) -> jnp.ndarray:
        """z -> w through the 8-layer mapping network (reference model.py:604)."""
        w = pixel_norm(z)
        for layer in self.style_mlp:
            w = layer(w)
        return w

    def mean_latent(self, rng, n_sample: int) -> jnp.ndarray:
        z = jax.random.normal(rng, (n_sample, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def make_noise(self, rng, batch: int) -> list[jnp.ndarray]:
        keys = jax.random.split(rng, self.num_layers)
        noises = []
        for i in range(self.num_layers):
            res = 2 ** ((i + 5) // 2)
            noises.append(jax.random.normal(keys[i], (batch, res, res, 1)))
        return noises

    def __call__(
        self,
        latent: jnp.ndarray,
        structure_feats: jnp.ndarray | None,
        segmap: jnp.ndarray,
        *,
        noise: list[jnp.ndarray] | None = None,
        use_structure_code: bool = False,
        regional_mode: str = "exact",
        return_latents: bool = False,
    ):
        """Synthesize from per-component W+ codes.

        Args:
          latent: (B, K, n_latent, 512) per-component style codes.
          structure_feats: optional (B, 16, 16, 512) replacement features injected
            at split_layer_idx (reference model.py:673-678).
          segmap: (B, H, W, K) one-hot segmentation at any resolution.
          noise: list of num_layers (B, res, res, 1) tensors, or None for no noise.

        Returns: (image NHWC in [-1,1], latent (or None), intermediate_feats).
        """
        if noise is None:
            noise = [None] * self.num_layers

        # The E4S path always feeds W+ codes, so the z->w mapping network would
        # never be touched; create its params at init anyway (they exist in
        # reference checkpoints and are needed for mean_latent / z sampling).
        if self.is_initializing():
            self.style(jnp.zeros((1, self.style_dim)))

        out = jnp.tile(self.const_input, (latent.shape[0], 1, 1, 1))
        out = self.conv1(out, latent[:, :, 0], segmap, noise=noise[0],
                         regional_mode=regional_mode)
        skip = self.to_rgb1(out, latent[:, :, 1], segmap)

        intermediate = None
        i = 1
        for j in range(len(self.to_rgbs)):
            conv_a, conv_b = self.convs[2 * j], self.convs[2 * j + 1]
            to_rgb = self.to_rgbs[j]
            n1, n2 = noise[2 * j + 1], noise[2 * j + 2]
            if i < self.remaining_layer_idx:
                out = conv_a(out, latent[:, :, i], segmap, noise=n1,
                             regional_mode=regional_mode)
                if i + 2 == self.split_layer_idx:
                    if use_structure_code:
                        out = structure_feats
                    intermediate = out
                out = conv_b(out, latent[:, :, i + 1], segmap, noise=n2,
                             regional_mode=regional_mode)
                if self.remaining_layer_idx == 17 or i + 2 != self.remaining_layer_idx:
                    skip = to_rgb(out, latent[:, :, i + 2], segmap, skip=skip)
                else:
                    skip = to_rgb(out, latent[:, 0, i + 2], skip=skip)
            else:
                out = conv_a(out, latent[:, 0, i], noise=n1)
                out = conv_b(out, latent[:, 0, i + 1], noise=n2)
                skip = to_rgb(out, latent[:, 0, i + 2], skip=skip)
            i += 2

        image = skip
        return image, (latent if return_latents else None), intermediate


class ConvLayer(nn.Module):
    """Conv (+optional FIR-blur downsample) + fused leaky-relu (reference model.py:701)."""

    features: int
    kernel_size: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    blur_taps: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.downsample:
            taps = len(self.blur_taps)
            p = (taps - 2) + (k - 1)
            x = fir_blur(x, jnp.asarray(make_kernel(list(self.blur_taps))),
                         pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2
        out = EqualConv2d(
            self.features, k, stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros, (self.features,))
                out = fused_leaky_relu(out, bias)
            else:
                out = scaled_leaky_relu(out)
        return out


class ResBlock(nn.Module):
    """Residual downsampling block (reference model.py:750)."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = ConvLayer(cin, 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, activate=False,
                         use_bias=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


class Discriminator(nn.Module):
    """StyleGAN2 discriminator with minibatch stddev (reference model.py:771)."""

    size: int = 1024
    channel_multiplier: int = 2
    stddev_group: int = 4

    @nn.compact
    def __call__(self, x):
        channels = channel_schedule(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        out = ConvLayer(channels[self.size], 1, name="conv_in")(x)
        for i in range(log_size, 2, -1):
            out = ResBlock(channels[2 ** (i - 1)], name=f"res_{log_size - i}")(out)

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        # minibatch stddev (reference model.py:815-823), NHWC adaptation
        y = out.reshape(group, b // group, h, w, 1, c)
        var = jnp.var(y, axis=0)
        stddev = jnp.sqrt(var + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)  # over H, W, C
        stddev = jnp.squeeze(stddev, axis=4)
        stddev = jnp.tile(stddev, (group, h, w, 1))
        out = jnp.concatenate([out, stddev], axis=-1)

        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        # flatten in torch's NCHW (C,H,W) order so converted final_linear
        # weights apply unpermuted (reference model.py:828 out.view(batch,-1))
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
        out = EqualLinear(channels[4], activation="fused_lrelu", name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)
        return out
