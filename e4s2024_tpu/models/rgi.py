"""RGI net — the E4S core model (encoder + per-region MLPs + regional StyleGAN2).

TPU-native equivalent of the reference's `Net3` (reference models/networks.py:51):

- `get_style_vectors(img, mask)` — encoder pass -> (B, K, 1280) per-region vectors
  (networks.py:206),
- `cal_style_codes(style_vectors)` — 12 LocalMLPs -> W+ codes with latent_avg
  offset and shared-tail padding (networks.py:223),
- `gen_img(struc, codes, mask)` — regional StyleGAN2 synthesis (networks.py:255),
- `__call__(img, mask)` — full reconstruction forward (networks.py:98).

`latent_avg` (the StyleGAN FFHQ mean latent, (18, 512)) lives in the "buffers"
variable collection: loaded from checkpoints, never trained.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.encoders import FSEncoderPSP, FSEncoderSEAN
from e4s2024_tpu.models.stylegan2 import EqualLinear, Generator
from e4s2024_tpu.ops.resize import resize_bilinear


class LocalMLP(nn.Module):
    """Per-component 1280-d style vector -> (num_w_layers x 512) W+ rows
    (reference networks.py:23)."""

    dim_style: int = 512
    num_w_layers: int = 13

    @nn.compact
    def __call__(self, x):
        out = EqualLinear(self.dim_style, name="fc1")(x)
        out = jnp.where(out >= 0, out, 0.01 * out)  # torch nn.LeakyReLU() default
        out = EqualLinear(self.dim_style * self.num_w_layers, name="fc2")(out)
        return out.reshape(-1, self.num_w_layers, self.dim_style)


class RGINet(nn.Module):
    """FSEncoder + regional StyleGAN2 with latent-avg-centered W+ codes."""

    num_seg_cls: int = 12
    out_size: int = 1024
    n_latent_mlp: int = 18
    remaining_layer_idx: int = 13
    split_layer_idx: int = 5
    channel_multiplier: int = 2
    start_from_latent_avg: bool = True
    # encoder always sees 256^2 in the reference (networks.py:114); smaller
    # values / unit counts are for cheap CI configs only.
    encoder_input_size: int = 256
    encoder_num_units: tuple = (3, 4, 14, 3)
    # "psp" (default, reference train_options.py:15) or "sean"
    # (reference networks.py:57-63)
    fsencoder_type: str = "psp"

    def setup(self):
        n_latent = 2 * int(np.log2(self.out_size)) - 2
        if self.remaining_layer_idx not in (17,) and self.remaining_layer_idx > n_latent:
            raise ValueError(
                f"remaining_layer_idx={self.remaining_layer_idx} exceeds "
                f"n_latent={n_latent} for out_size={self.out_size}")
        if self.fsencoder_type == "sean":
            self.encoder = FSEncoderSEAN(name="encoder")
        else:
            self.encoder = FSEncoderPSP(num_units=self.encoder_num_units,
                                        name="encoder")
        num_w = self.remaining_layer_idx if self.remaining_layer_idx != 17 else 18
        self.mlps = [
            LocalMLP(num_w_layers=num_w, name=f"mlp_{i}")
            for i in range(self.num_seg_cls)
        ]
        self.generator = Generator(
            size=self.out_size,
            channel_multiplier=self.channel_multiplier,
            split_layer_idx=self.split_layer_idx,
            remaining_layer_idx=self.remaining_layer_idx,
            name="generator",
        )
        self.latent_avg = self.variable(
            "buffers", "latent_avg",
            lambda: jnp.zeros((self.generator.n_latent, 512), jnp.float32),
        )

    def get_style_vectors(self, img, mask):
        """img: (B, H, W, 3) in [-1,1] (any res; resized to 256 bilinear);
        mask: (B, Hm, Wm, K) one-hot. Returns ((B,K,1280), structure_feats)."""
        s = self.encoder_input_size
        img256 = resize_bilinear(img, (s, s))
        return self.encoder(img256, mask)

    def cal_style_codes(self, style_vectors):
        """(B, K, 1280) -> (B, K, n_latent, 512) W+ codes (reference networks.py:223)."""
        codes = jnp.stack(
            [self.mlps[i](style_vectors[:, i]) for i in range(self.num_seg_cls)],
            axis=1,
        )  # (B, K, num_w, 512)
        if self.start_from_latent_avg:
            avg = self.latent_avg.value
            if self.remaining_layer_idx != 17:
                codes = codes + avg[None, None, : self.remaining_layer_idx]
                b, k = codes.shape[0], codes.shape[1]
                tail = jnp.tile(
                    avg[None, None, self.remaining_layer_idx:], (b, k, 1, 1)
                )
                codes = jnp.concatenate([codes, tail], axis=2)
            else:
                codes = codes + avg[None, None]
        return codes

    def gen_img(self, struc_codes, style_codes, mask, *, noise=None,
                regional_mode="exact", return_latents=False):
        images, latent, feats = self.generator(
            style_codes, struc_codes, mask,
            noise=noise, regional_mode=regional_mode, return_latents=return_latents,
        )
        return images, latent, feats

    def __call__(self, img, mask, *, noise=None, regional_mode="exact",
                 return_latents=False):
        style_vectors, structure_feats = self.get_style_vectors(img, mask)
        style_codes = self.cal_style_codes(style_vectors)
        images, latent, feats = self.gen_img(
            structure_feats, style_codes, mask,
            noise=noise, regional_mode=regional_mode, return_latents=return_latents,
        )
        if return_latents:
            return images, feats, latent
        return images, feats
