"""RealESRGAN (RRDBNet) super-resolution in Flax.

Port of the reference's RealESRGAN x4 upscaler (reference
swap_face_fine/realesr/image_infer.py:39: RRDBNet(3, 3, 64, 23, 32, scale=4);
used to upscale the Blender recolor output back to 1024^2,
Face_swap_with_two_imgs.py:533): residual-in-residual dense blocks with 0.2
residual scaling, nearest-upsample + conv head.

Inference-only; checkpoint converter in e4s2024_tpu.convert.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s2024_tpu.ops.resize import resize_nearest


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow: int = 32

    @nn.compact
    def __call__(self, x):
        c = [x]
        for i in range(4):
            out = nn.Conv(self.num_grow, (3, 3), padding=1, name=f"conv{i + 1}")(
                jnp.concatenate(c, axis=-1))
            c.append(_lrelu(out))
        out = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv5")(
            jnp.concatenate(c, axis=-1))
        return x + 0.2 * out


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow, name="rdb3")(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    """x4 SR net. Input (B, H, W, 3) in [0, 1] -> (B, 4H, 4W, 3)."""

    num_feat: int = 64
    num_block: int = 23
    num_grow: int = 32

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow, name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_body")(body)
        feat = feat + body
        h, w = feat.shape[1], feat.shape[2]
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_up1")(
            resize_nearest(feat, (2 * h, 2 * w))))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_up2")(
            resize_nearest(feat, (4 * h, 4 * w))))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_hr")(feat))
        return nn.Conv(3, (3, 3), padding=1, name="conv_last")(feat)


class RealESRGANUpscaler:
    """x4 upscale of [0,255] uint8/float images (reference RealESRBatchInfer,
    realesr/image_infer.py:87)."""

    def __init__(self, params: dict, model: RRDBNet | None = None):
        from e4s2024_tpu.utils.packing import pack_pytree, unpack_pytree

        self.model = model or RRDBNet()
        self.params = params
        self._packed, meta = pack_pytree(params)
        self._fwd = jax.jit(lambda packed, x: self.model.apply(
            {"params": unpack_pytree(packed, meta)},
            x.astype(jnp.float32) / 255.0))

    def upscale(self, img255: jnp.ndarray) -> jnp.ndarray:
        out = self._fwd(self._packed, jnp.asarray(img255))
        return jnp.clip(out * 255.0, 0, 255)
