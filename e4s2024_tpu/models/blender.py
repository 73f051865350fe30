"""Blender — learned face color/lighting transfer at 256^2 (default recolor).

Port of the reference's Blender net (reference swap_face_fine/Blender/
model_center/blener.py:7, inference.py:76-125 `BlenderInfer.infer_image`):

- SPADE-conditioned FPN (`AdaptiveFeatureGenerator`, backbone.py:13): 5
  spectral-norm conv + instance-norm layers to 64^2/512ch, then 3 SPADE
  resblocks conditioned on the input image -> (B, 64, 64, 256) features.
- per-facial-part cross attention from the animated face A to the target T:
  cosine similarity of channel-mean-centered features, softmax * learned tao,
  attending T's part pixels to recolor A's (semantic_tools.py:51-160).
  The reference gathers part pixels via top-k + grid_sample with dynamic
  counts; here it is ONE dense masked attention per part — fixed shapes,
  jit/TPU-clean, numerically the same softmax support.
- 12-channel "packages" (head ref, inpaint ref, masks, grayscale head, bg)
  -> ResUNet (res_u_net.py:60) -> sigmoid RGB.

Inference path only; spectral-norm weights are pre-normalized by the
converter. Mask inputs are 19-class face-parsing maps.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.models.encoders import instance_norm
from e4s2024_tpu.ops.morphology import dilation
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
)

_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_STD = jnp.asarray([0.229, 0.224, 0.225])

# facial part -> 19-class ids (reference semantic_tools.py:163-172)
PART_IDS = {
    "skin": (1,), "hair": (17,), "eye": (4, 5), "nose": (10,),
    "lip": (12, 13), "tooth": (11,), "ear": (7, 8), "brow": (2, 3),
}


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


class SPADE(nn.Module):
    """Instance-norm SPADE ('spadeinstance3x3', reflect padding;
    normalization.py:87-156)."""

    @nn.compact
    def __call__(self, x, seg):
        seg = resize_nearest(seg, (x.shape[1], x.shape[2]))
        normalized = instance_norm(x)

        def rconv(v, feats, name):
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            return nn.Conv(feats, (3, 3), padding="VALID", name=name)(v)

        actv = nn.relu(rconv(seg, 128, "mlp_shared"))
        gamma = rconv(actv, x.shape[-1], "mlp_gamma")
        beta = rconv(actv, x.shape[-1], "mlp_beta")
        return normalized * (1 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    """architecture.py:19-96 (pad_type 'nozero' => reflect)."""

    fout: int

    @nn.compact
    def __call__(self, x, seg):
        fin = x.shape[-1]
        fmiddle = min(fin, self.fout)

        def rconv(v, feats, name, use_bias=True):
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            return nn.Conv(feats, (3, 3), padding="VALID", use_bias=use_bias,
                           name=name)(v)

        if fin != self.fout:
            xs = SPADE(name="norm_s")(x, seg)
            xs = nn.Conv(self.fout, (1, 1), use_bias=False, name="conv_s")(xs)
        else:
            xs = x
        dx = rconv(_lrelu(SPADE(name="norm_0")(x, seg)), fmiddle, "conv_0")
        dx = rconv(_lrelu(SPADE(name="norm_1")(dx, seg)), self.fout, "conv_1")
        return xs + dx


class BlenderFPN(nn.Module):
    """AdaptiveFeatureGenerator (backbone.py:13-81), default flags."""

    @nn.compact
    def __call__(self, img):
        # 'spectralinstance' strips conv biases (reference
        # normalization.py:43-47: bias is meaningless before instance norm)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="layer1")(img)
        x = instance_norm(x)
        x = nn.Conv(128, (3, 3), strides=2, padding=1, use_bias=False,
                    name="layer2")(_lrelu(x))
        x = instance_norm(x)
        x = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                    name="layer3")(_lrelu(x))
        x = instance_norm(x)
        x = nn.Conv(512, (3, 3), strides=2, padding=1, use_bias=False,
                    name="layer4")(_lrelu(x))
        x = instance_norm(x)
        x = nn.Conv(512, (3, 3), padding=1, use_bias=False,
                    name="layer5")(_lrelu(x))
        x = instance_norm(x)
        x = SPADEResnetBlock(512, name="head_0")(x, img)
        x = SPADEResnetBlock(512, name="G_middle_0")(x, img)
        x = SPADEResnetBlock(256, name="G_middle_1")(x, img)
        return x  # (B, 64, 64, 256)


class UNetInputLayer(nn.Module):
    """res_u_net.py:7-27 (conv-bn-relu-conv + 1x1 squeeze residual)."""

    fout: int

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.fout, (1, 1), name="sqz")(x) \
            if x.shape[-1] != self.fout else x
        h = nn.Conv(self.fout, (3, 3), padding=1, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(name="bn1")(h))
        h = nn.Conv(self.fout, (3, 3), padding=1, name="conv2")(h)
        return h + res


class UNetResBlock(nn.Module):
    """res_u_net.py:30-57 (pre-activation resblock)."""

    fout: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.relu(FrozenBatchNorm(name="bn1")(x))
        h = nn.Conv(self.fout, (3, 3), strides=self.stride, padding=1,
                    name="conv1")(h)
        h = nn.relu(FrozenBatchNorm(name="bn2")(h))
        h = nn.Conv(self.fout, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.fout:
            res = nn.Conv(self.fout, (1, 1), strides=self.stride, name="sqz")(x)
        else:
            res = x
        return h + res


class BlenderResUNet(nn.Module):
    """res_u_net.py:60-108 (full variant, 12 -> 3)."""

    @nn.compact
    def __call__(self, pkgs):
        e1 = UNetInputLayer(64, name="input_encoder_layer")(pkgs)
        e2 = UNetResBlock(128, 2, name="res_en_layer2")(e1)
        e3 = UNetResBlock(256, 2, name="res_en_layer3")(e2)
        bridge = UNetResBlock(512, 2, name="res_bridge_layer")(e3)

        def up2(v):
            return resize_bilinear_align_corners(
                v, (2 * v.shape[1], 2 * v.shape[2]))

        d3 = UNetResBlock(256, name="res_de_layer3")(
            jnp.concatenate([up2(bridge), e3], axis=-1))
        d2 = UNetResBlock(128, name="res_de_layer2")(
            jnp.concatenate([up2(d3), e2], axis=-1))
        d1 = UNetResBlock(64, name="res_de_layer1")(
            jnp.concatenate([up2(d2), e1], axis=-1))
        out = nn.Conv(3, (1, 1), name="output_decoder_layer")(d1)
        return nn.sigmoid(out)


def part_masks_19(mask19: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """(B, H, W) 19-class -> {part: (B, H, W) 0/1} + 'head' union
    (semantic_tools.py:175-181)."""
    parts = {}
    for name, ids in PART_IDS.items():
        m = jnp.zeros_like(mask19, dtype=jnp.float32)
        for i in ids:
            m = m + (mask19 == i).astype(jnp.float32)
        parts[name] = jnp.clip(m, 0, 1)
    parts["head"] = jnp.clip(sum(parts.values()), 0, 1)
    return parts


def _masked_part_attention(featA, featT_masked, rgbT, mA, mT, tao):
    """Dense masked cross attention for one part.

    featA/featT_masked: (N, C) channel-centered features; rgbT: (N, 3);
    mA/mT: (N,) 0/1. Returns (N, 3) recolored-A (zero outside A-part)."""
    eps = 1e-8
    na = featA / jnp.maximum(jnp.linalg.norm(featA, axis=-1, keepdims=True), eps)
    nt = featT_masked / jnp.maximum(
        jnp.linalg.norm(featT_masked, axis=-1, keepdims=True), eps)
    sim = na @ nt.T  # (N, N)
    logits = sim * tao + jnp.where(mT[None, :] > 0, 0.0, -1e9)
    att = jax.nn.softmax(logits, axis=-1)
    color = att @ rgbT  # (N, 3)
    has_t = jnp.sum(mT) > 0
    return jnp.where(has_t, color * mA[:, None], 0.0)


class Blender(nn.Module):
    """Full Blender: recolor animated face A with target T's colors.

    Inputs: img_a/img_t (B, 256, 256, 3) ImageNet-normalized;
    mask_a/mask_t (B, 256, 256) int 19-class. Output: RGB in [0, 1].
    """

    @nn.compact
    def __call__(self, img_a, img_t, mask_a, mask_t):
        b = img_a.shape[0]
        fpn = BlenderFPN(name="FPN")
        feats_a = fpn(img_a)
        feats_t = fpn(img_t)
        tao = self.param("trainable_tao", nn.initializers.ones, ())

        parts_a = part_masks_19(mask_a)
        parts_t = part_masks_19(mask_t)

        gray_a = jnp.clip(jnp.einsum(
            "bhwc,c->bhw", jnp.clip(img_a * _STD + _MEAN, 0, 1),
            jnp.asarray([0.299, 0.587, 0.114])), 0, 1) * parts_a["head"]

        def dilate(m):
            k = int(m.shape[-1] * 0.1 / 2) * 2 + 1
            return dilation(m[..., None], k)[..., 0]

        inpaint_t = jnp.clip(dilate(parts_t["head"]) - parts_t["head"], 0, 1)
        e_at = dilate(jnp.clip(parts_a["head"] + parts_t["head"], 0, 1))
        inpaint_a = jnp.clip(e_at - parts_a["head"], 0, 1)
        img_bg = jnp.clip(img_t * _STD + _MEAN, 0, 1) * (1 - e_at[..., None])
        parts_a = {**parts_a, "inpainting": inpaint_a}
        parts_t = {**parts_t, "inpainting": inpaint_t}

        # 64^2 dense attention per part
        s64 = feats_a.shape[1]
        rgb_t64 = jnp.clip(resize_nearest(img_t, (s64, s64)) * _STD + _MEAN, 0, 1)
        n = s64 * s64

        head_ref = jnp.zeros((b, n, 3))
        inpaint_ref = jnp.zeros((b, n, 3))
        for name in list(PART_IDS.keys()) + ["inpainting"]:
            mA64 = resize_nearest(parts_a[name][..., None], (s64, s64))[..., 0]
            mT64 = resize_nearest(parts_t[name][..., None], (s64, s64))[..., 0]
            fa = feats_a.reshape(b, n, -1)
            # faithful to reference semantic_tools.py:105: T features are
            # multiplied by A's mask before sampling
            ft = (feats_t * mA64[..., None]).reshape(b, n, -1)
            fa = fa * mA64.reshape(b, n, 1)
            fa = fa - jnp.mean(fa, axis=-1, keepdims=True)
            ft = ft - jnp.mean(ft, axis=-1, keepdims=True)
            ref = jax.vmap(_masked_part_attention, in_axes=(0, 0, 0, 0, 0, None))(
                fa, ft, rgb_t64.reshape(b, n, 3),
                mA64.reshape(b, n), mT64.reshape(b, n), tao)
            if name == "inpainting":
                inpaint_ref = ref
            else:
                head_ref = head_ref + ref

        head_ref = head_ref.reshape(b, s64, s64, 3)
        inpaint_ref = inpaint_ref.reshape(b, s64, s64, 3)
        size = img_a.shape[1]
        refs = resize_bilinear_align_corners(
            jnp.concatenate([head_ref, inpaint_ref], axis=-1), (size, size))
        packages = jnp.concatenate([
            refs,
            parts_a["head"][..., None],
            inpaint_a[..., None],
            gray_a[..., None],
            img_bg,
        ], axis=-1)  # (B, 256, 256, 12)
        pred = BlenderResUNet(name="unet")(packages)
        return pred, packages


class BlenderRecolorer:
    """The BlenderInfer.infer_image path (inference.py:97-125): resize inputs
    to 256, ImageNet-normalize, run, return [0, 255] RGB."""

    def __init__(self, params: dict):
        from e4s2024_tpu.utils.packing import pack_pytree, unpack_pytree

        self.model = Blender()
        self.params = params
        self._packed, meta = pack_pytree(params)

        def fwd(packed, ia, it, ma, mt):
            from e4s2024_tpu.ops.resize import resize_bilinear

            p = unpack_pytree(packed, meta)

            def prep(img):
                img = img.astype(jnp.float32) / 255.0
                if img.shape[1] != 256:
                    img = resize_bilinear(img, (256, 256))
                return (img - _MEAN) / _STD

            def prep_mask(m):
                m = m[..., None]
                if m.shape[1] != 256:
                    m = resize_nearest(m, (256, 256))
                return m[..., 0]

            out = self.model.apply({"params": p}, prep(ia), prep(it),
                                   prep_mask(ma), prep_mask(mt))[0]
            return jnp.clip(out * 255.0, 0, 255)

        # one jitted program, packed params (per-leaf arg marshalling + eager
        # pre/post glue cost milliseconds per call on tunneled transports)
        self._fwd = jax.jit(fwd)

    def recolor(self, img_a255, img_t255, mask_a19, mask_t19):
        return self._fwd(self._packed, jnp.asarray(img_a255),
                         jnp.asarray(img_t255), jnp.asarray(mask_a19),
                         jnp.asarray(mask_t19))
