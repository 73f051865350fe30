"""DaGAN (Depth-Aware Generative Adversarial Network) reenactment in Flax.

Parity target: the reference's `swap_face_fine/DaGAN/` — FOMM-style keypoints
with jacobians on a depth-augmented input (`modules/keypoint_detector.py:7`),
first-order dense motion (`modules/dense_motion.py:9`), the
`DepthAwareGenerator` with depth self-attention (`modules/generator.py:56,92`
— the variant `face_swap_for_video.py:319` selects), and the monodepth2
depth network (`depth/resnet_encoder.py:62` ResnetEncoder(50) +
`depth/depth_decoder.py:17` DepthDecoder), driven by
`drive_demo.py:59 make_animation` (kp_driving used directly; normalize_kp is
commented out there). The reference's checkpoints live on an internal
cluster (face_swap_for_video.py:311-313), so converted weights must be
supplied (`convert.torch_loader.convert_dagan`).

TPU notes: all K+1 sparse warps run as one folded-batch grid_sample; the
depth attention at 64x64 is a single (4096 x 4096) MXU matmul; BatchNorms are
frozen (eval mode). Blocks are shared with facevid2vid (same FOMM lineage).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.models.facevid2vid import (
    AntiAliasDownsample,
    DownBlock2d,
    SameBlock2d,
    UpBlock2d,
)
from e4s2024_tpu.models.tpsmm import grid_sample_2d, kp2gaussian2d, make_grid_2d
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear, resize_nearest


class DaGANResBlock2d(nn.Module):
    """FOMM ResBlock2d (DaGAN util.py:52): BN-relu-conv twice, residual."""

    features: int

    @nn.compact
    def __call__(self, x):
        r = nn.relu(FrozenBatchNorm(name="norm1")(x))
        r = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(r)
        r = nn.relu(FrozenBatchNorm(name="norm2")(r))
        r = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(r)
        return x + r


class DaGANHourglass(nn.Module):
    """FOMM hourglass (DaGAN util.py:241): returns the final concat feature
    with out_filters = block_expansion + in_features."""

    block_expansion: int
    num_blocks: int = 5
    max_features: int = 1024

    @nn.compact
    def __call__(self, x):
        be, mf = self.block_expansion, self.max_features
        enc = [x]
        for i in range(self.num_blocks):
            enc.append(DownBlock2d(min(mf, be * 2 ** (i + 1)),
                                   name=f"down{i}")(enc[-1]))
        out = enc.pop()
        for j, i in enumerate(range(self.num_blocks)[::-1]):
            out = UpBlock2d(min(mf, be * 2 ** i), name=f"up{j}")(out)
            out = jnp.concatenate([out, enc.pop()], axis=-1)
        return out


class DaGANKPDetector(nn.Module):
    """Keypoints + jacobians from the depth-augmented image (reference
    keypoint_detector.py:7; input = cat(rgb, disparity) -> 4 channels)."""

    num_kp: int = 15
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    scale_factor: float = 0.25
    estimate_jacobian: bool = True
    # vox-adv config leaves KPDetector pad at its default 0 (the 7x7 head
    # shrinks the 64x64 map to 58x58, as in FOMM)
    pad: int = 0

    @nn.compact
    def __call__(self, x):
        if self.scale_factor != 1:
            x = AntiAliasDownsample(self.scale_factor, name="down")(x)
        feat = DaGANHourglass(self.block_expansion, self.num_blocks,
                              self.max_features, name="predictor")(x)
        pred = nn.Conv(self.num_kp, (7, 7), padding=self.pad, name="kp")(feat)
        b, h, w, k = pred.shape
        heat = jax.nn.softmax(
            pred.reshape(b, h * w, k) / self.temperature, axis=1)
        heat = heat.reshape(b, h, w, k)

        grid = make_grid_2d(h, w)          # (h, w, 2)
        value = jnp.einsum("bhwk,hwd->bkd", heat, grid)
        out = {"value": value}

        if self.estimate_jacobian:
            jac_map = nn.Conv(
                4 * self.num_kp, (7, 7), padding=self.pad,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.tile(
                    jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype), self.num_kp),
                name="jacobian")(feat)
            jac_map = jac_map.reshape(b, h, w, k, 4)
            jac = jnp.einsum("bhwk,bhwkj->bkj", heat, jac_map)
            out["jacobian"] = jac.reshape(b, k, 2, 2)
        return out


class DaGANDenseMotion(nn.Module):
    """First-order dense motion (reference dense_motion.py:9): K sparse
    affine warps (jacobian term) + identity, mask-softmax combined."""

    num_kp: int = 15
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 1024
    num_blocks: int = 5
    scale_factor: float = 0.25
    kp_variance: float = 0.01
    estimate_occlusion_map: bool = True

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source):
        k = self.num_kp
        if self.scale_factor != 1:
            source_image = AntiAliasDownsample(self.scale_factor,
                                               name="down")(source_image)
        b, h, w, c = source_image.shape

        heat = kp2gaussian2d(kp_driving["value"], (h, w), self.kp_variance) \
            - kp2gaussian2d(kp_source["value"], (h, w), self.kp_variance)
        heat = jnp.concatenate([jnp.zeros((b, h, w, 1)), heat], axis=-1)

        # sparse motions (Eq 4): z - kp_d, jacobian-rotated, + kp_s
        ident = make_grid_2d(h, w)[None, None]              # (1, 1, h, w, 2)
        coord = ident - kp_driving["value"][:, :, None, None, :]
        if "jacobian" in kp_driving:
            jac = jnp.einsum("bkij,bkjl->bkil", kp_source["jacobian"],
                             jnp.linalg.inv(kp_driving["jacobian"]))
            coord = jnp.einsum("bkij,bkhwj->bkhwi", jac, coord)
        driving_to_source = coord + kp_source["value"][:, :, None, None, :]
        sparse = jnp.concatenate(
            [jnp.broadcast_to(ident, (b, 1, h, w, 2)), driving_to_source], 1)

        src_rep = jnp.broadcast_to(source_image[:, None],
                                   (b, k + 1, h, w, c)).reshape(-1, h, w, c)
        deformed = grid_sample_2d(src_rep, sparse.reshape(-1, h, w, 2),
                                  align_corners=False)
        deformed = deformed.reshape(b, k + 1, h, w, c)

        inp = jnp.concatenate(
            [heat[..., None], deformed.transpose(0, 2, 3, 1, 4)], axis=-1)
        inp = inp.reshape(b, h, w, (k + 1) * (c + 1))
        pred = DaGANHourglass(self.block_expansion, self.num_blocks,
                              self.max_features, name="hourglass")(inp)

        mask = jax.nn.softmax(
            nn.Conv(k + 1, (7, 7), padding=3, name="mask")(pred), axis=-1)
        deformation = jnp.einsum("bkhwd,bhwk->bhwd", sparse, mask)

        out = {"deformation": deformation, "mask": mask,
               "sparse_deformed": deformed}
        if self.estimate_occlusion_map:
            out["occlusion_map"] = jax.nn.sigmoid(
                nn.Conv(1, (7, 7), padding=3, name="occlusion")(pred))
        return out


class DepthAwareAttention(nn.Module):
    """Depth-guided self-attention (reference generator.py:56): queries from
    the depth feature, keys/values from the warped image feature."""

    features: int

    @nn.compact
    def __call__(self, source, feat):
        b, h, w, c = feat.shape
        q = nn.relu(nn.Conv(c // 8, (1, 1), name="query_conv")(source))
        kk = nn.relu(nn.Conv(c // 8, (1, 1), name="key_conv")(feat))
        v = nn.relu(nn.Conv(c, (1, 1), name="value_conv")(feat))
        energy = jnp.einsum("bnc,bmc->bnm", q.reshape(b, h * w, -1),
                            kk.reshape(b, h * w, -1))
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v.reshape(b, h * w, c))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out.reshape(b, h, w, c) + feat, attn


class DepthAwareGenerator(nn.Module):
    """Occlusion-aware generator with a depth encoder branch (reference
    generator.py:92, vox-adv config: be 64, mf 512, 2 down blocks, 6
    bottleneck blocks, occlusion on)."""

    num_kp: int = 15
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    dense_motion: dict | None = None

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source, source_depth):
        be, mf, nd = self.block_expansion, self.max_features, \
            self.num_down_blocks

        out = SameBlock2d(be, kernel=7, name="first")(source_image)
        for i in range(nd):
            out = DownBlock2d(min(mf, be * 2 ** (i + 1)),
                              name=f"down{i}")(out)

        src = SameBlock2d(be, kernel=7, name="src_first")(source_depth)
        for i in range(nd):
            src = DownBlock2d(min(mf, be * 2 ** (i + 1)),
                              name=f"src_down{i}")(src)

        dm = DaGANDenseMotion(num_kp=self.num_kp,
                              num_channels=self.num_channels,
                              **(self.dense_motion or {}),
                              name="dense_motion_network")(
            source_image, kp_driving, kp_source)

        deformation = dm["deformation"]

        def deform(inp):
            d = deformation
            if (d.shape[1], d.shape[2]) != (inp.shape[1], inp.shape[2]):
                d = resize_bilinear(d, (inp.shape[1], inp.shape[2]))
            return grid_sample_2d(inp, d, align_corners=False)

        out = deform(out)
        occ = dm.get("occlusion_map")
        if occ is not None:
            if (occ.shape[1], occ.shape[2]) != (out.shape[1], out.shape[2]):
                occ = resize_bilinear(occ, (out.shape[1], out.shape[2]))
            out = out * occ
        out, attention = DepthAwareAttention(out.shape[-1],
                                             name="AttnModule")(src, out)

        for i in range(self.num_bottleneck_blocks):
            out = DaGANResBlock2d(out.shape[-1], name=f"bottleneck_r{i}")(out)
        for i in range(nd):
            out = UpBlock2d(min(mf, be * 2 ** (nd - i - 1)),
                            name=f"up{i}")(out)
        out = nn.Conv(self.num_channels, (7, 7), padding=3,
                      name="final")(out)
        return {"prediction": jax.nn.sigmoid(out),
                "deformed": deform(source_image),
                "occlusion_map": dm.get("occlusion_map"),
                "attention": attention}


# -------------------------------------------------------- monodepth2 depth


class _Bottleneck(nn.Module):
    """torchvision resnet Bottleneck (1x1 -> 3x3 -> 1x1 x4), frozen BN."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        r = nn.relu(FrozenBatchNorm(name="bn1")(r))
        r = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(r)
        r = nn.relu(FrozenBatchNorm(name="bn2")(r))
        r = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    name="conv3")(r)
        r = FrozenBatchNorm(name="bn3")(r)
        if x.shape[-1] != self.features * 4 or self.stride != 1:
            sc = nn.Conv(self.features * 4, (1, 1), strides=self.stride,
                         use_bias=False, name="down_conv")(x)
            sc = FrozenBatchNorm(name="down_bn")(sc)
        else:
            sc = x
        return nn.relu(sc + r)


class DepthResnetEncoder(nn.Module):
    """monodepth2 ResnetEncoder(50) (reference depth/resnet_encoder.py:62):
    returns the 5 feature scales; input normalized (x - 0.45) / 0.225."""

    layers: tuple = (3, 4, 6, 3)  # resnet50

    @nn.compact
    def __call__(self, img01):
        x = (img01 - 0.45) / 0.225
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        feats = [x]
        x = max_pool2d(x, 3, 2, padding=1)
        for li, (n, f) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = _Bottleneck(f, stride=stride,
                                name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
        return feats


class DepthDecoder(nn.Module):
    """monodepth2 DepthDecoder (reference depth/depth_decoder.py:17): only
    the full-resolution disparity head ('disp', 0) is needed at inference."""

    num_ch_dec: tuple = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, features):
        def cb(x, feats, name):
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            x = nn.Conv(feats, (3, 3), padding="VALID", name=name)(x)
            return jax.nn.elu(x)

        x = features[-1]
        for i in range(4, -1, -1):
            x = cb(x, self.num_ch_dec[i], f"upconv_{i}_0")
            x = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = cb(x, self.num_ch_dec[i], f"upconv_{i}_1")
        disp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        disp = nn.Conv(1, (3, 3), padding="VALID", name="dispconv_0")(disp)
        return jax.nn.sigmoid(disp)


class DaGANDriver:
    """Host wrapper (reference drive_demo.py:59 make_animation: depth maps
    for both frames, keypoints on cat(rgb, disp), depth-aware generation).

    params: {"depth_encoder", "depth_decoder", "kp_detector", "generator"}."""

    def __init__(self, params: dict, num_kp: int = 15,
                 dense_motion: dict | None = None):
        self.enc = DepthResnetEncoder()
        self.dec = DepthDecoder()
        self.kp = DaGANKPDetector(num_kp=num_kp)
        self.gen = DepthAwareGenerator(num_kp=num_kp,
                                       dense_motion=dense_motion)
        self.params = params
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        # packed params: per-leaf arg marshalling costs ~10 us/leaf/call
        self._animate = jit_with_packed_params(self._animate_p, params)

    def _depth(self, params, img01):
        feats = self.enc.apply({"params": params["depth_encoder"]}, img01)
        return self.dec.apply({"params": params["depth_decoder"]}, feats)

    def _animate_p(self, params, source01, driving01):
        d_src = self._depth(params, source01)
        d_drv = self._depth(params, driving01)
        kp_s = self.kp.apply({"params": params["kp_detector"]},
                             jnp.concatenate([source01, d_src], -1))
        kp_d = self.kp.apply({"params": params["kp_detector"]},
                             jnp.concatenate([driving01, d_drv], -1))
        out = self.gen.apply({"params": params["generator"]},
                             source01, kp_d, kp_s, d_src)
        return out["prediction"]

    def __call__(self, source01: jnp.ndarray,
                 driving01: jnp.ndarray) -> jnp.ndarray:
        """source01/driving01: (B, 256, 256, 3) in [0,1] -> reenacted
        source in [0,1]."""
        return self._animate(source01, driving01)
