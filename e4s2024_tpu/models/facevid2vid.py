"""faceVid2Vid (One-Shot Free-View Neural Talking Head) reenactment in Flax.

Port of the reference's pose/expression driver (reference
swap_face_fine/face_vid2vid/: modules/keypoint_detector.py:9 `KPDetector`,
:86 `HEEstimator`, modules/dense_motion.py:9 `DenseMotionNetwork`,
modules/generator.py:161 `OcclusionAwareSPADEGenerator`, drive_demo.py:21-278):
canonical 3D keypoints + head-pose/expression transforms drive a 3D feature
volume through a dense motion field with occlusion-aware SPADE decoding.

Config = the public vox-256 settings (num_kp 15, feature_channel 32,
estimate_jacobian False, SPADE generator), the combination the reference loads
(drive_demo.py:21-58 with gen='spade').

Layouts: 2D features NHWC, 3D feature volumes NDHWC. SyncBatchNorm runs on
stored statistics (inference mode).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.ops.resize import resize_bilinear, resize_nearest

# ------------------------------------------------------------------ samplers


def make_grid_3d(d: int, h: int, w: int) -> jnp.ndarray:
    """(D, H, W, 3) xyz grid in [-1, 1] (reference util.py:55
    make_coordinate_grid, align-corners style)."""
    z = 2 * (jnp.arange(d) / (d - 1)) - 1
    y = 2 * (jnp.arange(h) / (h - 1)) - 1
    x = 2 * (jnp.arange(w) / (w - 1)) - 1
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling, torch F.grid_sample semantics (align_corners=False,
    zero padding). vol: (B, D, H, W, C); grid: (B, Dg, Hg, Wg, 3) xyz."""
    b, d, h, w, c = vol.shape

    def unnorm(g, size):
        return ((g + 1.0) * size - 1.0) / 2.0

    xs = unnorm(grid[..., 0], w)
    ys = unnorm(grid[..., 1], h)
    zs = unnorm(grid[..., 2], d)

    def tap(bi, zi, yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                 & (zi >= 0) & (zi < d))
        v = vol[bi,
                jnp.clip(zi, 0, d - 1),
                jnp.clip(yi, 0, h - 1),
                jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    z0 = jnp.floor(zs).astype(jnp.int32)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]
    tz = (zs - z0)[..., None]
    bi = jnp.arange(b)[:, None, None, None]

    out = 0.0
    for dz, wz in ((z0, 1 - tz), (z0 + 1, tz)):
        for dy, wy in ((y0, 1 - ty), (y0 + 1, ty)):
            for dx, wx in ((x0, 1 - tx), (x0 + 1, tx)):
                out = out + tap(bi, dz, dy, dx) * (wz * wy * wx)
    return out


def kp2gaussian3d(kp_value: jnp.ndarray, size: tuple, var: float = 0.01):
    """(B, K, 3) keypoints -> (B, K, D, H, W) gaussians (reference util.py:13)."""
    d, h, w = size
    grid = make_grid_3d(d, h, w)[None, None]
    mean = kp_value[:, :, None, None, None, :]
    return jnp.exp(-0.5 * jnp.sum(jnp.square(grid - mean), -1) / var)


# ------------------------------------------------------------------ blocks


def _relu(x):
    return jnp.maximum(x, 0)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)  # torch nn.LeakyReLU() default


class SameBlock2d(nn.Module):
    features: int
    kernel: int = 3
    lrelu: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.kernel // 2, name="conv")(x)
        x = FrozenBatchNorm(name="norm")(x)
        return _lrelu(x) if self.lrelu else _relu(x)


class DownBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv")(x)
        x = _relu(FrozenBatchNorm(name="norm")(x))
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))


class UpBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv")(x)
        return _relu(FrozenBatchNorm(name="norm")(x))


class DownBlock3d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3), padding=1, name="conv")(x)
        x = _relu(FrozenBatchNorm(name="norm")(x))
        b, d, h, w, c = x.shape
        return x.reshape(b, d, h // 2, 2, w // 2, 2, c).mean((3, 5))


class UpBlock3d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = nn.Conv(self.features, (3, 3, 3), padding=1, name="conv")(x)
        return _relu(FrozenBatchNorm(name="norm")(x))


class ResBlock3d(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = _relu(FrozenBatchNorm(name="norm1")(x))
        h = nn.Conv(c, (3, 3, 3), padding=1, name="conv1")(h)
        h = _relu(FrozenBatchNorm(name="norm2")(h))
        h = nn.Conv(c, (3, 3, 3), padding=1, name="conv2")(h)
        return x + h


class ResBottleneck(nn.Module):
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c // 4, (1, 1), name="conv1")(x)
        h = _relu(FrozenBatchNorm(name="norm1")(h))
        h = nn.Conv(c // 4, (3, 3), strides=self.stride, padding=1,
                    name="conv2")(h)
        h = _relu(FrozenBatchNorm(name="norm2")(h))
        h = nn.Conv(c, (1, 1), name="conv3")(h)
        h = FrozenBatchNorm(name="norm3")(h)
        if self.stride != 1:
            x = nn.Conv(c, (1, 1), strides=self.stride, name="skip")(x)
            x = FrozenBatchNorm(name="norm4")(x)
        return _relu(h + x)


class Hourglass3d(nn.Module):
    """3D hourglass with skip concats (reference util.py:262-330)."""

    block_expansion: int
    num_blocks: int = 5
    max_features: int = 1024

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        outs = [x]
        for i in range(self.num_blocks):
            f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            outs.append(DownBlock3d(f, name=f"down_{i}")(outs[-1]))
        out = outs.pop()
        for i in range(self.num_blocks)[::-1]:
            f = min(self.max_features, self.block_expansion * (2 ** i))
            out = UpBlock3d(f, name=f"up_{self.num_blocks - 1 - i}")(out)
            out = jnp.concatenate([out, outs.pop()], axis=-1)
        out = nn.Conv(self.block_expansion + in_features, (3, 3, 3), padding=1,
                      name="conv")(out)
        return _relu(FrozenBatchNorm(name="norm")(out))


class KPHourglass(nn.Module):
    """2D downs -> reshape to 3D -> 3D ups (reference util.py:335-368)."""

    block_expansion: int = 32
    num_blocks: int = 5
    max_features: int = 1024
    reshape_features: int = 16384
    reshape_depth: int = 16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            x = DownBlock2d(f, name=f"down_{i}")(x)
        x = nn.Conv(self.reshape_features, (1, 1), name="conv")(x)
        b, h, w, c = x.shape
        # torch view(b, c//depth, depth, h, w): depth is the minor factor
        x = x.reshape(b, h, w, c // self.reshape_depth, self.reshape_depth)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # (B, D, H, W, C')
        for i in range(self.num_blocks):
            f = min(self.max_features,
                    self.block_expansion * (2 ** (self.num_blocks - i - 1)))
            x = UpBlock3d(f, name=f"up_{i}")(x)
        return x


class AntiAliasDownsample(nn.Module):
    """Band-limited 4x downsample (reference util.py:372-415, scale 0.25)."""

    scale: float = 0.25

    @nn.compact
    def __call__(self, x):
        sigma = (1 / self.scale - 1) / 2
        ks = 2 * round(sigma * 4) + 1
        t = np.arange(ks, dtype=np.float64)
        g = np.exp(-((t - (ks - 1) / 2) ** 2) / (2 * sigma**2))
        k2 = np.outer(g, g)
        k2 /= k2.sum()
        c = x.shape[-1]
        kern = jnp.asarray(k2, x.dtype)[:, :, None, None]
        ka = ks // 2
        out = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (ka, ka), (ka, ka), (0, 0))),
            jnp.tile(kern, (1, 1, 1, c)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        step = int(1 / self.scale)
        return out[:, ::step, ::step]


# ------------------------------------------------------------------ models


class KPDetector(nn.Module):
    """Canonical 3D keypoints (reference keypoint_detector.py:9)."""

    num_kp: int = 15
    temperature: float = 0.1
    block_expansion: int = 32
    max_features: int = 1024
    reshape_features: int = 16384
    reshape_depth: int = 16

    @nn.compact
    def __call__(self, x):
        x = AntiAliasDownsample(name="down")(x)
        feat = KPHourglass(self.block_expansion, 5, self.max_features,
                           self.reshape_features, self.reshape_depth,
                           name="predictor")(x)  # (B, D, H, W, C)
        pred = nn.Conv(self.num_kp, (3, 3, 3), padding=1, name="kp")(feat)
        b, d, h, w, k = pred.shape
        heat = jax.nn.softmax(
            pred.reshape(b, -1, k) / self.temperature, axis=1
        ).reshape(b, d, h, w, k)
        grid = make_grid_3d(d, h, w)[None, ..., None, :]  # (1,D,H,W,1,3)
        value = jnp.sum(heat[..., None] * grid, axis=(1, 2, 3))  # (B, K, 3)
        return {"value": value}


class HEEstimator(nn.Module):
    """Head pose + expression (reference keypoint_detector.py:86)."""

    num_kp: int = 15
    num_bins: int = 66
    block_expansion: int = 64
    width: int = 256  # base bottleneck width (256 in vox-256)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_expansion, (7, 7), strides=2, padding=3,
                    name="conv1")(x)
        x = _relu(FrozenBatchNorm(name="norm1")(x))
        from e4s2024_tpu.ops.pool import max_pool2d
        x = max_pool2d(x, 3, 2, padding=1)
        x = nn.Conv(self.width, (1, 1), name="conv2")(x)
        x = _relu(FrozenBatchNorm(name="norm2")(x))
        for i in range(3):
            x = ResBottleneck(name=f"block1_{i}")(x)
        x = nn.Conv(2 * self.width, (1, 1), name="conv3")(x)
        x = _relu(FrozenBatchNorm(name="norm3")(x))
        x = ResBottleneck(stride=2, name="block2")(x)
        for i in range(3):
            x = ResBottleneck(name=f"block3_{i}")(x)
        x = nn.Conv(4 * self.width, (1, 1), name="conv4")(x)
        x = _relu(FrozenBatchNorm(name="norm4")(x))
        x = ResBottleneck(stride=2, name="block4")(x)
        for i in range(5):
            x = ResBottleneck(name=f"block5_{i}")(x)
        x = nn.Conv(8 * self.width, (1, 1), name="conv5")(x)
        x = _relu(FrozenBatchNorm(name="norm5")(x))
        x = ResBottleneck(stride=2, name="block6")(x)
        for i in range(2):
            x = ResBottleneck(name=f"block7_{i}")(x)
        x = jnp.mean(x, axis=(1, 2))
        # NOTE: the reference crosses the yaw/roll heads (keypoint_detector.py
        # :173-175 returns fc_roll as 'yaw' and fc_yaw as 'roll') — replicated
        # for checkpoint parity.
        return {
            "yaw": nn.Dense(self.num_bins, name="fc_roll")(x),
            "pitch": nn.Dense(self.num_bins, name="fc_pitch")(x),
            "roll": nn.Dense(self.num_bins, name="fc_yaw")(x),
            "t": nn.Dense(3, name="fc_t")(x),
            "exp": nn.Dense(3 * self.num_kp, name="fc_exp")(x),
        }


class DenseMotionNetwork(nn.Module):
    """Sparse keypoint motions -> dense 3D deformation + occlusion
    (reference dense_motion.py:9)."""

    num_kp: int = 15
    compress: int = 4
    block_expansion: int = 32
    num_blocks: int = 5
    max_features: int = 1024
    reshape_depth: int = 16

    @nn.compact
    def __call__(self, feature, kp_driving, kp_source):
        b, d, h, w, _ = feature.shape
        feat = nn.Conv(self.compress, (1, 1, 1), name="compress")(feature)
        feat = _relu(FrozenBatchNorm(name="norm")(feat))

        # sparse motions (identity + per-kp driving->source)
        ident = make_grid_3d(d, h, w)[None, None]           # (1,1,D,H,W,3)
        coord = ident - kp_driving["value"][:, :, None, None, None, :]
        d2s = coord + kp_source["value"][:, :, None, None, None, :]
        sparse = jnp.concatenate(
            [jnp.tile(ident, (b, 1, 1, 1, 1, 1)), d2s], axis=1
        )  # (B, K+1, D, H, W, 3)

        # deformed features per motion
        k1 = self.num_kp + 1
        feat_rep = jnp.tile(feat[:, None], (1, k1, 1, 1, 1, 1)).reshape(
            b * k1, d, h, w, self.compress)
        deformed = grid_sample_3d(
            feat_rep, sparse.reshape(b * k1, d, h, w, 3)
        ).reshape(b, k1, d, h, w, self.compress)

        # heatmaps
        gd = kp2gaussian3d(kp_driving["value"], (d, h, w))
        gs = kp2gaussian3d(kp_source["value"], (d, h, w))
        heat = gd - gs                                      # (B, K, D, H, W)
        heat = jnp.concatenate(
            [jnp.zeros((b, 1, d, h, w)), heat], axis=1)[..., None]

        # (B, K+1, D, H, W, 1+compress) -> channels (K+1)*(1+c), K major
        inp = jnp.concatenate([heat, deformed], axis=-1)
        inp = jnp.moveaxis(inp, 1, 4)                       # (B, D, H, W, K+1, 1+c)
        inp = inp.reshape(b, d, h, w, k1 * (1 + self.compress))

        pred = Hourglass3d(self.block_expansion, self.num_blocks,
                           self.max_features, name="hourglass")(inp)

        mask = nn.Conv(k1, (7, 7, 7), padding=3, name="mask")(pred)
        mask = jax.nn.softmax(mask, axis=-1)                # (B, D, H, W, K+1)
        deformation = jnp.einsum("bkdhwc,bdhwk->bdhwc", sparse, mask)
        out = {"mask": mask, "deformation": deformation}

        # occlusion: torch view(b, c*d, h, w), c-major
        p2 = jnp.transpose(pred, (0, 2, 3, 4, 1)).reshape(
            b, h, w, pred.shape[-1] * d)
        occ = nn.Conv(1, (7, 7), padding=3, name="occlusion")(p2)
        out["occlusion_map"] = nn.sigmoid(occ)
        return out


class FV2VSPADE(nn.Module):
    @nn.compact
    def __call__(self, x, seg):
        from e4s2024_tpu.models.encoders import instance_norm

        seg = resize_nearest(seg, (x.shape[1], x.shape[2]))
        normalized = instance_norm(x)
        actv = _relu(nn.Conv(128, (3, 3), padding=1, name="mlp_shared")(seg))
        gamma = nn.Conv(x.shape[-1], (3, 3), padding=1, name="mlp_gamma")(actv)
        beta = nn.Conv(x.shape[-1], (3, 3), padding=1, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class FV2VSPADEResBlock(nn.Module):
    fout: int

    @nn.compact
    def __call__(self, x, seg):
        fin = x.shape[-1]
        fmiddle = min(fin, self.fout)
        if fin != self.fout:
            xs = FV2VSPADE(name="norm_s")(x, seg)
            xs = nn.Conv(self.fout, (1, 1), use_bias=False, name="conv_s")(xs)
        else:
            xs = x

        def act(v):
            return jnp.where(v >= 0, v, 0.2 * v)

        dx = nn.Conv(fmiddle, (3, 3), padding=1, name="conv_0")(
            act(FV2VSPADE(name="norm_0")(x, seg)))
        dx = nn.Conv(self.fout, (3, 3), padding=1, name="conv_1")(
            act(FV2VSPADE(name="norm_1")(dx, seg)))
        return xs + dx


class SPADEDecoder(nn.Module):
    """(reference generator.py:124-158)."""

    ic: int = 256
    oc: int = 64

    @nn.compact
    def __call__(self, feature):
        seg = feature
        x = nn.Conv(2 * self.ic, (3, 3), padding=1, name="fc")(feature)
        for i in range(6):
            x = FV2VSPADEResBlock(2 * self.ic, name=f"G_middle_{i}")(x, seg)
        x = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = FV2VSPADEResBlock(self.ic, name="up_0")(x, seg)
        x = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = FV2VSPADEResBlock(self.oc, name="up_1")(x, seg)
        x = nn.Conv(3, (3, 3), padding=1, name="conv_img")(
            jnp.where(x >= 0, x, 0.2 * x))
        return nn.sigmoid(x)


class OcclusionAwareSPADEGenerator(nn.Module):
    """(reference generator.py:161-250). vox-256: block_expansion 64,
    max_features 512, num_down_blocks 2, reshape (32, 16), 6 resblocks."""

    num_kp: int = 15
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    reshape_channel: int = 32
    reshape_depth: int = 16
    num_resblocks: int = 6
    dm_block_expansion: int = 32
    dm_max_features: int = 1024
    decoder_ic: int = 256

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source):
        x = SameBlock2d(self.block_expansion, 3, name="first")(source_image)
        for i in range(self.num_down_blocks):
            f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            x = DownBlock2d(f, name=f"down_blocks_{i}")(x)
        x = nn.Conv(self.max_features, (1, 1), name="second")(x)
        b, h, w, c = x.shape
        # torch view(b, 32, 16, h, w): depth is the minor channel factor
        f3d = x.reshape(b, h, w, self.reshape_channel, self.reshape_depth)
        f3d = jnp.transpose(f3d, (0, 4, 1, 2, 3))  # (B, 16, h, w, 32)
        for i in range(self.num_resblocks):
            f3d = ResBlock3d(name=f"resblocks_3d_{i}")(f3d)

        dense = DenseMotionNetwork(num_kp=self.num_kp,
                                   block_expansion=self.dm_block_expansion,
                                   max_features=self.dm_max_features,
                                   reshape_depth=self.reshape_depth,
                                   name="dense_motion_network")(
            f3d, kp_driving, kp_source)
        deformed = grid_sample_3d(f3d, dense["deformation"])
        bb, d, hh, ww, cc = deformed.shape
        out = jnp.transpose(deformed, (0, 2, 3, 4, 1)).reshape(bb, hh, ww, cc * d)
        out = SameBlock2d(self.block_expansion * (2 ** self.num_down_blocks),
                          3, lrelu=True, name="third")(out)
        out = nn.Conv(out.shape[-1], (1, 1), name="fourth")(out)
        occ = dense["occlusion_map"]
        if occ.shape[1] != out.shape[1]:
            occ = resize_bilinear(occ, (out.shape[1], out.shape[2]))
        out = out * occ
        pred = SPADEDecoder(ic=self.decoder_ic,
                            name="decoder")(out)
        return {"prediction": pred, "occlusion_map": dense["occlusion_map"],
                "mask": dense["mask"]}


# ------------------------------------------------------- keypoint transforms


def headpose_to_degree(logits):
    idx = jnp.arange(66, dtype=jnp.float32)
    return jnp.sum(jax.nn.softmax(logits, -1) * idx, -1) * 3.0 - 99.0


def rotation_matrix(yaw, pitch, roll):
    """(reference drive_demo.py:107-133; angles in degrees)."""
    yaw = yaw / 180 * 3.14
    pitch = pitch / 180 * 3.14
    roll = roll / 180 * 3.14
    c, s, z, o = jnp.cos, jnp.sin, jnp.zeros_like(yaw), jnp.ones_like(yaw)
    pitch_m = jnp.stack([o, z, z, z, c(pitch), -s(pitch), z, s(pitch),
                         c(pitch)], -1).reshape(-1, 3, 3)
    yaw_m = jnp.stack([c(yaw), z, s(yaw), z, o, z, -s(yaw), z, c(yaw)],
                      -1).reshape(-1, 3, 3)
    roll_m = jnp.stack([c(roll), -s(roll), z, s(roll), c(roll), z, z, z, o],
                       -1).reshape(-1, 3, 3)
    return jnp.einsum("bij,bjk,bkm->bim", pitch_m, yaw_m, roll_m)


def keypoint_transformation(kp_canonical, he, *, yaw=None, pitch=None,
                            roll=None):
    """(reference drive_demo.py:135-180, estimate_jacobian=False path).

    yaw/pitch/roll: optional free-view overrides in DEGREES (the reference's
    free_view mode — set an angle to fix it, leave None to take it from the
    head-pose estimate); e.g. yaw=0, pitch=0, roll=0 frontalizes."""
    kp = kp_canonical["value"]
    b = kp.shape[0]

    def angle(override, logits):
        if override is None:
            return headpose_to_degree(logits)
        # traceable: accepts python scalars, 0-d tracers, or (b,) arrays
        return jnp.broadcast_to(
            jnp.asarray(override, jnp.float32).reshape(-1), (b,))

    rot = rotation_matrix(angle(yaw, he["yaw"]),
                          angle(pitch, he["pitch"]),
                          angle(roll, he["roll"]))
    kp_rot = jnp.einsum("bmp,bkp->bkm", rot, kp)
    kp_t = kp_rot + he["t"][:, None, :]
    exp = he["exp"].reshape(he["exp"].shape[0], -1, 3)
    return {"value": kp_t + exp}


class FaceVid2VidDriver:
    """drive_source_demo (reference drive_demo.py:241-259): animate a 256^2
    source with the pose/expression of each target frame."""

    def __init__(self, params: dict, kp: KPDetector | None = None,
                 he: HEEstimator | None = None,
                 gen: OcclusionAwareSPADEGenerator | None = None,
                 frames_per_batch: int = 4):
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        self.kp = kp or KPDetector()
        self.he = he or HEEstimator()
        self.gen = gen or OcclusionAwareSPADEGenerator()
        self.params = params
        self.frames_per_batch = frames_per_batch
        # packed params (~2,500 leaves across the three nets would cost
        # ~25 ms of argument marshalling per call on tunneled transports)
        self._kp_fwd = jit_with_packed_params(
            lambda p, x: self.kp.apply({"params": p["kp_detector"]}, x),
            params)
        self._he_fwd = jit_with_packed_params(
            lambda p, x: self.he.apply({"params": p["he_estimator"]}, x),
            params)

        def gen_batch(p, src, kp_c, he_drv, kp_src_v):
            """One program: per-frame keypoint transform + generator, frames
            batched (the reference loops frames one generator call at a
            time, drive_demo.py:241-259)."""
            f = he_drv["yaw"].shape[0]
            kp_drv = keypoint_transformation(
                {"value": jnp.tile(kp_c["value"], (f, 1, 1))}, he_drv)
            src_f = jnp.tile(src, (f, 1, 1, 1))
            kp_src = {"value": jnp.tile(kp_src_v[None], (f, 1, 1))}
            return self.gen.apply({"params": p["generator"]}, src_f,
                                  kp_drv, kp_src)["prediction"]

        self._gen_batch = jit_with_packed_params(gen_batch, params)

        def set_pose_fn(p, src, angles):
            kp_canon = self.kp.apply({"params": p["kp_detector"]}, src)
            he = self.he.apply({"params": p["he_estimator"]}, src)
            kp_src = keypoint_transformation(kp_canon, he)
            kp_drv = keypoint_transformation(kp_canon, he, yaw=angles[0],
                                             pitch=angles[1], roll=angles[2])
            return self.gen.apply({"params": p["generator"]}, src, kp_drv,
                                  kp_src)["prediction"]

        # one packed program per call (same rationale as _gen_batch)
        self._set_pose = jit_with_packed_params(set_pose_fn, params)

    def drive(self, source01: jnp.ndarray, targets01: jnp.ndarray) -> jnp.ndarray:
        """source01: (1, 256, 256, 3) [0,1]; targets01: (F, 256, 256, 3).
        Returns (F, 256, 256, 3) driven frames in [0,1]."""
        source01 = jnp.asarray(source01)
        targets01 = jnp.asarray(targets01)
        kp_canon = self._kp_fwd(source01)
        he_src = self._he_fwd(source01)
        kp_src = keypoint_transformation(kp_canon, he_src)
        outs = []
        b = self.frames_per_batch
        for i in range(0, targets01.shape[0], b):
            chunk = targets01[i:i + b]
            he_drv = self._he_fwd(chunk)
            outs.append(self._gen_batch(source01, kp_canon, he_drv,
                                        kp_src["value"][0]))
        return jnp.concatenate(outs, axis=0)

    def set_pose(self, source01: jnp.ndarray, *, yaw=0.0, pitch=0.0,
                 roll=0.0) -> jnp.ndarray:
        """Free-view re-pose (reference make_animation free_view mode,
        drive_demo.py:182/202): re-render the source at fixed head-pose
        angles in degrees, keeping its own expression/translation. Defaults
        frontalize. ONE packed program per call. Returns (1, 256, 256, 3)
        in [0, 1]."""
        angles = jnp.asarray([yaw, pitch, roll], jnp.float32)
        return self._set_pose(jnp.asarray(source01), angles)
