"""Thin-Plate-Spline Motion Model (TPSMM) face reenactment in Flax.

Parity target: the reference's `swap_face_fine/TPSMM/` — `modules/
keypoint_detector.py:5` (resnet18 -> K*5 keypoints), `modules/
dense_motion.py:8` (K TPS transformations -> optical flow + multi-resolution
occlusion), `modules/inpainting_network.py:8` (flow-warped encoder-decoder),
driven by `demo.py:124` `drive_source_demo` (mode='standard': one driving
frame reenacts the source crop). The reference's checkpoint path is an
internal cluster path (demo.py:145), so converted weights must be supplied
by the user (`convert.torch_loader.convert_tpsmm`).

TPU notes: the TPS system solve is a batched 8x8 `jnp.linalg.solve`; all
K+1 warps run as ONE grid_sample with the transform axis folded into batch;
blocks use InstanceNorm(affine) = per-channel GroupNorm. Static shapes
throughout — a driving video is a batch of frames.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.arcface import FrozenBatchNorm
from e4s2024_tpu.models.bisenet import BasicBlock
from e4s2024_tpu.models.facevid2vid import AntiAliasDownsample
from e4s2024_tpu.ops.pool import max_pool2d
from e4s2024_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest


# ------------------------------------------------------------------ geometry


def make_grid_2d(h: int, w: int) -> jnp.ndarray:
    """(H, W, 2) (x, y) grid in [-1, 1] (reference util.py:118, align-corners
    spacing)."""
    x = 2 * (jnp.arange(w) / (w - 1)) - 1
    y = 2 * (jnp.arange(h) / (h - 1)) - 1
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def kp2gaussian2d(kp: jnp.ndarray, size: tuple[int, int],
                  var: float = 0.01) -> jnp.ndarray:
    """(B, N, 2) xy keypoints -> (B, H, W, N) gaussians (reference
    util.py:95)."""
    h, w = size
    grid = make_grid_2d(h, w)[None, :, :, None, :]      # (1, H, W, 1, 2)
    mean = kp[:, None, None, :, :]                      # (B, 1, 1, N, 2)
    return jnp.exp(-0.5 * jnp.sum(jnp.square(grid - mean), -1) / var)


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """Bilinear torch F.grid_sample (zero padding). img: (B, H, W, C);
    grid: (B, Hg, Wg, 2) xy in [-1, 1]."""
    b, h, w, c = img.shape

    def unnorm(g, size):
        if align_corners:
            return (g + 1.0) * (size - 1) / 2.0
        return ((g + 1.0) * size - 1.0) / 2.0

    xs = unnorm(grid[..., 0], w)
    ys = unnorm(grid[..., 1], h)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]
    bi = jnp.arange(b)[:, None, None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[bi, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    out = 0.0
    for dy, wy in ((y0, 1 - ty), (y0 + 1, ty)):
        for dx, wx in ((x0, 1 - tx), (x0 + 1, tx)):
            out = out + tap(dy, dx) * (wy * wx)
    return out


def tps_warp_grid(kp_driving: jnp.ndarray, kp_source: jnp.ndarray,
                  h: int, w: int) -> jnp.ndarray:
    """K thin-plate-spline warps (reference util.py:6 TPS, mode='kp').

    kp_driving/kp_source: (B, K, 5, 2) control points (TPS maps driving ->
    source coordinates). Returns (B, K, H, W, 2) sampling grids."""
    b, k, n, _ = kp_driving.shape
    kp1, kp2 = kp_driving, kp_source

    d2 = jnp.sum(jnp.square(kp1[:, :, :, None] - kp1[:, :, None, :]), -1)
    radial = d2 * jnp.log(d2 + 1e-9)                         # (B, K, 5, 5)
    ones = jnp.ones((b, k, n, 1))
    kp1p = jnp.concatenate([kp1, ones], 3)                   # (B, K, 5, 3)
    zeros33 = jnp.zeros((b, k, 3, 3))
    p_blk = jnp.concatenate([kp1p, zeros33], 2)              # (B, K, 8, 3)
    l_blk = jnp.concatenate([radial, jnp.swapaxes(kp1p, 2, 3)], 2)
    lmat = jnp.concatenate([l_blk, p_blk], 3)                # (B, K, 8, 8)
    lmat = lmat + jnp.eye(n + 3) * 0.01
    y = jnp.concatenate([kp2, jnp.zeros((b, k, 3, 2))], 2)   # (B, K, 8, 2)

    param = jnp.linalg.solve(lmat, y)                        # (B, K, 8, 2)
    theta = jnp.swapaxes(param[:, :, n:, :], 2, 3)           # (B, K, 2, 3)
    ctrl_params = param[:, :, :n, :]                         # (B, K, 5, 2)

    coords = make_grid_2d(h, w).reshape(-1, 2)               # (HW, 2)
    affine = jnp.einsum("bkij,nj->bkni", theta[:, :, :, :2], coords) \
        + theta[:, :, None, :, 2]
    dist = jnp.sum(jnp.square(coords[None, None, :, None, :]
                              - kp1[:, :, None, :, :]), -1)  # (B, K, HW, 5)
    radial = dist * jnp.log(dist + 1e-9)
    warped = affine + jnp.einsum("bknc,bkcd->bknd", radial, ctrl_params)
    return warped.reshape(b, k, h, w, 2)


# ------------------------------------------------------------------ blocks


def _inorm(name: str):
    # torch nn.InstanceNorm2d(affine=True) == per-channel GroupNorm
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        name=name)


class TPSSameBlock(nn.Module):
    """SameBlock2d (reference util.py:202): conv + IN(affine) + relu."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.kernel // 2, name="conv")(x)
        return nn.relu(_inorm("norm")(x))


class TPSDownBlock(nn.Module):
    """DownBlock2d (util.py:182): conv + IN + relu + 2x avg pool."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv")(x)
        x = nn.relu(_inorm("norm")(x))
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))


class TPSUpBlock(nn.Module):
    """UpBlock2d (util.py:162): 2x nearest + conv + IN + relu."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = resize_nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv")(x)
        return nn.relu(_inorm("norm")(x))


class TPSResBlock(nn.Module):
    """ResBlock2d (util.py:137): IN-relu-conv twice, residual."""

    features: int

    @nn.compact
    def __call__(self, x):
        r = nn.relu(_inorm("norm1")(x))
        r = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(r)
        r = nn.relu(_inorm("norm2")(r))
        r = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(r)
        return x + r


class TPSHourglass(nn.Module):
    """Hourglass (util.py:278). __call__ returns the list of decoder outputs
    (torch mode=1); element [-1] is the full-resolution map."""

    block_expansion: int
    num_blocks: int = 5
    max_features: int = 1024

    @nn.compact
    def __call__(self, x):
        be, mf = self.block_expansion, self.max_features
        enc = [x]
        for i in range(self.num_blocks):
            enc.append(TPSDownBlock(min(mf, be * 2 ** (i + 1)),
                                    name=f"down{i}")(enc[-1]))
        out = enc.pop()
        outs = []
        for j, i in enumerate(range(self.num_blocks)[::-1]):
            out = TPSUpBlock(min(mf, be * 2 ** i), name=f"up{j}")(out)
            out = jnp.concatenate([out, enc.pop()], axis=-1)
            outs.append(out)
        return outs


# ------------------------------------------------------------------ modules


class TPSKPDetector(nn.Module):
    """K*5 keypoints from a torchvision-style resnet18 (reference
    keypoint_detector.py:5): sigmoid output mapped to [-1, 1]."""

    num_tps: int = 10

    @nn.compact
    def __call__(self, img01):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(img01)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        for li, feats in enumerate((64, 128, 256, 512)):
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = BasicBlock(feats, stride=stride,
                               name=f"layer{li + 1}_{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_tps * 5 * 2, name="fc")(x)
        kp = jax.nn.sigmoid(x) * 2.0 - 1.0
        return kp.reshape(x.shape[0], self.num_tps * 5, 2)


class TPSDenseMotion(nn.Module):
    """Optical flow + multi-res occlusion from K TPS warps (reference
    dense_motion.py:8, vox config: block_expansion 64, 5 blocks,
    max_features 1024, scale 0.25, multi_mask)."""

    num_tps: int = 10
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    scale_factor: float = 0.25
    kp_variance: float = 0.01
    occlusion_num: int = 4

    @nn.compact
    def __call__(self, source01, kp_driving, kp_source):
        k = self.num_tps
        if self.scale_factor != 1:
            source01 = AntiAliasDownsample(self.scale_factor,
                                           name="down")(source01)
        b, h, w, c = source01.shape

        # heatmaps: driving - source gaussians, zeros channel first (:56-68)
        hm = kp2gaussian2d(kp_driving, (h, w), self.kp_variance) \
            - kp2gaussian2d(kp_source, (h, w), self.kp_variance)
        hm = jnp.concatenate([jnp.zeros((b, h, w, 1)), hm], axis=-1)

        # identity + K TPS grids (:70-91)
        grids = tps_warp_grid(kp_driving.reshape(b, k, 5, 2),
                              kp_source.reshape(b, k, 5, 2), h, w)
        ident = jnp.broadcast_to(make_grid_2d(h, w)[None, None],
                                 (b, 1, h, w, 2))
        transforms = jnp.concatenate([ident, grids], 1)  # (B, K+1, H, W, 2)

        # all K+1 warps of the source in ONE grid_sample (:93-101)
        src_rep = jnp.broadcast_to(source01[:, None],
                                   (b, k + 1, h, w, c)).reshape(-1, h, w, c)
        deformed = grid_sample_2d(src_rep,
                                  transforms.reshape(-1, h, w, 2))
        deformed = deformed.reshape(b, k + 1, h, w, c)

        inp = jnp.concatenate(
            [hm, deformed.transpose(0, 2, 3, 1, 4).reshape(b, h, w, -1)],
            axis=-1)
        preds = TPSHourglass(self.block_expansion, self.num_blocks,
                             self.max_features, name="hourglass")(inp)

        contribution = nn.Conv(k + 1, (7, 7), padding=3,
                               name="maps")(preds[-1])
        contribution = jax.nn.softmax(contribution, axis=-1)

        # Eq(6): flow = contribution-weighted sum of the K+1 grids
        deformation = jnp.einsum("bkhwd,bhwk->bhwd", transforms,
                                 contribution)

        # multi-resolution occlusion maps (:152-160): 2 from decoder outs,
        # 2 from extra up blocks
        up_nums = int(round(np.log2(1 / self.scale_factor)))
        occ = []
        for i in range(self.occlusion_num - up_nums):
            occ.append(jax.nn.sigmoid(nn.Conv(
                1, (7, 7), padding=3, name=f"occlusion{i}")(
                    preds[up_nums - self.occlusion_num + i])))
        out = preds[-1]
        ch = out.shape[-1]
        for i in range(up_nums):
            out = TPSUpBlock(ch // (2 ** (i + 1)), name=f"up{i}")(out)
            occ.append(jax.nn.sigmoid(nn.Conv(
                1, (7, 7), padding=3,
                name=f"occlusion{i + self.occlusion_num - up_nums}")(out)))

        return {"deformation": deformation, "occlusion_map": occ,
                "contribution_maps": contribution, "deformed_source": deformed}


class TPSInpainting(nn.Module):
    """Flow-warped encoder-decoder (reference inpainting_network.py:8,
    vox config: block_expansion 64, max_features 512, 3 down blocks)."""

    block_expansion: int = 64
    num_down_blocks: int = 3
    max_features: int = 512

    def _deform(self, feat, deformation):
        h, w = feat.shape[1], feat.shape[2]
        if (deformation.shape[1], deformation.shape[2]) != (h, w):
            deformation = resize_bilinear_align_corners(deformation, (h, w))
        return grid_sample_2d(feat, deformation)

    @nn.compact
    def __call__(self, source01, dense_motion):
        be, mf, nd = self.block_expansion, self.max_features, \
            self.num_down_blocks
        deformation = dense_motion["deformation"]
        occ = dense_motion["occlusion_map"]

        out = TPSSameBlock(be, kernel=7, name="first")(source01)
        encoder_map = [out]
        for i in range(nd):
            out = TPSDownBlock(min(mf, be * 2 ** (i + 1)),
                               name=f"down{i}")(out)
            encoder_map.append(out)

        out = self._deform(out, deformation) * occ[0]

        for i in range(nd):
            out = TPSResBlock(out.shape[-1], name=f"res{2 * i}")(out)
            out = TPSResBlock(out.shape[-1], name=f"res{2 * i + 1}")(out)
            out = TPSUpBlock(min(mf, be * 2 ** (nd - i - 1)),
                             name=f"up{i}")(out)
            encode_i = self._deform(encoder_map[-(i + 2)], deformation)
            encode_i = encode_i * occ[i + 1]
            if i == nd - 1:
                break
            out = jnp.concatenate([out, encode_i], axis=-1)

        deformed_source = self._deform(source01, deformation)
        occ_last = occ[-1]
        out = out * (1 - occ_last) + encode_i
        out = nn.Conv(source01.shape[-1], (7, 7), padding=3,
                      name="final")(out)
        out = jax.nn.sigmoid(out)
        out = out * (1 - occ_last) + deformed_source * occ_last
        return out


class TPSMMDriver:
    """Host wrapper (reference demo.py:124 drive_source_demo, standard mode).

    params: {"kp_detector": ..., "dense_motion": ..., "inpainting": ...}."""

    def __init__(self, params: dict, num_tps: int = 10):
        self.kp = TPSKPDetector(num_tps=num_tps)
        self.dm = TPSDenseMotion(num_tps=num_tps)
        self.inp = TPSInpainting()
        self.params = params
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        # packed params: per-leaf arg marshalling costs ~10 us/leaf/call
        self._animate = jit_with_packed_params(self._animate_p, params)

    def _animate_p(self, params, source01, driving01):
        kp_s = self.kp.apply({"params": params["kp_detector"]}, source01)
        kp_d = self.kp.apply({"params": params["kp_detector"]}, driving01)
        dense = self.dm.apply({"params": params["dense_motion"]},
                              source01, kp_d, kp_s)
        return self.inp.apply({"params": params["inpainting"]},
                              source01, dense)

    def __call__(self, source01: jnp.ndarray,
                 driving01: jnp.ndarray) -> jnp.ndarray:
        """source01/driving01: (B, 256, 256, 3) in [0, 1] -> reenacted
        source in [0, 1]."""
        return self._animate(source01, driving01)
