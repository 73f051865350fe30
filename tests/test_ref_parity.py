"""Forward-parity tests against the REFERENCE's own torch modules.

These instantiate the reference's real model classes (from /root/reference)
with random torch weights + randomized BN stats, convert the state_dict with
our converters, and assert the Flax forward matches the torch forward. This
is the strongest converter fidelity test available without released
checkpoints: a transposed conv axis, a misnamed layer, or a wrong-layout
name map fails here, where a self-consistent round-trip would pass.

Covered families (VERDICT round-2 item 2): Net3 (models/networks.py:51),
BiSeNet face parser (swap_face_fine/face_parsing/model.py:236), Blender
recolorer (swap_face_fine/Blender/model_center/blener.py:7), faceVid2Vid
KP detector / HE estimator (face_vid2vid/modules/keypoint_detector.py),
ArcFace ir_se50 (models/encoders/model_irse.py:9), parsing U-Net
(criteria/face_parsing/unet.py:6), Hopenet (head_pose_esit/hopenet.py:7),
RealESRGAN RRDBNet (swap_face_fine/archs/rrdbnet_arch.py), StyleGAN2
Discriminator (models/stylegan2/model.py:771), and the zoo families in the
second half of this file. RetinaFace is covered in test_detect.py the same
way.

All tests are CPU (float32) with tight tolerances.
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import _ref_compat


@pytest.fixture(scope="module", autouse=True)
def _compat():
    _ref_compat.install_all()
    # torch's oneDNN conv path is run-order nondeterministic (identical eval
    # forwards in one process can differ by up to 4e-3 after unrelated convs
    # ran; measured on the Blender oracle). Disable it module-wide so the
    # torch oracles are deterministic; flax-vs-torch parity is then ~1e-6.
    prev = torch.backends.mkldnn.enabled
    torch.backends.mkldnn.enabled = False
    yield
    torch.backends.mkldnn.enabled = prev


# ------------------------------------------------------------------ BiSeNet


@pytest.mark.slow
def test_bisenet_forward_parity(monkeypatch):
    # the reference Resnet18 downloads ImageNet init weights (resnet.py:84);
    # random init is equivalent for converter parity and this env has no net
    import torch.utils.model_zoo as model_zoo

    monkeypatch.setattr(model_zoo, "load_url", lambda *a, **k: {})
    from swap_face_fine.face_parsing.model import BiSeNet as TorchBiSeNet

    from e4s2024_tpu.convert.torch_loader import convert_bisenet
    from e4s2024_tpu.models.bisenet import BiSeNet

    torch.manual_seed(0)
    tnet = TorchBiSeNet(n_classes=19).eval()
    _ref_compat.randomize_bn_stats(tnet, 1)
    params = convert_bisenet(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out, t16, t32 = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    out, o16, o32 = BiSeNet().apply({"params": params}, jnp.asarray(x),
                                    aux=True, upsample=True)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(o16).transpose(0, 3, 1, 2),
                               t16.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(o32).transpose(0, 3, 1, 2),
                               t32.numpy(), atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------- faceVid2Vid


@pytest.mark.slow
def test_facevid2vid_kp_detector_parity():
    """KPDetector at the vox-256 config vs the reference torch module."""
    from swap_face_fine.face_vid2vid.modules.keypoint_detector import (
        KPDetector as TorchKP,
    )

    from e4s2024_tpu.convert.torch_loader import convert_facevid2vid_kp
    from e4s2024_tpu.models.facevid2vid import KPDetector

    torch.manual_seed(5)
    tnet = TorchKP(block_expansion=32, feature_channel=32, num_kp=15,
                   image_channel=3, max_features=1024, reshape_channel=16384,
                   reshape_depth=16, num_blocks=5, temperature=0.1,
                   estimate_jacobian=False, scale_factor=0.25).eval()
    _ref_compat.randomize_bn_stats(tnet, 6)
    params = convert_facevid2vid_kp(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(7)
    x = rng.random((1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = KPDetector().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours["value"]),
                               ref["value"].numpy(), atol=1e-4)


@pytest.mark.slow
def test_facevid2vid_he_estimator_parity():
    from swap_face_fine.face_vid2vid.modules.keypoint_detector import (
        HEEstimator as TorchHE,
    )

    from e4s2024_tpu.convert.torch_loader import convert_facevid2vid_he
    from e4s2024_tpu.models.facevid2vid import HEEstimator

    torch.manual_seed(8)
    tnet = TorchHE(block_expansion=64, feature_channel=512, num_kp=15,
                   image_channel=3, max_features=2048,
                   num_bins=66).eval()
    _ref_compat.randomize_bn_stats(tnet, 9)
    params = convert_facevid2vid_he(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(10)
    x = rng.random((1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = HEEstimator().apply({"params": params}, jnp.asarray(x))
    for k in ("yaw", "pitch", "roll", "t", "exp"):
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"key {k}")


# ------------------------------------------------------------------ Blender


@pytest.mark.slow
def test_blender_forward_parity():
    """Full Blender forward vs the reference torch module. This also proves
    the TPU re-design (dense masked attention) computes the same math as the
    reference's top-k gather + grid_sample attention: per A-part pixel the
    softmax support is the same T-part pixel set."""
    import sys

    from swap_face_fine.Blender.model_center.blener import (
        Blender as TorchBlender,
    )
    from swap_face_fine.Blender.utils.parser import get_base_parser

    from e4s2024_tpu.convert.torch_loader import convert_blender
    from e4s2024_tpu.models.blender import Blender

    # authentic inference args (reference inference.py:19-31, 78-83)
    parser = get_base_parser()
    parser.add_argument("--lambda_L1", default=1.0, type=float)
    parser.add_argument("--lambda_VGG", default=1.0, type=float)
    parser.add_argument("--lambda_GAN", default=0.0, type=float)
    parser.add_argument("--lambda_DIS", default=0.0, type=float)
    parser.add_argument("--lambda_CYC", default=1.0, type=float)
    parser.add_argument("--lambda_CYC2", default=10.0, type=float)
    parser.add_argument("--small_FPN", action="store_true")
    parser.add_argument("--eval_only", action="store_true")
    args = parser.parse_args([])
    args.eval_only = True

    torch.manual_seed(11)
    tnet = TorchBlender(args).eval()
    _ref_compat.randomize_bn_stats(tnet, 12)
    with torch.no_grad():
        tnet.referencer.trainable_tao.fill_(1.7)
    params = convert_blender(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(13)
    # plausible 19-class masks: blocky regions so parts have support
    base = rng.integers(0, 19, (1, 16, 16))
    mask_a = np.repeat(np.repeat(base, 16, 1), 16, 2)
    base_t = rng.integers(0, 19, (1, 16, 16))
    mask_t = np.repeat(np.repeat(base_t, 16, 1), 16, 2)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    img_a = ((rng.random((1, 256, 256, 3)).astype(np.float32)) - mean) / std
    img_t = ((rng.random((1, 256, 256, 3)).astype(np.float32)) - mean) / std

    with torch.no_grad():
        pred, packages, _, _ = tnet(
            torch.from_numpy(img_a.transpose(0, 3, 1, 2)),
            torch.from_numpy(img_t.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask_a),
            torch.from_numpy(mask_t))

    out, pkgs = Blender().apply({"params": params}, jnp.asarray(img_a),
                                jnp.asarray(img_t), jnp.asarray(mask_a),
                                jnp.asarray(mask_t))
    # tolerance = the torch oracle's OWN run-to-run envelope: its attention
    # path is bimodal across processes (two identical eval forwards differ by
    # up to 4.1e-3 on packages; measured — mkldnn off does not remove it).
    # The flax output matches one of the two torch paths to ~1.4e-6; a real
    # converter/layout bug produces O(0.1) errors, far outside 6e-3.
    np.testing.assert_allclose(np.asarray(pkgs).transpose(0, 3, 1, 2),
                               packages.numpy(), atol=6e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               pred.numpy(), atol=6e-3, rtol=1e-3)


# --------------------------------------------------------------------- Net3


@pytest.mark.slow
def test_net3_full_parity():
    """The flagship: reference Net3 (models/networks.py:51) vs RGINet through
    convert_rgi — style vectors, latent-avg-centered style codes, and the
    full regional generator image, at out_size 256 / remaining_layer_idx 13
    (the training semantics; the reference's CUDA ops run as their documented
    pure-torch fallbacks)."""
    from argparse import Namespace

    from models.networks import Net3

    from e4s2024_tpu.convert.torch_loader import convert_rgi
    from e4s2024_tpu.models.rgi import RGINet

    opts = Namespace(fsencoder_type="psp", num_seg_cls=12,
                     remaining_layer_idx=13, out_size=256, train_G=False,
                     n_styles=14, input_nc=3, start_from_latent_avg=True,
                     learn_in_w=False)
    torch.manual_seed(14)
    net = Net3(opts).eval()
    # zero the registered noise buffers == our noise=None path
    for b in net.G.noises.buffers():
        b.zero_()
    latent_avg = torch.randn(14, 512)
    net.latent_avg = latent_avg

    sd = _ref_compat.to_numpy_sd(net)
    sd["latent_avg"] = latent_avg.numpy()
    variables = convert_rgi(sd)

    rgi = RGINet(num_seg_cls=12, out_size=256, remaining_layer_idx=13)

    rng = np.random.default_rng(15)
    img = (rng.random((1, 256, 256, 3)).astype(np.float32)) * 2.0 - 1.0
    base = rng.integers(0, 12, (1, 16, 16))
    labels = np.repeat(np.repeat(base, 16, 1), 16, 2)  # (1, 256, 256)
    onehot = np.eye(12, dtype=np.float32)[labels]      # (1, 256, 256, 12)

    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2))
    t_mask = torch.from_numpy(onehot.transpose(0, 3, 1, 2))

    with torch.no_grad():
        sv_t, _ = net.get_style_vectors(t_img, t_mask)
        codes_t = net.cal_style_codes(sv_t)
        img_t, _, _ = net.gen_img(torch.zeros(1, 512, 32, 32), codes_t,
                                  t_mask, randomize_noise=False)

    sv_j, _ = rgi.apply(variables, jnp.asarray(img), jnp.asarray(onehot),
                        method=RGINet.get_style_vectors)
    np.testing.assert_allclose(np.asarray(sv_j), sv_t.numpy(),
                               atol=3e-4, rtol=1e-3)

    codes_j = rgi.apply(variables, jnp.asarray(sv_j),
                        method=RGINet.cal_style_codes)
    np.testing.assert_allclose(np.asarray(codes_j), codes_t.numpy(),
                               atol=3e-4, rtol=1e-3)

    img_j, _, _ = rgi.apply(variables, None, codes_j, jnp.asarray(onehot),
                            method=RGINet.gen_img, regional_mode="exact")
    np.testing.assert_allclose(np.asarray(img_j).transpose(0, 3, 1, 2),
                               img_t.numpy(), atol=2e-3, rtol=1e-3)


# ------------------------------------------------- ArcFace ir_se50 (ID loss)


@pytest.mark.slow
def test_arcface_forward_parity():
    """Backbone(112, 50, 'ir_se') — the ID-loss feature net (reference
    criteria/id_loss.py:24) — vs ArcFaceBackbone through convert_arcface,
    including the multi-scale taps the ID loss consumes."""
    from models.encoders.model_irse import Backbone

    from e4s2024_tpu.convert.torch_loader import convert_arcface
    from e4s2024_tpu.models.arcface import ArcFaceBackbone

    with _ref_compat.view_fallback():
        _run_arcface_parity(Backbone, convert_arcface, ArcFaceBackbone)


def _run_arcface_parity(Backbone, convert_arcface, ArcFaceBackbone):
    torch.manual_seed(20)
    tnet = Backbone(input_size=112, num_layers=50, mode="ir_se").eval()
    _ref_compat.randomize_bn_stats(tnet, 21)
    params = convert_arcface(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(22)
    x = (rng.random((1, 112, 112, 3)).astype(np.float32)) * 2.0 - 1.0
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   multi_scale=True)
    ours = ArcFaceBackbone().apply({"params": params}, jnp.asarray(x),
                                   multi_scale=True)
    assert len(ours) == len(ref) == 5
    # torch taps are NCHW-flattened; ours are NHWC-flattened — compare after
    # restoring the (C,H,W) order on our side (the ID loss takes cosines of
    # each tap against the same layout, so order is a pure relabeling)
    sizes = {2: (64, 56), 6: (128, 28), 20: (256, 14), 23: (512, 7)}
    for j, i in enumerate((2, 6, 20, 23)):
        c, h = sizes[i]
        o = np.asarray(ours[j]).reshape(1, h, h, c).transpose(0, 3, 1, 2)
        o = o.reshape(1, -1)
        np.testing.assert_allclose(o, ref[j].numpy(), atol=3e-4, rtol=1e-3,
                                   err_msg=f"tap {i}")
    np.testing.assert_allclose(np.asarray(ours[4]), ref[4].numpy(),
                               atol=3e-4, rtol=1e-3, err_msg="embedding")


# --------------------------------------------- parsing U-Net (parsing loss)


@pytest.mark.slow
def test_parsing_unet_forward_parity():
    """criteria/face_parsing/unet.py `unet` (the face-parsing-loss feature
    net) vs ParsingUNet through convert_parsing_unet."""
    from criteria.face_parsing.unet import unet as TorchUnet

    from e4s2024_tpu.convert.torch_loader import convert_parsing_unet
    from e4s2024_tpu.models.parser_unet import ParsingUNet

    torch.manual_seed(23)
    tnet = TorchUnet().eval()
    _ref_compat.randomize_bn_stats(tnet, 24)
    params = convert_parsing_unet(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(25)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = ParsingUNet().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-4, rtol=1e-3)


# ------------------------------------------------------------------ Hopenet


@pytest.mark.slow
def test_hopenet_forward_parity():
    """head_pose_esit/hopenet.py Hopenet (ResNet-50 flavor, the shipped
    hopenet_robust_alpha1.pkl arch) vs our Hopenet through convert_hopenet.
    The reference takes `block` from torchvision; the canonical torchvision
    Bottleneck is replicated locally (same param names => same state_dict)."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    from head_pose_esit.hopenet import Hopenet as TorchHopenet

    from e4s2024_tpu.convert.torch_loader import convert_hopenet
    from e4s2024_tpu.models.hopenet import Hopenet

    torch.manual_seed(26)
    tnet = TorchHopenet(Bottleneck, [3, 4, 6, 3], 66).eval()
    _ref_compat.randomize_bn_stats(tnet, 27)
    params = convert_hopenet(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(28)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = Hopenet().apply({"params": params}, jnp.asarray(x))
    for o, r, name in zip(ours, ref, ("yaw", "pitch", "roll")):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=3e-4,
                                   rtol=1e-3, err_msg=name)


# ------------------------------------------------------- RealESRGAN RRDBNet


@pytest.mark.slow
def test_rrdbnet_forward_parity():
    """swap_face_fine/archs/rrdbnet_arch.py RRDBNet (x4, the RealESRGAN
    upscaler arch) vs our RRDBNet through convert_rrdbnet, tiny config."""
    from swap_face_fine.archs.rrdbnet_arch import RRDBNet as TorchRRDB

    from e4s2024_tpu.convert.torch_loader import convert_rrdbnet
    from e4s2024_tpu.models.rrdb import RRDBNet

    torch.manual_seed(29)
    tnet = TorchRRDB(3, 3, scale=4, num_feat=16, num_block=2,
                     num_grow_ch=8).eval()
    params = convert_rrdbnet(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(30)
    x = rng.random((1, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = RRDBNet(num_feat=16, num_block=2, num_grow=8).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-4, rtol=1e-3)


# ------------------------------------------------- StyleGAN2 Discriminator


@pytest.mark.slow
def test_discriminator_forward_parity():
    """models/stylegan2/model.py:771 Discriminator (minibatch stddev incl.)
    vs our Discriminator through convert_discriminator, size 64."""
    from models.stylegan2.model import Discriminator as TorchD

    from e4s2024_tpu.convert.torch_loader import convert_discriminator
    from e4s2024_tpu.models.stylegan2 import Discriminator

    torch.manual_seed(31)
    tnet = TorchD(size=64, channel_multiplier=1).eval()
    params = convert_discriminator(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(32)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = Discriminator(size=64, channel_multiplier=1).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4,
                               rtol=1e-3)


# ------------------------------------------------------- GPEN FullGenerator


@pytest.mark.slow
def test_gpen_forward_parity():
    """swap_face_fine/gpen/face_model/gpen_model.py:628 FullGenerator (the
    GPEN enhancer net; encoder feats double as decoder noise, so the forward
    is deterministic) vs GPENFullGenerator through convert_gpen."""
    from swap_face_fine.gpen.face_model.gpen_model import (
        FullGenerator as TorchGPEN,
    )

    from e4s2024_tpu.convert.torch_loader import convert_gpen
    from e4s2024_tpu.models.gpen import GPENFullGenerator

    torch.manual_seed(33)
    tnet = TorchGPEN(size=32, style_dim=64, n_mlp=2, channel_multiplier=1,
                     narrow=0.5, device="cpu").eval()
    params = convert_gpen(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(34)
    x = (rng.random((1, 32, 32, 3)).astype(np.float32)) * 2.0 - 1.0
    with torch.no_grad():
        ref_img, _ = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    img, _ = GPENFullGenerator(size=32, style_dim=64, n_mlp=2,
                               channel_multiplier=1, narrow=0.5).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2),
                               ref_img.numpy(), atol=5e-4, rtol=1e-3)


# ------------------------------------------------- GCFSR FaceInpaintingArch


@pytest.mark.slow
def test_gcfsr_inpainting_forward_parity():
    """swap_face_fine/gcfsr_arch.py:1347 FaceInpaintingArch at the shipped
    256^2 config (final_linear hard-codes narrow=1 channels) vs FaceInpainting
    through convert_gcfsr; stored noise buffers zeroed == our noise=None."""
    from swap_face_fine.gcfsr_arch import FaceInpaintingArch

    from e4s2024_tpu.convert.torch_loader import convert_gcfsr
    from e4s2024_tpu.models.gcfsr import FaceInpainting

    torch.manual_seed(35)
    tnet = FaceInpaintingArch(out_size=256).eval()
    params = convert_gcfsr(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(36)
    x = rng.random((1, 256, 256, 4)).astype(np.float32) * 2.0 - 1.0
    in_size = np.full((1, 1), 0.35, np.float32)
    # explicit zero noise == our noise=None path (the arch's stored noise
    # buffers are sized for the 4x4-rooted GCFSR decoder, not this 16x16-
    # rooted one, so the reference's own randomize_noise=False path crashes)
    num_layers = (8 - 4) * 2 + 1
    sizes = [16] + [s for p in range(4) for s in (32 * 2 ** p,) * 2]
    zero_noise = [torch.zeros(1, 1, s, s) for s in sizes[:num_layers]]
    with torch.no_grad():
        ref_img, _ = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(in_size), noise=zero_noise)
    img, _ = FaceInpainting(out_size=256).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(in_size))
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2),
                               ref_img.numpy(), atol=1e-3, rtol=1e-3)


# ------------------------------------------------------------ GFPGANv1Clean


@pytest.mark.slow
def test_gfpgan_forward_parity():
    """GFPGAN/gfpgan/archs/gfpganv1_clean_arch.py:153 GFPGANv1Clean (v1.3
    shipped flags: different_w + sft_half) vs ours through convert_gfpgan,
    out_size 64; decoder noise buffers zeroed == our noise=None."""
    import importlib

    _ref_compat.package_from_dir(
        "refgfp_archs", _ref_compat.REF + "/swap_face_fine/GFPGAN/gfpgan/archs")
    TorchGFP = importlib.import_module(
        "refgfp_archs.gfpganv1_clean_arch").GFPGANv1Clean

    from e4s2024_tpu.convert.torch_loader import convert_gfpgan
    from e4s2024_tpu.models.gfpgan import GFPGANv1Clean

    torch.manual_seed(37)
    tnet = TorchGFP(out_size=64, num_style_feat=64, channel_multiplier=1,
                    decoder_load_path=None, fix_decoder=False, num_mlp=2,
                    input_is_latent=True, different_w=True, narrow=1,
                    sft_half=True).eval()
    for b in tnet.stylegan_decoder.noises.buffers():
        b.zero_()
    params = convert_gfpgan(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(38)
    x = rng.random((1, 64, 64, 3)).astype(np.float32) * 2.0 - 1.0
    with torch.no_grad(), _ref_compat.view_fallback():
        ref_img, _ = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          return_rgb=False, randomize_noise=False)
    img, _ = GFPGANv1Clean(out_size=64, num_style_feat=64,
                           channel_multiplier=1, narrow=1).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2),
                               ref_img.numpy(), atol=1e-3, rtol=1e-3)


# ------------------------------------------------------------------- SwinIR


@pytest.mark.slow
def test_swinir_forward_parity():
    """SwinIR/models/network_swinir.py SwinIR ('nearest+conv' real_sr flavor)
    vs ours through convert_swinir at a tiny 2-layer config — exercises
    window attention, shifted-window masking, and relative position bias."""
    TorchSwinIR = _ref_compat.import_from_path(
        "ref_network_swinir",
        _ref_compat.REF + "/swap_face_fine/SwinIR/models/network_swinir.py",
    ).SwinIR

    from e4s2024_tpu.convert.torch_loader import convert_swinir
    from e4s2024_tpu.models.swinir import SwinIR

    torch.manual_seed(39)
    tnet = TorchSwinIR(upscale=4, in_chans=3, img_size=16, window_size=8,
                       img_range=1.0, depths=[2, 2], embed_dim=24,
                       num_heads=[2, 4], mlp_ratio=2,
                       upsampler="nearest+conv",
                       resi_connection="1conv").eval()
    params = convert_swinir(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(40)
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = SwinIR(embed_dim=24, depths=(2, 2), heads=(2, 4), window=8).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------- MISF


@pytest.mark.slow
def test_misf_forward_parity():
    """MISF/src/networks.py:35 InpaintGenerator (KPN kernel-prediction
    inpainter) vs MISFGenerator through convert_misf. 256^2: the torch KPN
    hardcodes the 64x64 kernel-map size (kpn/network.py:153). The KPN is
    built directly at the shipped config (FILTER_TYPE='256', kernel [3]) —
    create_generator only adds checkpoint loading around it."""
    from swap_face_fine.MISF.kpn import network as kpn_network
    from swap_face_fine.MISF.kpn import utils as kpn_utils
    from swap_face_fine.MISF.src import networks as misf_networks

    from e4s2024_tpu.convert.torch_loader import convert_misf
    from e4s2024_tpu.models.misf import MISFGenerator

    def make_kpn(config):
        return kpn_network.KPN(
            color=True, burst_length=1, blind_est=True, kernel_size=[3],
            sep_conv=False, channel_att=False, spatial_att=False,
            upMode="bilinear", core_bias=False, filter_type="256")

    orig = kpn_utils.create_generator
    kpn_utils.create_generator = make_kpn
    try:
        torch.manual_seed(41)
        cfg = argparse.Namespace(FILTER_TYPE="256", kernel_size=[3])
        tnet = misf_networks.InpaintGenerator(
            config=cfg, residual_blocks=8, init_weights=False).eval()
    finally:
        kpn_utils.create_generator = orig
    params = convert_misf(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(42)
    img = rng.random((1, 256, 256, 3)).astype(np.float32)
    mask = (rng.random((1, 256, 256, 1)) > 0.7).astype(np.float32)
    x4 = np.concatenate([img * (1 - mask), mask], axis=-1)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x4.transpose(0, 3, 1, 2)))
    ours = MISFGenerator().apply({"params": params}, jnp.asarray(x4))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-3, rtol=1e-3)


# --------------------------------------- faceVid2Vid SPADE generator (full)


@pytest.mark.slow
def test_facevid2vid_generator_parity():
    """OcclusionAwareSPADEGenerator (generator.py:161) — dense motion,
    3D warp, occlusion, SPADE decoder — at the full vox-256 config (the
    dense-motion hourglass depth requires the real 64^2 feature grid) vs
    ours through convert_facevid2vid_generator."""
    from swap_face_fine.face_vid2vid.modules.generator import (
        OcclusionAwareSPADEGenerator as TorchGen,
    )

    from e4s2024_tpu.convert.torch_loader import (
        convert_facevid2vid_generator,
    )
    from e4s2024_tpu.models.facevid2vid import OcclusionAwareSPADEGenerator

    torch.manual_seed(43)
    tnet = TorchGen(
        image_channel=3, feature_channel=32, num_kp=15, block_expansion=64,
        max_features=512, num_down_blocks=2, reshape_channel=32,
        reshape_depth=16, num_resblocks=6, estimate_occlusion_map=True,
        dense_motion_params={"block_expansion": 32, "max_features": 1024,
                             "num_blocks": 5, "reshape_depth": 16,
                             "compress": 4},
        estimate_jacobian=False).eval()
    _ref_compat.randomize_bn_stats(tnet, 44)
    params = convert_facevid2vid_generator(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(45)
    src = rng.random((1, 256, 256, 3)).astype(np.float32)
    kp_s = rng.standard_normal((1, 15, 3)).astype(np.float32) * 0.3
    kp_d = rng.standard_normal((1, 15, 3)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tnet(torch.from_numpy(src.transpose(0, 3, 1, 2)),
                   kp_source={"value": torch.from_numpy(kp_s)},
                   kp_driving={"value": torch.from_numpy(kp_d)})
    ours = OcclusionAwareSPADEGenerator().apply(
        {"params": params}, jnp.asarray(src), {"value": jnp.asarray(kp_d)},
        {"value": jnp.asarray(kp_s)})
    np.testing.assert_allclose(
        np.asarray(ours["occlusion_map"]).transpose(0, 3, 1, 2),
        ref["occlusion_map"].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours["prediction"]).transpose(0, 3, 1, 2),
        ref["prediction"].numpy(), atol=2e-3, rtol=1e-3)


# --------------------------------------------------------------- CodeFormer


@pytest.mark.slow
def test_codeformer_forward_parity():
    """archs/codeformer_arch.py:161 CodeFormer (512^2 VQGAN + transformer,
    the fixed shipped arch) vs ours through convert_codeformer at w=0."""
    from swap_face_fine.archs.codeformer_arch import (
        CodeFormer as TorchCodeFormer,
    )

    from e4s2024_tpu.convert.torch_loader import convert_codeformer
    from e4s2024_tpu.models.codeformer import CodeFormer

    torch.manual_seed(46)
    tnet = TorchCodeFormer(dim_embd=512, n_head=8, n_layers=9,
                           codebook_size=1024, latent_size=256,
                           connect_list=["32", "64", "128", "256"],
                           fix_modules=None).eval()
    params = convert_codeformer(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(47)
    x = rng.random((1, 512, 512, 3)).astype(np.float32) * 2.0 - 1.0
    with torch.no_grad():
        ref_img, ref_logits, ref_lq = tnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), w=0.0, adain=False)
    img, logits, lq = CodeFormer().apply({"params": params}, jnp.asarray(x),
                                         w=0.0)
    np.testing.assert_allclose(np.asarray(lq).transpose(0, 3, 1, 2),
                               ref_lq.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2),
                               ref_img.numpy(), atol=5e-3, rtol=1e-3)


# -------------------------------------------------------------------- TPSMM


@pytest.mark.slow
def test_tpsmm_pipeline_parity():
    """TPSMM kp detector (torchvision resnet18 head) + TPS dense motion +
    inpainting network at the vox config, full standard-mode drive
    (demo.py:67 make_animation) vs TPSMMDriver through convert_tpsmm."""
    from swap_face_fine.TPSMM.modules.keypoint_detector import (
        KPDetector as TorchKP,
    )
    from swap_face_fine.TPSMM.modules.dense_motion import (
        DenseMotionNetwork as TorchDM,
    )
    from swap_face_fine.TPSMM.modules.inpainting_network import (
        InpaintingNetwork as TorchInp,
    )

    from e4s2024_tpu.convert.torch_loader import convert_tpsmm
    from e4s2024_tpu.models.tpsmm import TPSMMDriver

    torch.manual_seed(48)
    kp = TorchKP(num_tps=10).eval()
    dm = TorchDM(block_expansion=64, num_blocks=5, max_features=1024,
                 num_tps=10, num_channels=3, scale_factor=0.25, bg=False,
                 multi_mask=True, kp_variance=0.01).eval()
    inp = TorchInp(num_channels=3, block_expansion=64, max_features=512,
                   num_down_blocks=3, multi_mask=True).eval()
    for net, seed in ((kp, 49), (dm, 50), (inp, 51)):
        _ref_compat.randomize_bn_stats(net, seed)
    params = convert_tpsmm({
        "kp_detector": _ref_compat.to_numpy_sd(kp),
        "dense_motion_network": _ref_compat.to_numpy_sd(dm),
        "inpainting_network": _ref_compat.to_numpy_sd(inp),
    })

    rng = np.random.default_rng(52)
    src = rng.random((1, 256, 256, 3)).astype(np.float32)
    drv = rng.random((1, 256, 256, 3)).astype(np.float32)
    ts, td = (torch.from_numpy(v.transpose(0, 3, 1, 2)) for v in (src, drv))
    with torch.no_grad():
        kp_s, kp_d = kp(ts), kp(td)
        dense = dm(ts, kp_d, kp_s, bg_param=None, dropout_flag=False)
        ref = inp(ts, dense)["prediction"]

    driver = TPSMMDriver(params)
    ours = driver(jnp.asarray(src), jnp.asarray(drv))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=2e-3, rtol=1e-3)


# -------------------------------------------------------------------- DaGAN


@pytest.mark.slow
def test_dagan_pipeline_parity():
    """DaGAN monodepth2 resnet50 depth net + depth-augmented kp detector +
    depth-aware generator at the vox-adv config, absolute-kp drive
    (drive_demo.py:59 make_animation with relative/adapt off) vs DaGANDriver
    through convert_dagan."""
    from swap_face_fine.DaGAN import depth as dagan_depth
    from swap_face_fine.DaGAN.modules.keypoint_detector import (
        KPDetector as TorchKP,
    )
    from swap_face_fine.DaGAN.modules.generator import (
        DepthAwareGenerator as TorchGen,
    )

    from e4s2024_tpu.convert.torch_loader import convert_dagan
    from e4s2024_tpu.models.dagan import DaGANDriver

    torch.manual_seed(53)
    depth_encoder = dagan_depth.ResnetEncoder(50, False).eval()
    depth_decoder = dagan_depth.DepthDecoder(
        num_ch_enc=depth_encoder.num_ch_enc, scales=range(4)).eval()
    kp = TorchKP(block_expansion=32, num_kp=15, num_channels=4,
                 max_features=1024, num_blocks=5, temperature=0.1,
                 estimate_jacobian=True, scale_factor=0.25).eval()
    gen = TorchGen(num_channels=3, num_kp=15, block_expansion=64,
                   max_features=512, num_down_blocks=2,
                   num_bottleneck_blocks=6, estimate_occlusion_map=True,
                   dense_motion_params={"block_expansion": 64,
                                        "max_features": 1024,
                                        "num_blocks": 5,
                                        "scale_factor": 0.25},
                   estimate_jacobian=True).eval()
    for net, seed in ((depth_encoder, 54), (kp, 55), (gen, 56)):
        _ref_compat.randomize_bn_stats(net, seed)
    params = convert_dagan(_ref_compat.to_numpy_sd(gen),
                           _ref_compat.to_numpy_sd(kp),
                           _ref_compat.to_numpy_sd(depth_encoder),
                           _ref_compat.to_numpy_sd(depth_decoder))

    rng = np.random.default_rng(57)
    src = rng.random((1, 256, 256, 3)).astype(np.float32)
    drv = rng.random((1, 256, 256, 3)).astype(np.float32)
    ts, td = (torch.from_numpy(v.transpose(0, 3, 1, 2)) for v in (src, drv))
    with torch.no_grad():
        d_s = depth_decoder(depth_encoder(ts))[("disp", 0)]
        d_d = depth_decoder(depth_encoder(td))[("disp", 0)]
        kp_s = kp(torch.cat((ts, d_s), 1))
        kp_d = kp(torch.cat((td, d_d), 1))
        ref = gen(ts, kp_d, kp_s, d_s, d_d)["prediction"]

    driver = DaGANDriver(params)
    ours = driver(jnp.asarray(src), jnp.asarray(drv))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------- LIA

@pytest.mark.slow
def test_lia_pipeline_parity():
    """LIA Generator (encoder + styled synthesis with flow warps) at the
    vox-256 config, online mode (run_demo.py:109: h_start = source motion)
    vs LIADriver through convert_lia."""
    from swap_face_fine.LIA.networks import styledecoder
    from swap_face_fine.LIA.networks.generator import Generator as TorchLIA

    from e4s2024_tpu.convert.torch_loader import convert_lia
    from e4s2024_tpu.models.lia import LIADriver

    # LIA's NoiseInjection draws fresh randn on every forward (noise=None
    # has no stored-buffer path); zero it so the oracle is deterministic —
    # matching our synthesis, which is deliberately noise-free
    styledecoder.NoiseInjection.forward = lambda self, image, noise=None: image

    torch.manual_seed(58)
    tnet = TorchLIA(size=256, style_dim=512, motion_dim=20,
                    channel_multiplier=1).eval()
    params = convert_lia(_ref_compat.to_numpy_sd(tnet), size=256)

    rng = np.random.default_rng(59)
    src = rng.random((1, 256, 256, 3)).astype(np.float32) * 2.0 - 1.0
    drv = rng.random((1, 256, 256, 3)).astype(np.float32) * 2.0 - 1.0
    ts, td = (torch.from_numpy(v.transpose(0, 3, 1, 2)) for v in (src, drv))
    with torch.no_grad():
        h_start = tnet.enc.enc_motion(ts)
        ref = tnet(ts, td, h_start)

    driver = LIADriver(params)
    ours = driver(jnp.asarray(src), jnp.asarray(drv))
    got = np.asarray(ours).transpose(0, 3, 1, 2)
    # a couple of warp-boundary pixels land on grid_sample cell edges where
    # torch/XLA tie-break differently; everything else matches to ~1e-4
    np.testing.assert_allclose(got, ref.numpy(), atol=5e-3, rtol=1e-3)
    assert np.abs(got - ref.numpy()).mean() < 2e-4


# ------------------------------------------------------- LPIPS + VGG16 taps


@pytest.mark.slow
def test_lpips_forward_parity(monkeypatch):
    """criteria/lpips LPIPS (alex flavor) vs our LPIPS through convert_lpips.
    The official lin weights download is stubbed with random positive
    weights — layout parity is what the converter must get right."""
    import criteria.lpips.lpips as ref_lpips_mod

    from e4s2024_tpu.convert.torch_loader import convert_lpips
    from e4s2024_tpu.models.lpips import LPIPS

    torch.manual_seed(60)
    chans = (64, 192, 384, 256, 256)
    lin_sd = {f"{i}.1.weight": torch.rand(1, c, 1, 1) for i, c in
              enumerate(chans)}
    monkeypatch.setattr(ref_lpips_mod, "get_state_dict",
                        lambda *a, **k: {k2: v.clone()
                                         for k2, v in lin_sd.items()})
    tnet = ref_lpips_mod.LPIPS(net_type="alex").eval()

    alex_sd = {k.replace("net.layers.", "features."): v
               for k, v in _ref_compat.to_numpy_sd(tnet).items()
               if k.startswith("net.layers.")}
    params = convert_lpips(alex_sd,
                           {k: v.numpy() for k, v in lin_sd.items()})

    rng = np.random.default_rng(61)
    x = rng.random((2, 64, 64, 3)).astype(np.float32) * 2.0 - 1.0
    y = rng.random((2, 64, 64, 3)).astype(np.float32) * 2.0 - 1.0
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y.transpose(0, 3, 1, 2)))
    ours = LPIPS().apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_vgg16_activations_parity():
    """criteria/style_loss.py:83 VGG16_Activations (style-Gram feature taps)
    vs VGG16Features through convert_vgg16 at the loss's [3, 8, 15, 22]."""
    from criteria.style_loss import VGG16_Activations

    from e4s2024_tpu.convert.torch_loader import convert_vgg16
    from e4s2024_tpu.models.vgg import VGG16Features

    torch.manual_seed(62)
    taps = (3, 8, 15, 22)
    tnet = VGG16_Activations(list(taps)).eval()
    params = convert_vgg16(_ref_compat.to_numpy_sd(tnet))

    rng = np.random.default_rng(63)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = VGG16Features(taps=taps).apply({"params": params}, jnp.asarray(x))
    assert len(ours) == len(ref) == 4
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-4, rtol=1e-3)


# --------------------------------------------------- Net3 SEAN-encoder mode


@pytest.mark.slow
def test_net3_sean_encoder_parity():
    """Net3 with fsencoder_type='sean' (networks.py:62: FSEncoder_SEAN
    in_size=256 flavor) vs RGINet(fsencoder_type='sean') through
    convert_rgi — style vectors and structure feats."""
    from argparse import Namespace

    from models.networks import Net3

    from e4s2024_tpu.convert.torch_loader import convert_rgi
    from e4s2024_tpu.models.rgi import RGINet

    opts = Namespace(fsencoder_type="sean", num_seg_cls=12,
                     remaining_layer_idx=13, out_size=256, train_G=False,
                     n_styles=14, input_nc=3, start_from_latent_avg=True,
                     learn_in_w=False)
    torch.manual_seed(64)
    net = Net3(opts).eval()
    latent_avg = torch.randn(14, 512)
    net.latent_avg = latent_avg
    sd = _ref_compat.to_numpy_sd(net)
    sd["latent_avg"] = latent_avg.numpy()
    variables = convert_rgi(sd)

    rgi = RGINet(num_seg_cls=12, out_size=256, remaining_layer_idx=13,
                 fsencoder_type="sean")

    rng = np.random.default_rng(65)
    img = (rng.random((1, 256, 256, 3)).astype(np.float32)) * 2.0 - 1.0
    base = rng.integers(0, 12, (1, 16, 16))
    labels = np.repeat(np.repeat(base, 16, 1), 16, 2)
    onehot = np.eye(12, dtype=np.float32)[labels]

    with torch.no_grad():
        sv_t, feats_t = net.get_style_vectors(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(onehot.transpose(0, 3, 1, 2)))

    sv_j, feats_j = rgi.apply(variables, jnp.asarray(img),
                              jnp.asarray(onehot),
                              method=RGINet.get_style_vectors)
    np.testing.assert_allclose(np.asarray(sv_j), sv_t.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feats_j).transpose(0, 3, 1, 2),
                               feats_t.numpy(), atol=3e-4, rtol=1e-3)
