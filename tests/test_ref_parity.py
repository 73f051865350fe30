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
KP detector / HE estimator (face_vid2vid/modules/keypoint_detector.py).
RetinaFace is covered in test_detect.py the same way.

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
