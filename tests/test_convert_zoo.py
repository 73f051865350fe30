"""Round-trip tests for the round-2 converter families: faceVid2Vid, GCFSR,
GFPGAN, Hopenet, VGG16. Pattern: init the tiny Flax module, build the inverse
torch-style state_dict from its params, convert, compare trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_convert import _conv_to_torch, _lin_to_torch, _np, _trees_equal


def _bn_to_torch(sd, name, p):
    sd[f"{name}.running_mean"] = _np(p["mean"])
    sd[f"{name}.running_var"] = _np(p["var"])
    if "scale" in p:
        sd[f"{name}.weight"] = _np(p["scale"])
        sd[f"{name}.bias"] = _np(p["bias"])


def _conv3_to_torch(sd, name, p):
    sd[f"{name}.weight"] = _np(p["kernel"]).transpose(4, 3, 0, 1, 2)
    if "bias" in p:
        sd[f"{name}.bias"] = _np(p["bias"])


# ------------------------------------------------------------- faceVid2Vid


def _convnorm_inv(sd, name, p, conv3d=False):
    (_conv3_to_torch if conv3d else _conv_to_torch)(sd, f"{name}.conv",
                                                    p["conv"])
    _bn_to_torch(sd, f"{name}.norm", p["norm"])


def _bottleneck_inv(sd, name, p):
    for i in (1, 2, 3):
        _conv_to_torch(sd, f"{name}.conv{i}", p[f"conv{i}"])
        _bn_to_torch(sd, f"{name}.norm{i}", p[f"norm{i}"])
    if "skip" in p:
        _conv_to_torch(sd, f"{name}.skip", p["skip"])
        _bn_to_torch(sd, f"{name}.norm4", p["norm4"])


def _spade_inv(sd, name, p):
    _conv_to_torch(sd, f"{name}.mlp_shared.0", p["mlp_shared"])
    _conv_to_torch(sd, f"{name}.mlp_gamma", p["mlp_gamma"])
    _conv_to_torch(sd, f"{name}.mlp_beta", p["mlp_beta"])


def _spade_block_inv(sd, name, p):
    _spade_inv(sd, f"{name}.norm_0", p["norm_0"])
    _spade_inv(sd, f"{name}.norm_1", p["norm_1"])
    _conv_to_torch(sd, f"{name}.conv_0", p["conv_0"])
    _conv_to_torch(sd, f"{name}.conv_1", p["conv_1"])
    if "conv_s" in p:
        _spade_inv(sd, f"{name}.norm_s", p["norm_s"])
        _conv_to_torch(sd, f"{name}.conv_s", p["conv_s"])


def test_facevid2vid_kp_roundtrip():
    from e4s2024_tpu.models.facevid2vid import KPDetector
    from e4s2024_tpu.convert.torch_loader import convert_facevid2vid_kp

    net = KPDetector(block_expansion=4, max_features=32, reshape_features=64,
                     reshape_depth=4)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 256, 3)))["params"]
    sd = {}
    pred = params["predictor"]
    _conv_to_torch(sd, "predictor.conv", pred["conv"])
    i = 0
    while f"down_{i}" in pred:
        _convnorm_inv(sd, f"predictor.down_blocks.down{i}", pred[f"down_{i}"])
        i += 1
    i = 0
    while f"up_{i}" in pred:
        _convnorm_inv(sd, f"predictor.up_blocks.up{i}", pred[f"up_{i}"],
                      conv3d=True)
        i += 1
    _conv3_to_torch(sd, "kp", params["kp"])
    _trees_equal(convert_facevid2vid_kp(sd), params)


def test_facevid2vid_he_roundtrip():
    from e4s2024_tpu.models.facevid2vid import HEEstimator
    from e4s2024_tpu.convert.torch_loader import convert_facevid2vid_he

    net = HEEstimator(block_expansion=8, width=16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {}
    for i in range(1, 6):
        _conv_to_torch(sd, f"conv{i}", params[f"conv{i}"])
        _bn_to_torch(sd, f"norm{i}", params[f"norm{i}"])
    for blk, n in (("block1", 3), ("block3", 3), ("block5", 5), ("block7", 2)):
        for i in range(n):
            _bottleneck_inv(sd, f"{blk}.b{blk[-1]}_{i}", params[f"{blk}_{i}"])
    for blk in ("block2", "block4", "block6"):
        _bottleneck_inv(sd, blk, params[blk])
    for fc in ("fc_roll", "fc_pitch", "fc_yaw", "fc_t", "fc_exp"):
        _lin_to_torch(sd, fc, params[fc])
    _trees_equal(convert_facevid2vid_he(sd), params)


def test_facevid2vid_generator_roundtrip():
    from e4s2024_tpu.models.facevid2vid import OcclusionAwareSPADEGenerator
    from e4s2024_tpu.convert.torch_loader import convert_facevid2vid_generator

    net = OcclusionAwareSPADEGenerator(
        block_expansion=8, max_features=32, reshape_channel=8,
        reshape_depth=4, num_resblocks=2, dm_block_expansion=4,
        dm_max_features=32, decoder_ic=8)
    kp = {"value": jnp.zeros((1, 15, 3))}
    # 256^2: the 5-level dense-motion hourglass needs the real geometry
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                      kp, kp)["params"]
    sd = {}
    _convnorm_inv(sd, "first", params["first"])
    _conv_to_torch(sd, "second", params["second"])
    _convnorm_inv(sd, "third", params["third"])
    _conv_to_torch(sd, "fourth", params["fourth"])
    i = 0
    while f"down_blocks_{i}" in params:
        _convnorm_inv(sd, f"down_blocks.{i}", params[f"down_blocks_{i}"])
        i += 1
    i = 0
    while f"resblocks_3d_{i}" in params:
        r = params[f"resblocks_3d_{i}"]
        _conv3_to_torch(sd, f"resblocks_3d.3dr{i}.conv1", r["conv1"])
        _conv3_to_torch(sd, f"resblocks_3d.3dr{i}.conv2", r["conv2"])
        _bn_to_torch(sd, f"resblocks_3d.3dr{i}.norm1", r["norm1"])
        _bn_to_torch(sd, f"resblocks_3d.3dr{i}.norm2", r["norm2"])
        i += 1
    dm = params["dense_motion_network"]
    _conv3_to_torch(sd, "dense_motion_network.compress", dm["compress"])
    _bn_to_torch(sd, "dense_motion_network.norm", dm["norm"])
    _conv3_to_torch(sd, "dense_motion_network.mask", dm["mask"])
    _conv_to_torch(sd, "dense_motion_network.occlusion", dm["occlusion"])
    hg = dm["hourglass"]
    _conv3_to_torch(sd, "dense_motion_network.hourglass.decoder.conv",
                    hg["conv"])
    _bn_to_torch(sd, "dense_motion_network.hourglass.decoder.norm", hg["norm"])
    i = 0
    while f"down_{i}" in hg:
        _convnorm_inv(
            sd, f"dense_motion_network.hourglass.encoder.down_blocks.{i}",
            hg[f"down_{i}"], conv3d=True)
        _convnorm_inv(
            sd, f"dense_motion_network.hourglass.decoder.up_blocks.{i}",
            hg[f"up_{i}"], conv3d=True)
        i += 1
    dec = params["decoder"]
    _conv_to_torch(sd, "decoder.fc", dec["fc"])
    _conv_to_torch(sd, "decoder.conv_img", dec["conv_img"])
    for i in range(6):
        _spade_block_inv(sd, f"decoder.G_middle_{i}", dec[f"G_middle_{i}"])
    _spade_block_inv(sd, "decoder.up_0", dec["up_0"])
    _spade_block_inv(sd, "decoder.up_1", dec["up_1"])
    _trees_equal(convert_facevid2vid_generator(sd), params)


# ------------------------------------------------------------------- GCFSR


def _eq_convlayer_inv(sd, name, p, downsample=False, activate=True):
    i = 1 if downsample else 0
    _conv_to_torch(sd, f"{name}.{i}", p["conv"], key="weight")
    if activate:
        sd[f"{name}.{i + 1}.bias"] = _np(p["act_bias"])


def _gcfsr_styled_inv(sd, name, p):
    from tests.test_convert import _modconv_to_torch
    _modconv_to_torch(sd, f"{name}.modulated_conv", p["conv"])
    sd[f"{name}.weight"] = _np(p["noise_weight"])
    sd[f"{name}.activate.bias"] = _np(p["act_bias"])


def _gcfsr_torgb_inv(sd, name, p):
    from tests.test_convert import _modconv_to_torch
    _modconv_to_torch(sd, f"{name}.modulated_conv", p["conv"])
    sd[f"{name}.bias"] = _np(p["bias"]).transpose(0, 3, 1, 2)


def test_gcfsr_roundtrip():
    from e4s2024_tpu.models.gcfsr import FaceInpainting
    from e4s2024_tpu.convert.torch_loader import convert_gcfsr

    net = FaceInpainting(out_size=64, channel_multiplier=2, narrow=0.0625)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
                      jnp.zeros((1, 1)))["params"]
    sd = {}
    _eq_convlayer_inv(sd, "conv_body_first", params["conv_body_first"])
    _eq_convlayer_inv(sd, "final_conv", params["final_conv"])
    _eq_convlayer_inv(sd, "final_down1", params["final_down1"], downsample=True)
    _eq_convlayer_inv(sd, "final_down2", params["final_down2"], downsample=True)
    _lin_to_torch(sd, "final_linear", params["final_linear"])
    _gcfsr_styled_inv(sd, "style_conv1", params["style_conv1"])
    _gcfsr_torgb_inv(sd, "to_rgb1", params["to_rgb1"])
    i = 0
    while f"conv_body_down_{i}" in params:
        _eq_convlayer_inv(sd, f"conv_body_down.{i}",
                          params[f"conv_body_down_{i}"], downsample=True)
        i += 1
    j = 0
    while f"condition_scale1_{j}" in params:
        _lin_to_torch(sd, f"condition_scale1.{j}", params[f"condition_scale1_{j}"])
        _lin_to_torch(sd, f"condition_scale2.{j}", params[f"condition_scale2_{j}"])
        _eq_convlayer_inv(sd, f"condition_shift.{j}",
                          params[f"condition_shift_{j}"], activate=False)
        j += 1
    k = 0
    while f"style_convs_{k}" in params:
        _gcfsr_styled_inv(sd, f"style_convs.{k}", params[f"style_convs_{k}"])
        k += 1
    p_ = 0
    while f"to_rgbs_{p_}" in params:
        _gcfsr_torgb_inv(sd, f"to_rgbs.{p_}", params[f"to_rgbs_{p_}"])
        p_ += 1
    _trees_equal(convert_gcfsr(sd), params)


# ------------------------------------------------------------------ GFPGAN


def _clean_modconv_inv(sd, name, p):
    sd[f"{name}.weight"] = _np(p["weight"]).transpose(3, 2, 0, 1)[None]
    _lin_to_torch(sd, f"{name}.modulation", p["modulation"])


def _clean_styled_inv(sd, name, p):
    _clean_modconv_inv(sd, f"{name}.modulated_conv", p["conv"])
    sd[f"{name}.weight"] = _np(p["noise_weight"])
    sd[f"{name}.bias"] = _np(p["bias"]).transpose(0, 3, 1, 2)


def _clean_torgb_inv(sd, name, p):
    _clean_modconv_inv(sd, f"{name}.modulated_conv", p["conv"])
    sd[f"{name}.bias"] = _np(p["bias"]).transpose(0, 3, 1, 2)


def _gfpgan_res_inv(sd, name, p):
    _conv_to_torch(sd, f"{name}.conv1", p["conv1"])
    _conv_to_torch(sd, f"{name}.conv2", p["conv2"])
    _conv_to_torch(sd, f"{name}.skip", p["skip"])


def test_gfpgan_roundtrip():
    from e4s2024_tpu.models.gfpgan import GFPGANv1Clean
    from e4s2024_tpu.convert.torch_loader import convert_gfpgan

    net = GFPGANv1Clean(out_size=64, channel_multiplier=1, narrow=0.25)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {}
    _conv_to_torch(sd, "conv_body_first", params["conv_body_first"])
    _conv_to_torch(sd, "final_conv", params["final_conv"])
    _lin_to_torch(sd, "final_linear", params["final_linear"])
    i = 0
    while f"conv_body_down_{i}" in params:
        _gfpgan_res_inv(sd, f"conv_body_down.{i}", params[f"conv_body_down_{i}"])
        i += 1
    i = 0
    while f"conv_body_up_{i}" in params:
        _gfpgan_res_inv(sd, f"conv_body_up.{i}", params[f"conv_body_up_{i}"])
        _conv_to_torch(sd, f"condition_scale.{i}.0", params[f"condition_scale_{i}_0"])
        _conv_to_torch(sd, f"condition_scale.{i}.2", params[f"condition_scale_{i}_2"])
        _conv_to_torch(sd, f"condition_shift.{i}.0", params[f"condition_shift_{i}_0"])
        _conv_to_torch(sd, f"condition_shift.{i}.2", params[f"condition_shift_{i}_2"])
        i += 1
    dec = params["stylegan_decoder"]
    sd["stylegan_decoder.constant_input.weight"] = _np(
        dec["constant_input"]).transpose(0, 3, 1, 2)
    _clean_styled_inv(sd, "stylegan_decoder.style_conv1", dec["style_conv1"])
    _clean_torgb_inv(sd, "stylegan_decoder.to_rgb1", dec["to_rgb1"])
    k = 0
    while f"style_convs_{k}" in dec:
        _clean_styled_inv(sd, f"stylegan_decoder.style_convs.{k}",
                          dec[f"style_convs_{k}"])
        k += 1
    p_ = 0
    while f"to_rgbs_{p_}" in dec:
        _clean_torgb_inv(sd, f"stylegan_decoder.to_rgbs.{p_}", dec[f"to_rgbs_{p_}"])
        p_ += 1
    _trees_equal(convert_gfpgan(sd), params)


# ------------------------------------------------------- Hopenet and VGG16


def test_hopenet_roundtrip():
    from e4s2024_tpu.models.hopenet import Hopenet
    from e4s2024_tpu.convert.torch_loader import convert_hopenet

    layers = (1, 1, 1, 1)
    net = Hopenet(layers=layers)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {}
    _conv_to_torch(sd, "conv1", params["conv1"])
    _bn_to_torch(sd, "bn1", params["bn1"])
    for fc in ("fc_yaw", "fc_pitch", "fc_roll"):
        _lin_to_torch(sd, fc, params[fc])
    for li, n in enumerate(layers):
        for bi in range(n):
            p = params[f"layer{li + 1}_{bi}"]
            t = f"layer{li + 1}.{bi}"
            for c in ("conv1", "conv2", "conv3"):
                _conv_to_torch(sd, f"{t}.{c}", p[c])
            for b in ("bn1", "bn2", "bn3"):
                _bn_to_torch(sd, f"{t}.{b}", p[b])
            if "down_conv" in p:
                _conv_to_torch(sd, f"{t}.downsample.0", p["down_conv"])
                _bn_to_torch(sd, f"{t}.downsample.1", p["down_bn"])
    _trees_equal(convert_hopenet(sd, layers), params)


def test_vgg16_roundtrip():
    from e4s2024_tpu.models.vgg import VGG16Features
    from e4s2024_tpu.convert.torch_loader import convert_vgg16

    net = VGG16Features(taps=(3, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sd = {}
    for name, p in params.items():
        idx = int(name.split("_")[1])
        _conv_to_torch(sd, f"features.{idx}", p)
    got = convert_vgg16(sd)
    _trees_equal(got, params)


def test_checkpoint_envelopes(tmp_path):
    """Real released files wrap weights in envelopes ({'params_ema': {...}}
    basicsr-style, {'generator': {...}, 'kp_detector': {...}} FOMM-style).
    load_torch_checkpoint must flatten them (not silently drop the nested
    dicts) and the converters must unwrap them."""
    torch = pytest.importorskip("torch")

    from e4s2024_tpu.convert.torch_loader import (
        convert_rrdbnet,
        load_torch_checkpoint,
    )
    from e4s2024_tpu.models.rrdb import RRDBNet

    tnet_sd = {}
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    # tiny RRDBNet(num_feat=8, num_block=1, num_grow=4) torch layout
    tnet_sd["conv_first.weight"] = t(8, 3, 3, 3)
    tnet_sd["conv_first.bias"] = t(8)
    for r in (1, 2, 3):
        cin = 8
        for c in range(1, 6):
            cout = 4 if c < 5 else 8
            tnet_sd[f"body.0.rdb{r}.conv{c}.weight"] = t(cout, cin, 3, 3)
            tnet_sd[f"body.0.rdb{r}.conv{c}.bias"] = t(cout)
            cin += 4 if c < 5 else 0
            if c == 4:
                cin = 8 + 4 * 4
    for k in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        tnet_sd[f"{k}.weight"] = t(8, 8, 3, 3)
        tnet_sd[f"{k}.bias"] = t(8)
    tnet_sd["conv_last.weight"] = t(3, 8, 3, 3)
    tnet_sd["conv_last.bias"] = t(3)

    path = tmp_path / "realesr.pth"
    torch.save({"params_ema": tnet_sd}, path)
    flat = load_torch_checkpoint(str(path))
    assert flat, "flattened checkpoint must not be empty"
    params = convert_rrdbnet(flat)

    out = RRDBNet(num_feat=8, num_block=1, num_grow=4).apply(
        {"params": params}, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())

    # FOMM-style nested file -> flattened -> re-nested by the converter
    from e4s2024_tpu.convert.torch_loader import _nest_flat_ckpt

    torch.save({"kp_detector": {"w": torch.ones(2)},
                "generator": {"b": torch.zeros(1)}}, tmp_path / "fomm.pth")
    flat2 = load_torch_checkpoint(str(tmp_path / "fomm.pth"))
    nested = _nest_flat_ckpt(flat2)
    assert set(nested) == {"kp_detector", "generator"}
    assert nested["kp_detector"]["w"].shape == (2,)
