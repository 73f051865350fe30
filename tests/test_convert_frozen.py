"""Converter round-trips for the frozen loss nets (arcface, parsing unet, lpips)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.arcface import ArcFaceBackbone
from e4s2024_tpu.models.parser_unet import ParsingUNet
from e4s2024_tpu.models.lpips import LPIPS
from e4s2024_tpu.convert import convert_arcface, convert_parsing_unet, convert_lpips
from tests.test_convert import _conv_to_torch, _lin_to_torch, _np, _trees_equal


def _bn_inv(sd, name, p):
    sd[f"{name}.running_mean"] = _np(p["mean"])
    sd[f"{name}.running_var"] = _np(p["var"])
    sd[f"{name}.weight"] = _np(p["scale"])
    sd[f"{name}.bias"] = _np(p["bias"])


def test_arcface_roundtrip():
    net = ArcFaceBackbone()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)),
                      multi_scale=True)["params"]
    sd = {}
    _conv_to_torch(sd, "input_layer.0", params["input_conv"])
    _bn_inv(sd, "input_layer.1", params["input_bn"])
    sd["input_layer.2.weight"] = _np(params["input_prelu"]["alpha"])
    i = 0
    while f"body_{i}" in params:
        b = params[f"body_{i}"]
        t = f"body.{i}"
        _bn_inv(sd, f"{t}.res_layer.0", b["bn0"])
        _conv_to_torch(sd, f"{t}.res_layer.1", b["conv1"])
        sd[f"{t}.res_layer.2.weight"] = _np(b["prelu"]["alpha"])
        _conv_to_torch(sd, f"{t}.res_layer.3", b["conv2"])
        _bn_inv(sd, f"{t}.res_layer.4", b["bn2"])
        _conv_to_torch(sd, f"{t}.res_layer.5.fc1", b["se"]["fc1"])
        _conv_to_torch(sd, f"{t}.res_layer.5.fc2", b["se"]["fc2"])
        if "shortcut_conv" in b:
            _conv_to_torch(sd, f"{t}.shortcut_layer.0", b["shortcut_conv"])
            _bn_inv(sd, f"{t}.shortcut_layer.1", b["shortcut_bn"])
        i += 1
    _bn_inv(sd, "output_layer.0", params["output_bn"])
    sd["output_layer.3.weight"] = _np(params["output_fc_kernel"]).T
    sd["output_layer.3.bias"] = _np(params["output_fc_bias"])
    _bn_inv(sd, "output_layer.4", params["output_bn1d"])

    got = convert_arcface(sd)
    _trees_equal(got, params)


def test_parsing_unet_roundtrip():
    net = ParsingUNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sd = {}

    def conv2_inv(name, p):
        _conv_to_torch(sd, f"{name}.conv1.0", p["conv1"])
        _bn_inv(sd, f"{name}.conv1.1", p["bn1"])
        _conv_to_torch(sd, f"{name}.conv2.0", p["conv2"])
        _bn_inv(sd, f"{name}.conv2.1", p["bn2"])

    for blk in ("conv1", "conv2", "conv3", "conv4", "center"):
        conv2_inv(blk, params[blk])
    for blk in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        up = params[blk]["up"]
        k = _np(up["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        sd[f"{blk}.up.weight"] = np.ascontiguousarray(k)
        sd[f"{blk}.up.bias"] = _np(up["bias"])
        conv2_inv(f"{blk}.conv", params[blk]["conv"])
    _conv_to_torch(sd, "final", params["final"])

    got = convert_parsing_unet(sd)
    _trees_equal(got, params)


def test_lpips_roundtrip():
    net = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x, x)["params"]
    alex_sd, lin_sd = {}, {}
    for i, idx in enumerate((0, 3, 6, 8, 10)):
        _conv_to_torch(alex_sd, f"features.{idx}", params["net"][f"conv{idx}"])
        lin_sd[f"{i}.1.weight"] = _np(params[f"lin_{i}"]).reshape(1, -1, 1, 1)
    got = convert_lpips(alex_sd, lin_sd)
    _trees_equal(got, params)
