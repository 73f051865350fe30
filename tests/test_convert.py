"""Round-trip tests for the torch->flax converters.

Strategy: take a flax-initialized model, serialize it into a synthetic
torch-format state_dict (torch names + torch layouts, written here from the
reference checkpoint naming conventions), run the converter, and require the
result to be bit-identical in structure and values to the flax original.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models import Generator, Discriminator
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.convert import (
    convert_generator,
    convert_discriminator,
    convert_rgi,
    strip_module_prefix,
)


def _np(t):
    return np.asarray(t)


def _lin_to_torch(sd, name, p):
    sd[f"{name}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{name}.bias"] = _np(p["bias"])


def _conv_to_torch(sd, name, p, key="kernel"):
    sd[f"{name}.weight"] = _np(p[key]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{name}.bias"] = _np(p["bias"])


def _modconv_to_torch(sd, name, p):
    sd[f"{name}.weight"] = _np(p["weight"]).transpose(3, 2, 0, 1)[None]
    _lin_to_torch(sd, f"{name}.modulation", p["modulation"])


def _styled_to_torch(sd, name, p):
    _modconv_to_torch(sd, f"{name}.conv", p["conv"])
    sd[f"{name}.noise.weight"] = _np(p["noise_weight"])
    sd[f"{name}.activate.bias"] = _np(p["act_bias"])


def _torgb_to_torch(sd, name, p):
    _modconv_to_torch(sd, f"{name}.conv", p["conv"])
    sd[f"{name}.bias"] = _np(p["bias"]).transpose(0, 3, 1, 2)


def generator_to_torch_sd(params, prefix=""):
    sd = {}
    sd[f"{prefix}input.input"] = _np(params["input"]).transpose(0, 3, 1, 2)
    for i in range(1, 9):
        if f"style_{i}" in params:
            _lin_to_torch(sd, f"{prefix}style.{i}", params[f"style_{i}"])
    _styled_to_torch(sd, f"{prefix}conv1", params["conv1"])
    _torgb_to_torch(sd, f"{prefix}to_rgb1", params["to_rgb1"])
    i = 0
    while f"convs_{i}" in params:
        _styled_to_torch(sd, f"{prefix}convs.{i}", params[f"convs_{i}"])
        i += 1
    j = 0
    while f"to_rgbs_{j}" in params:
        _torgb_to_torch(sd, f"{prefix}to_rgbs.{j}", params[f"to_rgbs_{j}"])
        j += 1
    return sd


def encoder_to_torch_sd(params, prefix=""):
    sd = {}
    _conv_to_torch(sd, f"{prefix}input_layer.0", params["input_conv"])
    sd[f"{prefix}input_layer.2.weight"] = _np(params["input_prelu"]["alpha"])
    i = 0
    while f"body_{i}" in params:
        b = params[f"body_{i}"]
        t = f"{prefix}body.{i}"
        if "shortcut_conv" in b:
            _conv_to_torch(sd, f"{t}.shortcut_layer.0", b["shortcut_conv"])
        _conv_to_torch(sd, f"{t}.res_layer.1", b["conv1"])
        sd[f"{t}.res_layer.2.weight"] = _np(b["prelu"]["alpha"])
        _conv_to_torch(sd, f"{t}.res_layer.3", b["conv2"])
        _conv_to_torch(sd, f"{t}.res_layer.5.fc1", b["se"]["fc1"])
        _conv_to_torch(sd, f"{t}.res_layer.5.fc2", b["se"]["fc2"])
        i += 1
    return sd


def _trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    paths_a = [p for p, _ in fa[0]]
    paths_b = [p for p, _ in fb[0]]
    assert paths_a == paths_b, (
        f"missing: {set(map(str, paths_b)) - set(map(str, paths_a))}; "
        f"extra: {set(map(str, paths_a)) - set(map(str, paths_b))}"
    )
    for (pa, va), (_, vb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_generator_roundtrip(rng):
    gen = Generator(size=64, channel_multiplier=1)
    latent = jnp.zeros((1, 4, 10, 512))
    seg = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, (1, 64, 64))])
    params = gen.init(jax.random.PRNGKey(0), latent, None, seg)["params"]
    sd = generator_to_torch_sd(params)
    got = convert_generator(sd)
    _trees_equal(got, params)
    # converted params drive the model identically
    img0, _, _ = gen.apply({"params": params}, latent, None, seg)
    img1, _, _ = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, got)},
                           latent, None, seg)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))


def test_discriminator_roundtrip(rng):
    disc = Discriminator(size=64, channel_multiplier=1)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    params = disc.init(jax.random.PRNGKey(0), x)["params"]

    sd = {}
    _conv_to_torch(sd, "convs.0.0", params["conv_in"]["conv"], key="weight")
    sd["convs.0.1.bias"] = _np(params["conv_in"]["act_bias"])
    i = 0
    while f"res_{i}" in params:
        r = params[f"res_{i}"]
        t = f"convs.{i + 1}"
        _conv_to_torch(sd, f"{t}.conv1.0", r["conv1"]["conv"], key="weight")
        sd[f"{t}.conv1.1.bias"] = _np(r["conv1"]["act_bias"])
        _conv_to_torch(sd, f"{t}.conv2.1", r["conv2"]["conv"], key="weight")
        sd[f"{t}.conv2.2.bias"] = _np(r["conv2"]["act_bias"])
        _conv_to_torch(sd, f"{t}.skip.1", r["skip"]["conv"], key="weight")
        i += 1
    _conv_to_torch(sd, "final_conv.0", params["final_conv"]["conv"], key="weight")
    sd["final_conv.1.bias"] = _np(params["final_conv"]["act_bias"])
    _lin_to_torch(sd, "final_linear.0", params["final_linear_0"])
    _lin_to_torch(sd, "final_linear.1", params["final_linear_1"])

    got = convert_discriminator(sd)
    _trees_equal(got, params)


def test_rgi_roundtrip_with_module_prefix(rng):
    net = RGINet(out_size=64, channel_multiplier=1, remaining_layer_idx=7)
    img = jnp.zeros((1, 64, 64, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    variables = net.init(jax.random.PRNGKey(0), img, seg)
    params = variables["params"]

    sd = {}
    sd.update(encoder_to_torch_sd(params["encoder"], "encoder."))
    sd.update(generator_to_torch_sd(params["generator"], "G."))
    i = 0
    while f"mlp_{i}" in params:
        _lin_to_torch(sd, f"MLPs.{i}.mlp.0", params[f"mlp_{i}"]["fc1"])
        _lin_to_torch(sd, f"MLPs.{i}.mlp.2", params[f"mlp_{i}"]["fc2"])
        i += 1
    # simulate a DDP-saved checkpoint with latent_avg rider
    sd = {f"module.{k}": v for k, v in sd.items()}
    sd["latent_avg"] = rng.standard_normal((10, 512)).astype(np.float32)

    got = convert_rgi(sd)
    _trees_equal(got["params"], params)
    np.testing.assert_array_equal(got["buffers"]["latent_avg"], sd["latent_avg"])

    # converted variables actually run
    imgs, _ = net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, got["params"]),
         "buffers": jax.tree_util.tree_map(jnp.asarray, got["buffers"])},
        img, seg,
    )
    assert imgs.shape == (1, 64, 64, 3)
