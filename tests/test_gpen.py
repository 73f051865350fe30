"""GPEN enhancer tests: forward shapes, concat-noise behavior, converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.gpen import GPENFullGenerator, GPENEnhancer, gpen_channels
from e4s2024_tpu.convert import convert_gpen
from tests.test_convert import generator_to_torch_sd, _lin_to_torch, _conv_to_torch, _np


@pytest.fixture(scope="module")
def gpen64():
    model = GPENFullGenerator(size=64, narrow=0.25)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_forward_shapes(gpen64, rng):
    model, params = gpen64
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3)
    img, latent = model.apply({"params": params}, x)
    assert img.shape == (2, 64, 64, 3)
    assert latent.shape == (2, 2 * 6 - 2, 512)
    assert bool(jnp.isfinite(img).all())


def test_enhancer_wrapper(gpen64, rng):
    model, params = gpen64
    enh = GPENEnhancer(params, size=64, model=model)
    out = enh.enhance_aligned(
        jnp.asarray((rng.random((1, 96, 96, 3)) * 255).astype(np.float32)))
    assert out.shape == (1, 96, 96, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 255


def test_converter_roundtrip(gpen64):
    model, params = gpen64
    sd = generator_to_torch_sd(params["generator"], "generator.")
    _lin_to_torch(sd, "final_linear.0", params["final_linear"])
    _conv_to_torch(sd, "ecd0.0.0", params["ecd_0"]["conv"], key="weight")
    sd["ecd0.0.1.bias"] = _np(params["ecd_0"]["act_bias"])
    i = 1
    while f"ecd_{i}" in params:
        _conv_to_torch(sd, f"ecd{i}.0.1", params[f"ecd_{i}"]["conv"], key="weight")
        sd[f"ecd{i}.0.2.bias"] = _np(params[f"ecd_{i}"]["act_bias"])
        i += 1
    got = convert_gpen(sd)
    fa = jax.tree_util.tree_flatten_with_path(got)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (pa, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_channels_table():
    ch = gpen_channels()
    assert ch[512] == 64 and ch[4] == 512 and ch[2048] == 16
