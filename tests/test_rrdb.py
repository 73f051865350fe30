"""RRDBNet tests: shapes, residual behavior, converter structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.rrdb import RRDBNet, RealESRGANUpscaler
from e4s2024_tpu.convert import convert_rrdbnet
from tests.test_convert import _conv_to_torch


@pytest.fixture(scope="module")
def tiny_rrdb():
    model = RRDBNet(num_feat=16, num_block=2, num_grow=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    return model, params


def test_x4_shape(tiny_rrdb, rng):
    model, params = tiny_rrdb
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_upscaler_wrapper(tiny_rrdb, rng):
    model, params = tiny_rrdb
    up = RealESRGANUpscaler(params, model=model)
    out = up.upscale((rng.random((1, 8, 8, 3)) * 255).astype(np.float32))
    assert out.shape == (1, 32, 32, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 255


def test_converter_roundtrip(tiny_rrdb):
    model, params = tiny_rrdb
    sd = {}
    for k in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr",
              "conv_last"):
        _conv_to_torch(sd, k, params[k])
    i = 0
    while f"body_{i}" in params:
        for r in (1, 2, 3):
            for c in range(1, 6):
                _conv_to_torch(sd, f"body.{i}.rdb{r}.conv{c}",
                               params[f"body_{i}"][f"rdb{r}"][f"conv{c}"])
        i += 1
    got = convert_rrdbnet(sd)
    fa = jax.tree_util.tree_flatten_with_path(got)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (pa, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))
