"""Blender recolor tests: attention behavior, forward shapes, spectral norm."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.blender import (
    Blender, BlenderRecolorer, part_masks_19, _masked_part_attention,
)
from e4s2024_tpu.convert.torch_loader import _spectral_conv


def test_part_masks():
    m = jnp.asarray(np.arange(19).reshape(1, 1, 19))
    parts = part_masks_19(m)
    assert set(parts) == {"skin", "hair", "eye", "nose", "lip", "tooth",
                          "ear", "brow", "head"}
    assert float(parts["eye"][0, 0, 4]) == 1.0 and float(parts["eye"][0, 0, 5]) == 1.0
    assert float(parts["head"][0, 0, 0]) == 0.0  # background not in head


def test_masked_attention_selects_target_colors(rng):
    n, c = 16, 8
    feat = rng.standard_normal((n, c)).astype(np.float32)
    rgb = rng.random((n, 3)).astype(np.float32)
    mA = np.zeros(n, np.float32); mA[:4] = 1
    mT = np.zeros(n, np.float32); mT[8:12] = 1
    out = np.asarray(_masked_part_attention(
        jnp.asarray(feat), jnp.asarray(feat), jnp.asarray(rgb),
        jnp.asarray(mA), jnp.asarray(mT), jnp.asarray(2.0)))
    # attended colors are convex combos of T-part colors only
    lo, hi = rgb[8:12].min(0), rgb[8:12].max(0)
    assert (out[:4] >= lo - 1e-5).all() and (out[:4] <= hi + 1e-5).all()
    # outside A-part: zero
    np.testing.assert_array_equal(out[4:], 0.0)
    # empty T-part -> zeros
    out2 = np.asarray(_masked_part_attention(
        jnp.asarray(feat), jnp.asarray(feat), jnp.asarray(rgb),
        jnp.asarray(mA), jnp.zeros(n), jnp.asarray(2.0)))
    np.testing.assert_array_equal(out2, 0.0)


@pytest.mark.slow
def test_blender_forward(rng):
    model = Blender()
    img_a = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    img_t = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 19, (1, 64, 64)))
    params = model.init(jax.random.PRNGKey(0), img_a, img_t, mask, mask)["params"]
    pred, pkgs = model.apply({"params": params}, img_a, img_t, mask, mask)
    assert pred.shape == (1, 64, 64, 3)
    assert pkgs.shape == (1, 64, 64, 12)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


def test_spectral_conv_matches_torch(rng):
    conv = torch.nn.utils.spectral_norm(torch.nn.Conv2d(4, 6, 3))
    conv.eval()
    with torch.no_grad():
        _ = conv(torch.zeros(1, 4, 8, 8))  # settle u/v
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    got = _spectral_conv(sd, "c")["kernel"]
    want = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    # identical math (sigma = u . (W_mat v)) but different fp32 reduction
    # order between numpy and torch -> compare with a relative tolerance
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-5)
