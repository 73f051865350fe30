"""GFPGAN clean-arch tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.gfpgan import GFPGANv1Clean, GFPGANEnhancer


@pytest.fixture(scope="module")
def tiny_gfpgan():
    model = GFPGANv1Clean(out_size=64, channel_multiplier=1, narrow=0.25)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    return model, params


def test_forward(tiny_gfpgan, rng):
    model, params = tiny_gfpgan
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.2)
    img, latent = model.apply({"params": params}, x)
    assert img.shape == (2, 64, 64, 3)
    assert latent.shape == (2, 2 * 6 - 2, 512)
    assert bool(jnp.isfinite(img).all())


def test_enhancer(tiny_gfpgan, rng):
    model, params = tiny_gfpgan
    enh = GFPGANEnhancer(params, model=model)
    out = enh.enhance_aligned((rng.random((1, 96, 96, 3)) * 255).astype(np.float32))
    assert out.shape == (1, 96, 96, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 255
