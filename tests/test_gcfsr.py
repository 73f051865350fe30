"""GCFSR inpainting tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.gcfsr import FaceInpainting, FaceInpainter


@pytest.fixture(scope="module")
def inpaint64():
    model = FaceInpainting(out_size=64, narrow=0.25)
    x = jnp.zeros((1, 64, 64, 4))
    cond = jnp.zeros((1, 1))
    params = model.init(jax.random.PRNGKey(0), x, cond)["params"]
    return model, params


def test_forward_shapes(inpaint64, rng):
    model, params = inpaint64
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
    cond = jnp.asarray([[0.1], [0.3]], jnp.float32)
    img, latent = model.apply({"params": params}, x, cond)
    assert img.shape == (2, 64, 64, 3)
    assert latent.shape == (2, (6 - 2) * 2 - 2, 512)
    assert bool(jnp.isfinite(img).all())


def test_inpainter_preserves_outside_hole(inpaint64, rng):
    model, params = inpaint64
    ip = FaceInpainter(params, model=model)
    img = (rng.random((1, 256, 256, 3)) * 255).astype(np.float32)
    hole = np.zeros((1, 256, 256), np.float32)
    hole[:, 100:150, 100:150] = 1.0
    out = np.asarray(ip.inpaint(jnp.asarray(img), jnp.asarray(hole)))
    # outside the hole: unchanged
    np.testing.assert_allclose(out[0, :90, :90], img[0, :90, :90], atol=1.0)
    # inside the hole: generated (different from the zeroed input)
    assert out.shape == (1, 256, 256, 3)
