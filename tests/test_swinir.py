"""SwinIR tests (tiny config): shapes, shifted-window mask, padding wrapper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.swinir import (
    SwinIR, SwinIRUpscaler, _shift_mask, _window_partition, _window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    w = _window_partition(x, 8)
    assert w.shape == (2 * 4, 64, 5)
    back = _window_reverse(w, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_properties():
    m = _shift_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)).issubset({0.0, -100.0})
    # first window (interior, no wraparound) fully visible
    np.testing.assert_array_equal(m[0], 0.0)


@pytest.fixture(scope="module")
def tiny_swinir():
    model = SwinIR(embed_dim=24, depths=(2, 2), heads=(2, 2), num_feat=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    return model, params


def test_x4_shape(tiny_swinir, rng):
    model, params = tiny_swinir
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_upscaler_pads_to_window(tiny_swinir, rng):
    model, params = tiny_swinir
    up = SwinIRUpscaler(params, model=model)
    out = up.upscale((rng.random((1, 13, 11, 3)) * 255).astype(np.float32))
    assert out.shape == (1, 52, 44, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 255


def test_enhancer_same_size_contract(tiny_swinir, rng):
    """SwinIREnhancer: (B,S,S,3) [0,255] -> same shape — the enhancers-dict
    contract (reference "SwinIR" mode, Face_swap_with_two_imgs.py:627-631)."""
    from e4s2024_tpu.models.swinir import SwinIREnhancer

    model, params = tiny_swinir
    enh = SwinIREnhancer(SwinIRUpscaler(params, model=model))
    x = (rng.random((2, 24, 24, 3)) * 255).astype(np.float32)
    out = np.asarray(enh.enhance_aligned(x))
    assert out.shape == x.shape
    assert out.min() >= 0 and out.max() <= 255 and np.isfinite(out).all()


def test_upscaler_kernel_fallback(tiny_swinir, rng):
    """fused=True on CPU cannot Mosaic-lower: the upscaler must warn, flip
    to the XLA path permanently, and still return a correct result
    (models/swinir.py SwinIRUpscaler._forward)."""
    import warnings

    model, params = tiny_swinir
    up = SwinIRUpscaler(params, model=model, fused=True)
    x = (rng.random((1, 16, 16, 3)) * 255).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = np.asarray(up.upscale(x))
    assert any("falling back" in str(x.message) for x in w)
    assert not up.fused
    ref = np.asarray(SwinIRUpscaler(params, model=model,
                                    fused=False).upscale(x))
    np.testing.assert_allclose(out, ref, atol=1e-4)
