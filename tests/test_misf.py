"""MISF inpainting: per-pixel-filter oracle, generator shapes, converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.misf import KPN, MISFGenerator, MISFInpainter, per_pixel_filter


def test_per_pixel_filter_matches_loop(rng):
    b, h, w, c = 1, 5, 6, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    k = rng.standard_normal((b, h, w, c, 9)).astype(np.float32)
    got = np.asarray(per_pixel_filter(jnp.asarray(x), jnp.asarray(k)))

    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros_like(x)
    for y in range(h):
        for xx in range(w):
            for i in range(3):
                for j in range(3):
                    want[:, y, xx] += xp[:, y + i, xx + j] * k[:, y, xx, :,
                                                               i * 3 + j]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_per_pixel_filter_identity_kernel(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    k = np.zeros((2, 8, 8, 4, 9), np.float32)
    k[..., 4] = 1.0  # center tap
    got = np.asarray(per_pixel_filter(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_kpn_shapes(rng):
    inp = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((1, 32, 32, 128)).astype(
        np.float32))
    kpn = KPN(num_kernels=64, feat_channels=256)
    params = kpn.init(jax.random.PRNGKey(0), inp, feat)["params"]
    kf, ki = kpn.apply({"params": params}, inp, feat)
    assert kf.shape == (1, 16, 16, 256, 9)
    assert ki.shape == (1, 64, 64, 3, 9)


def test_generator_and_inpainter(rng):
    gen = MISFGenerator(residual_blocks=2, num_kernels=64)
    x4 = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x4)["params"]
    out = gen.apply({"params": params}, x4)
    assert out.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0

    inp = MISFInpainter.__new__(MISFInpainter)
    inp.model = gen
    from e4s2024_tpu.utils.packing import jit_with_packed_params
    inp._apply = jit_with_packed_params(
        lambda p, i, m: inp._forward(p, i, m), params)
    inp.params = params
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, 20:40, 20:40] = 1.0
    res = np.asarray(inp(img, jnp.asarray(mask)))
    # outside the hole the image must be untouched
    outside = (mask[..., 0] == 0)
    np.testing.assert_allclose(res[outside], np.asarray(img)[outside],
                               atol=1e-6)
    assert not np.allclose(res[~outside], np.asarray(img)[~outside])


def test_converter_structure(rng):
    """Build a fake torch-style state dict and check it loads + runs."""
    import torch

    from e4s2024_tpu.convert.torch_loader import convert_misf

    def conv_sd(prefix, cin, cout, k):
        return {f"{prefix}.weight": torch.randn(cout, cin, k, k).numpy(),
                f"{prefix}.bias": torch.randn(cout).numpy()}

    def convt_sd(prefix, cin, cout, k):
        return {f"{prefix}.weight": torch.randn(cin, cout, k, k).numpy(),
                f"{prefix}.bias": torch.randn(cout).numpy()}

    def basic_sd(prefix, cin, cout):
        sd = {}
        sd.update(conv_sd(f"{prefix}.conv1.0", cin, cout, 3))
        sd.update(conv_sd(f"{prefix}.conv1.2", cout, cout, 3))
        sd.update(conv_sd(f"{prefix}.conv1.4", cout, cout, 3))
        return sd

    sd = {}
    sd.update(conv_sd("encoder0.1", 4, 64, 7))
    sd.update(conv_sd("encoder1.0", 64, 128, 4))
    sd.update(conv_sd("encoder2.0", 128, 256, 4))
    for i in range(2):
        sd.update(conv_sd(f"middle.{i}.conv_block.1", 256, 256, 3))
        sd.update(conv_sd(f"middle.{i}.conv_block.5", 256, 256, 3))
    sd.update(convt_sd("decoder.0", 256, 128, 4))
    sd.update(convt_sd("decoder.3", 128, 64, 4))
    sd.update(conv_sd("decoder.7", 64, 3, 7))
    sd.update(basic_sd("kpn_model.conv1", 4, 64))
    sd.update(basic_sd("kpn_model.conv2", 64, 128))
    sd.update(basic_sd("kpn_model.conv3", 256, 256))
    sd.update(basic_sd("kpn_model.conv4", 256, 512))
    sd.update(basic_sd("kpn_model.conv7", 768, 256))
    sd.update(basic_sd("kpn_model.conv8", 512, 128))
    sd.update(basic_sd("kpn_model.conv9", 192, 64))
    sd.update(conv_sd("kpn_model.kernels", 256, 64 * 9, 1))
    sd.update(conv_sd("kpn_model.core_img", 64, 27, 1))

    params = convert_misf(sd)
    gen = MISFGenerator(residual_blocks=2, num_kernels=64)
    x4 = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    ref = gen.init(jax.random.PRNGKey(0), x4)["params"]
    # structure must match what init creates
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(np.asarray, ref))
    out = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    x4)
    assert bool(jnp.isfinite(out).all())


def test_registry():
    from e4s2024_tpu.pipelines.inpaint_registry import make_inpainter

    with pytest.raises(ValueError):
        make_inpainter("misf")
    with pytest.raises(KeyError):
        make_inpainter("nope")
