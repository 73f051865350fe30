"""Modulated deformable conv (DCNv2) vs. an explicit numpy loop oracle."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from e4s2024_tpu.ops.deform_conv import DCNv2Pack, modulated_deform_conv2d


def _oracle(x, offset, mask, weight, bias, stride, padding, dilation):
    """Direct per-tap loop implementation of DCNv2 (zero-border bilinear)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    _, ho, wo, g, k, _ = offset.shape
    cg = cin // g
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, py, px):  # img (H, W, Cg)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        val = np.zeros(img.shape[-1])
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    wgt = ((1 - abs(py - yi)) * (1 - abs(px - xi)))
                    val += wgt * img[yi, xi]
        return val

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(kh * kw):
                    ky, kx = divmod(ki, kw)
                    for gi in range(g):
                        py = oy * stride - padding + ky * dilation + \
                            offset[bi, oy, ox, gi, ki, 0]
                        px = ox * stride - padding + kx * dilation + \
                            offset[bi, oy, ox, gi, ki, 1]
                        v = sample(x[bi, :, :, gi * cg:(gi + 1) * cg], py, px)
                        v = v * mask[bi, oy, ox, gi, ki]
                        out[bi, oy, ox] += v @ weight[
                            ky, kx, gi * cg:(gi + 1) * cg]
    return (out + bias).astype(np.float32)


def test_matches_loop_oracle(rng):
    b, h, w, cin, cout, g = 1, 6, 7, 4, 5, 2
    kh = kw = 3
    stride, padding, dilation = 2, 1, 1
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, ho, wo, g, kh * kw, 2)) * 2).astype(
        np.float32)
    mask = rng.random((b, ho, wo, g, kh * kw)).astype(np.float32)
    weight = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32)

    got = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias),
        stride=stride, padding=padding, dilation=dilation))
    want = _oracle(x, offset, mask, weight, bias, stride, padding, dilation)
    assert got.shape == (b, ho, wo, cout)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_zero_offset_unit_mask_is_plain_conv(rng):
    b, h, w, cin, cout = 2, 8, 8, 6, 4
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    weight = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2
    offset = jnp.zeros((b, h, w, 1, 9, 2))
    mask = jnp.ones((b, h, w, 1, 9))
    got = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), offset, mask, jnp.asarray(weight),
        stride=1, padding=1))
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dcnv2pack_zero_init_is_half_conv(rng):
    """conv_offset is zero-init, so offsets=0 and mask=sigmoid(0)=0.5:
    the module must equal 0.5 * plain conv with its own weight."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    mod = DCNv2Pack(features=5, deformable_groups=2)
    params = mod.init(jax.random.PRNGKey(0), x, feat)["params"]
    got = np.asarray(mod.apply({"params": params}, x, feat))
    want = 0.5 * np.asarray(lax.conv_general_dilated(
        x, params["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))) + np.asarray(
            params["bias"])
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert bool(jnp.isfinite(jnp.asarray(got)).all())


def test_jit_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    mod = DCNv2Pack(features=4)
    params = mod.init(jax.random.PRNGKey(0), x, feat)["params"]

    def loss(p):
        return jnp.sum(mod.apply({"params": p}, x, feat) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    assert bool(jnp.isfinite(g["weight"]).all())
    assert bool(jnp.isfinite(g["conv_offset"]["kernel"]).all())
