"""Golden tests for (regional) modulated conv against from-the-math torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from e4s2024_tpu.ops.modconv import modulated_conv2d, regional_modulated_conv2d
from tests.test_upfirdn import torch_upfirdn2d


def torch_modulated_conv(x, weight, style, demodulate, up=False, down=False, blur_k=None):
    """Oracle: StyleGAN2 modulated conv math. x NCHW, weight (Cout, Cin, kh, kw),
    style (B, Cin) already-computed modulation scales."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    scale = 1.0 / np.sqrt(cin * kh * kw)
    wmod = scale * weight[None] * style[:, None, :, None, None]  # (B,Cout,Cin,kh,kw)
    if demodulate:
        d = torch.rsqrt(wmod.pow(2).sum([2, 3, 4]) + 1e-8)
        wmod = wmod * d[:, :, None, None, None]

    if up:
        wt = wmod.transpose(1, 2).reshape(b * cin, cout, kh, kw)
        xg = x.reshape(1, b * cin, h, w)
        out = F.conv_transpose2d(xg, wt, stride=2, padding=0, groups=b)
        out = out.reshape(b, cout, out.shape[2], out.shape[3])
        p = blur_k.shape[0] - 2 - (kh - 1)
        out = torch_upfirdn2d(out, blur_k * 4.0, 1, 1, ((p + 1) // 2 + 1, p // 2 + 1))
        return out
    if down:
        p = blur_k.shape[0] - 2 + (kh - 1)
        x = torch_upfirdn2d(x, blur_k, 1, 1, ((p + 1) // 2, p // 2))
        xg = x.reshape(1, b * cin, x.shape[2], x.shape[3])
        out = F.conv2d(xg, wmod.reshape(b * cout, cin, kh, kw), stride=2, groups=b)
        return out.reshape(b, cout, out.shape[2], out.shape[3])

    xg = x.reshape(1, b * cin, h, w)
    out = F.conv2d(xg, wmod.reshape(b * cout, cin, kh, kw), padding=kh // 2, groups=b)
    return out.reshape(b, cout, h, w)


def _blur_kernel():
    k = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k, k)
    return (k2 / k2.sum()).astype(np.float32)


@pytest.mark.parametrize("demod", [True, False])
@pytest.mark.parametrize("up,down", [(False, False), (True, False), (False, True)])
def test_modulated_conv_matches_oracle(rng, demod, up, down):
    b, cin, cout, h = 2, 8, 12, 16
    kh = 3
    x = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = rng.standard_normal((kh, kh, cin, cout)).astype(np.float32)
    s = (rng.standard_normal((b, cin)) * 0.2 + 1.0).astype(np.float32)
    bk = _blur_kernel()

    got = modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        demodulate=demod, up=up, down=down, blur_kernel=jnp.asarray(bk),
    )
    got = np.asarray(got)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
    want = torch_modulated_conv(
        xt, wt, torch.from_numpy(s), demod, up=up, down=down,
        blur_k=torch.from_numpy(bk),
    )
    want = want.permute(0, 2, 3, 1).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def _one_hot_mask(rng, b, h, w, k):
    lbl = rng.integers(0, k, size=(b, h, w))
    return np.eye(k, dtype=np.float32)[lbl]  # (B,H,W,K)


@pytest.mark.parametrize("up", [False, True])
def test_regional_exact_matches_component_loop(rng, up):
    """exact mode == sum_k mask_k * modulated_conv(x, style_k) (the reference loop)."""
    b, cin, cout, h, k = 2, 6, 10, 8, 4
    x = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
    s = (rng.standard_normal((b, k, cin)) * 0.2 + 1.0).astype(np.float32)
    h_out = 2 * h if up else h
    seg = _one_hot_mask(rng, b, h_out, h_out, k)
    bk = _blur_kernel()

    got = np.asarray(regional_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(seg),
        up=up, blur_kernel=jnp.asarray(bk), mode="exact",
    ))

    # component loop oracle
    want = np.zeros_like(got)
    for ki in range(k):
        out_i = np.asarray(modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s[:, ki]),
            up=up, blur_kernel=jnp.asarray(bk),
        ))
        want += out_i * seg[..., ki:ki + 1]

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_regional_fast_exact_for_1x1(rng):
    """fast mode is numerically identical to exact for 1x1 kernels (ToRGB case)."""
    b, cin, cout, h, k = 2, 6, 3, 8, 4
    x = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = rng.standard_normal((1, 1, cin, cout)).astype(np.float32)
    s = (rng.standard_normal((b, k, cin)) * 0.2 + 1.0).astype(np.float32)
    seg = _one_hot_mask(rng, b, h, h, k)

    exact = np.asarray(regional_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(seg),
        demodulate=False, mode="exact",
    ))
    fast = np.asarray(regional_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(seg),
        demodulate=False, mode="fast",
    ))
    np.testing.assert_allclose(fast, exact, atol=1e-5, rtol=1e-5)


def test_regional_fast_close_in_region_interior(rng):
    """fast mode matches exact away from region boundaries for 3x3 kernels."""
    b, cin, cout, h, k = 1, 6, 8, 16, 2
    x = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
    s = (rng.standard_normal((b, k, cin)) * 0.2 + 1.0).astype(np.float32)
    # left half region 0, right half region 1
    lbl = np.zeros((b, h, h), dtype=np.int64)
    lbl[:, :, h // 2:] = 1
    seg = np.eye(k, dtype=np.float32)[lbl]

    exact = np.asarray(regional_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(seg), mode="exact"))
    fast = np.asarray(regional_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(seg), mode="fast"))

    # interior columns (>=1 px from the boundary) must match
    interior = np.concatenate([exact[:, :, :h // 2 - 1] - fast[:, :, :h // 2 - 1],
                               exact[:, :, h // 2 + 1:] - fast[:, :, h // 2 + 1:]], axis=2)
    np.testing.assert_allclose(interior, 0.0, atol=2e-4)
