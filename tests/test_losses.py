"""Tests for the loss stack: frozen nets, functional losses, pooling parity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.arcface import ArcFaceBackbone, FrozenBatchNorm, l2_normalize
from e4s2024_tpu.models.lpips import LPIPS
from e4s2024_tpu.models.parser_unet import ParsingUNet
from e4s2024_tpu.losses import (
    adv_g_loss, adv_d_loss, r1_penalty, w_norm_loss,
    feature_cosine_loss, id_loss_crop,
)
from e4s2024_tpu.ops.pool import adaptive_avg_pool2d, max_pool2d


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 188, 188, 3)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (112, 112)))
    want = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), (112, 112))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 17, 17, 3)).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 3, 2))
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_id_loss_crop_matches_torch(rng):
    x = rng.standard_normal((1, 512, 512, 3)).astype(np.float32)
    got = np.asarray(id_loss_crop(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = F.adaptive_avg_pool2d(xt, (256, 256))[:, :, 35:223, 32:220]
    want = F.adaptive_avg_pool2d(xt, (112, 112)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frozen_bn_matches_torch_eval(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    params = {
        "mean": rng.standard_normal(8).astype(np.float32),
        "var": np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5,
        "scale": rng.standard_normal(8).astype(np.float32),
        "bias": rng.standard_normal(8).astype(np.float32),
    }
    got = np.asarray(FrozenBatchNorm().apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)))
    bn = torch.nn.BatchNorm2d(8).eval()
    bn.running_mean = torch.from_numpy(params["mean"])
    bn.running_var = torch.from_numpy(params["var"])
    bn.weight.data = torch.from_numpy(params["scale"])
    bn.bias.data = torch.from_numpy(params["bias"])
    want = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    """flax ConvTranspose(k2,s2) + our converter layout == torch ConvTranspose2d."""
    import flax.linen as nn
    x = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)  # torch (in,out,kh,kw)
    b = rng.standard_normal(4).astype(np.float32)
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    params = {
        "kernel": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])),
        "bias": jnp.asarray(b),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(w), torch.from_numpy(b), stride=2)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_arcface_shapes(rng):
    net = ArcFaceBackbone()
    x = jnp.asarray(rng.standard_normal((1, 112, 112, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, multi_scale=True)["params"]
    feats = net.apply({"params": params}, x, multi_scale=True)
    assert len(feats) == 5
    assert feats[-1].shape == (1, 512)
    for f in feats:
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(f), axis=-1), 1.0, atol=1e-4)
    single = net.apply({"params": params}, x, multi_scale=False)
    assert len(single) == 1 and single[0].shape == (1, 512)


def test_parsing_unet_shapes(rng):
    net = ParsingUNet()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    logits = net.apply({"params": params}, x)
    assert logits.shape == (1, 64, 64, 19)
    feats = net.apply({"params": params}, x, method=ParsingUNet.extract_feats)
    assert len(feats) == 5


def test_lpips_basic(rng):
    net = LPIPS()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, y)["params"]
    same = float(net.apply({"params": params}, x, x))
    diff = float(net.apply({"params": params}, x, y))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 0


def test_multiscale_lpips_skips_sub_alexnet_scales(rng):
    """Pyramid scales below AlexNet's 31-px minimum are skipped: at 16 px the
    conv/pool stack yields a zero-sized spatial dim and a NaN spatial mean
    (the torch reference errors on such inputs — it only runs >=256 px)."""
    from e4s2024_tpu.losses import multiscale_lpips

    net = LPIPS()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, y)["params"]
    apply = lambda a, b: net.apply({"params": params}, a, b)
    # 64-px pyramid = scales (64, 32): the 16-px scale is dropped -> finite
    total = float(multiscale_lpips(apply, x, y))
    s64 = float(apply(x, y))
    s32 = float(apply(adaptive_avg_pool2d(x, (32, 32)),
                      adaptive_avg_pool2d(y, (32, 32))))
    assert np.isfinite(total)
    assert total == pytest.approx(s64 + s32, rel=1e-5)


def test_adv_losses_match_torch(rng):
    rp = rng.standard_normal(8).astype(np.float32)
    fp = rng.standard_normal(8).astype(np.float32)
    got_d = float(adv_d_loss(jnp.asarray(rp), jnp.asarray(fp)))
    got_g = float(adv_g_loss(jnp.asarray(fp)))
    want_d = (F.softplus(-torch.from_numpy(rp)).mean()
              + F.softplus(torch.from_numpy(fp)).mean())
    want_g = F.softplus(-torch.from_numpy(fp)).mean()
    assert got_d == pytest.approx(float(want_d), abs=1e-6)
    assert got_g == pytest.approx(float(want_g), abs=1e-6)


def test_r1_penalty_analytic(rng):
    # D(x) = sum(x^2): grad = 2x, penalty = mean_b sum(4 x^2)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 3)).astype(np.float32))
    got = float(r1_penalty(lambda im: jnp.sum(jnp.square(im), axis=(1, 2, 3)), x))
    want = float(jnp.mean(jnp.sum(4 * jnp.square(x).reshape(3, -1), axis=1)))
    assert got == pytest.approx(want, rel=1e-5)


def test_w_norm_matches_torch(rng):
    lat = rng.standard_normal((2, 12, 18, 512)).astype(np.float32)
    avg = rng.standard_normal((18, 512)).astype(np.float32)
    got = float(w_norm_loss(jnp.asarray(lat), jnp.asarray(avg)))
    lt = torch.from_numpy(lat) - torch.from_numpy(avg)
    want = float(torch.sum(lt.norm(2, dim=(2, 3))) / (2 * 12))
    assert got == pytest.approx(want, rel=1e-5)


def test_feature_cosine_loss(rng):
    f1 = [jnp.asarray(l2(rng.standard_normal((2, 16)).astype(np.float32)))
          for _ in range(3)]
    same = float(feature_cosine_loss(f1, f1))
    assert same == pytest.approx(0.0, abs=1e-5)


def l2(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)
