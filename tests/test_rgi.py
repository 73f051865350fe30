"""Shape/behavior tests for the encoder and RGI net, plus masked-pool parity
against a torch per-class loop oracle (the reference's algorithm)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.encoders import FSEncoderPSP, masked_average_pool, instance_norm
from e4s2024_tpu.models.rgi import RGINet


def test_masked_average_pool_matches_loop(rng):
    b, h, w, c, k = 2, 8, 8, 6, 4
    feats = rng.standard_normal((b, h, w, c)).astype(np.float32)
    lbl = rng.integers(0, k + 1, size=(b, 16, 16))  # k+1 -> class k never present
    seg = np.eye(k + 1, dtype=np.float32)[lbl][..., :k]  # some all-zero channels

    got = np.asarray(masked_average_pool(jnp.asarray(feats), jnp.asarray(seg)))

    segt = torch.from_numpy(seg).permute(0, 3, 1, 2)
    segt = F.interpolate(segt, size=(h, w), mode="nearest").bool()
    ft = torch.from_numpy(feats).permute(0, 3, 1, 2)
    want = np.zeros((b, k, c), dtype=np.float32)
    for i in range(b):
        for j in range(k):
            area = int(segt[i, j].sum())
            if area > 0:
                want[i, j] = (
                    ft[i].masked_select(segt[i, j]).reshape(c, area).mean(1).numpy()
                )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = F.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_encoder_shapes(rng):
    enc = FSEncoderPSP()
    img = jnp.asarray(rng.standard_normal((1, 256, 256, 3)).astype(np.float32))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    params = enc.init(jax.random.PRNGKey(0), img, seg)["params"]
    sv, struc = enc.apply({"params": params}, img, seg)
    assert sv.shape == (1, 12, 1280)
    assert struc.shape == (1, 16, 16, 512)
    assert bool(jnp.isfinite(sv).all())


def test_rgi_full_forward_small(rng):
    net = RGINet(out_size=64, channel_multiplier=1, remaining_layer_idx=7)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    variables = net.init(jax.random.PRNGKey(0), img, seg)
    imgs, feats = net.apply(variables, img, seg)
    assert imgs.shape == (1, 64, 64, 3)

    # the split API: vectors -> codes -> image
    sv, struc = net.apply(variables, img, seg, method=RGINet.get_style_vectors)
    assert sv.shape == (1, 12, 1280)
    codes = net.apply(variables, sv, method=RGINet.cal_style_codes)
    assert codes.shape == (1, 12, 10, 512)  # n_latent=10 at 64px
    out, _, _ = net.apply(variables, struc, codes, seg, method=RGINet.gen_img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_latent_avg_offset(rng):
    net = RGINet(out_size=64, channel_multiplier=1, remaining_layer_idx=7)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    variables = net.init(jax.random.PRNGKey(0), img, seg)
    sv = jnp.zeros((1, 12, 1280))
    codes0 = net.apply(variables, sv, method=RGINet.cal_style_codes)
    # set latent_avg and check the offset & the shared tail
    avg = jnp.asarray(rng.standard_normal((10, 512)).astype(np.float32))
    variables = {**variables, "buffers": {"latent_avg": avg}}
    codes1 = net.apply(variables, sv, method=RGINet.cal_style_codes)
    diff = np.asarray(codes1 - codes0)
    np.testing.assert_allclose(diff[0, 3, :7], np.asarray(avg[:7]), atol=1e-6)
    # tail rows (>= remaining_layer_idx) are exactly latent_avg (not offset)
    np.testing.assert_allclose(np.asarray(codes1)[0, 5, 7:], np.asarray(avg[7:]), atol=1e-6)


def test_sean_encoder_shapes(rng):
    from e4s2024_tpu.models.encoders import FSEncoderSEAN

    enc = FSEncoderSEAN()
    img = jnp.asarray(rng.standard_normal((1, 256, 256, 3)).astype(np.float32))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    params = enc.init(jax.random.PRNGKey(0), img, seg)["params"]
    sv, struc = enc.apply({"params": params}, img, seg)
    assert sv.shape == (1, 12, 512)
    assert struc.shape == (1, 16, 16, 512)


def test_rgi_sean_forward(rng):
    net = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 fsencoder_type="sean")
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[rng.integers(0, 12, (1, 64, 64))])
    variables = net.init(jax.random.PRNGKey(0), img, seg)
    imgs, feats = net.apply(variables, img, seg, regional_mode="fast")
    assert imgs.shape == (1, 64, 64, 3)
