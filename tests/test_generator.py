"""Composition parity test: Flax Generator vs an independent functional torch oracle.

The oracle is built from the StyleGAN2 math (modulated conv + FIR resampling +
noise + fused lrelu + RGB skip chain) using the already-golden-tested torch
helpers in tests/test_modconv.py — it shares no code with the Flax model, so
agreement validates layer ordering, style indexing, pads and the regional
mask branch end-to-end.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from e4s2024_tpu.models import Generator
from tests.test_modconv import torch_modulated_conv, _blur_kernel
from tests.test_upfirdn import torch_upfirdn2d


def _mod_scales(style_np, mod_params):
    """EqualLinear(style)->Cin with lr_mul=1, bias_init=1."""
    k = mod_params["kernel"]  # (in, out)
    b = mod_params["bias"]
    scale = 1.0 / math.sqrt(k.shape[0])
    return style_np @ (k * scale) + b


def _oracle_modconv(x_nchw, params, style_np, demodulate, up):
    w_hwio = params["weight"]
    s = torch.from_numpy(_mod_scales(style_np, params["modulation"]).astype(np.float32))
    wt = torch.from_numpy(w_hwio).permute(3, 2, 0, 1)
    return torch_modulated_conv(
        x_nchw, wt, s, demodulate, up=up, blur_k=torch.from_numpy(_blur_kernel())
    )


def _oracle_styled_conv(x, params, latent_np, seg_nchw, noise, mask_op, up):
    """latent_np: (B,K,512) if mask_op else (B,512). seg at OUTPUT resolution."""
    if mask_op:
        k = latent_np.shape[1]
        outs = []
        for ki in range(k):
            o = _oracle_modconv(x, params["conv"], latent_np[:, ki], True, up)
            outs.append(o * seg_nchw[:, ki:ki + 1])
        out = sum(outs)
    else:
        out = _oracle_modconv(x, params["conv"], latent_np, True, up)
    out = out + torch.from_numpy(params["noise_weight"]) * noise
    out = out + torch.from_numpy(params["act_bias"])[None, :, None, None]
    return torch.where(out >= 0, out, out * 0.2) * math.sqrt(2.0)


def _oracle_to_rgb(x, params, latent_np, seg_nchw, skip, mask_op):
    if mask_op:
        k = latent_np.shape[1]
        out = sum(
            _oracle_modconv(x, params["conv"], latent_np[:, ki], False, False)
            * seg_nchw[:, ki:ki + 1]
            for ki in range(k)
        )
    else:
        out = _oracle_modconv(x, params["conv"], latent_np, False, False)
    out = out + torch.from_numpy(params["bias"]).permute(0, 3, 1, 2)
    if skip is not None:
        bk = torch.from_numpy(_blur_kernel())
        skip = torch_upfirdn2d(skip, bk * 4.0, 2, 1, (2, 1))
        out = out + skip
    return out


def _nearest_nchw(seg_bkhw, size):
    b, k, h, w = seg_bkhw.shape
    ih = (np.arange(size) * h) // size
    iw = (np.arange(size) * w) // size
    return seg_bkhw[:, :, ih][:, :, :, iw]


@pytest.mark.parametrize("remaining", [7, 18])
def test_generator_matches_oracle(rng, remaining):
    size, K, B = 64, 4, 2
    gen = Generator(size=size, channel_multiplier=1, split_layer_idx=5,
                    remaining_layer_idx=remaining)
    n_latent = int(math.log2(size)) * 2 - 2
    latent = rng.standard_normal((B, K, n_latent, 512)).astype(np.float32) * 0.1
    lbl = rng.integers(0, K, size=(B, size, size))
    seg = np.eye(K, dtype=np.float32)[lbl]  # NHWK

    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(latent), None,
                      jnp.asarray(seg))["params"]
    # randomize the zero-initialized params so noise & bias paths are exercised
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [jax.random.normal(k, l.shape) * 0.3 for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    noises = [
        rng.standard_normal((B, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1)).astype(np.float32)
        for i in range(gen.num_layers)
    ]

    img, _, inter = gen.apply(
        {"params": params}, jnp.asarray(latent), None, jnp.asarray(seg),
        noise=[jnp.asarray(n) for n in noises],
    )
    img = np.asarray(img)

    # ---- oracle ----
    p = jax.tree_util.tree_map(np.asarray, params)
    seg_nchw = np.transpose(seg, (0, 3, 1, 2))
    log_size = int(math.log2(size))

    def seg_at(res):
        return torch.from_numpy(_nearest_nchw(seg_nchw, res))

    x = torch.from_numpy(np.tile(p["input"], (B, 1, 1, 1))).permute(0, 3, 1, 2)
    noise_t = [torch.from_numpy(n).permute(0, 3, 1, 2) for n in noises]
    x = _oracle_styled_conv(x, p["conv1"], latent[:, :, 0], seg_at(4), noise_t[0],
                            True, False)
    skip = _oracle_to_rgb(x, p["to_rgb1"], latent[:, :, 1], seg_at(4), None, True)

    i = 1
    for j in range(log_size - 2):
        res = 2 ** (j + 3)
        ca, cb = p[f"convs_{2 * j}"], p[f"convs_{2 * j + 1}"]
        tr = p[f"to_rgbs_{j}"]
        i_res = j + 3
        masked_conv = not i_res > (2 + remaining // 2)
        masked_rgb = not (remaining != 17 and i_res >= (2 + remaining // 2))
        if i < remaining:
            x = _oracle_styled_conv(x, ca, latent[:, :, i], seg_at(res),
                                    noise_t[2 * j + 1], masked_conv, True)
            x = _oracle_styled_conv(x, cb, latent[:, :, i + 1], seg_at(res),
                                    noise_t[2 * j + 2], masked_conv, False)
            if remaining == 17 or i + 2 != remaining:
                skip = _oracle_to_rgb(x, tr, latent[:, :, i + 2], seg_at(res), skip,
                                      masked_rgb)
            else:
                skip = _oracle_to_rgb(x, tr, latent[:, 0, i + 2], seg_at(res), skip,
                                      False)
        else:
            x = _oracle_styled_conv(x, ca, latent[:, 0, i], None, noise_t[2 * j + 1],
                                    False, True)
            x = _oracle_styled_conv(x, cb, latent[:, 0, i + 1], None,
                                    noise_t[2 * j + 2], False, False)
            skip = _oracle_to_rgb(x, tr, latent[:, 0, i + 2], None, skip, False)
        i += 2

    want = skip.permute(0, 2, 3, 1).numpy()
    assert img.shape == want.shape == (B, size, size, 3)
    np.testing.assert_allclose(img, want, atol=5e-4, rtol=5e-4)


def test_generator_fast_mode_runs(rng):
    gen = Generator(size=64, channel_multiplier=1)
    latent = jnp.asarray(rng.standard_normal((1, 4, 10, 512)).astype(np.float32) * 0.1)
    seg = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, size=(1, 64, 64))])
    params = gen.init(jax.random.PRNGKey(0), latent, None, seg)["params"]
    img, _, _ = gen.apply({"params": params}, latent, None, seg, regional_mode="fast")
    assert img.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(img).all())
