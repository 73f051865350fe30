"""Fused window-attention Pallas kernel vs the plain-XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.ops.window_attention import (
    fused_window_attention, reference_window_attention)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_window_attention_matches_oracle(rng, masked):
    bw, h, n, d = 12, 3, 64, 30
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32)
    labels = (jnp.asarray(rng.integers(0, 3, (bw, n)), jnp.int32)
              if masked else None)
    want = reference_window_attention(q, k, v, bias, labels)
    got = fused_window_attention(q, k, v, bias, labels, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_window_attention_bf16(rng):
    bw, h, n, d = 8, 2, 64, 30
    mk = lambda s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, k, v = mk((bw, h, n, d)), mk((bw, h, n, d)), mk((bw, h, n, d))
    bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32)
    want = reference_window_attention(q, k, v, bias)
    got = fused_window_attention(q, k, v, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def _split_heads(qkv_win, heads):
    """(BW, n, 3C) -> q, k, v each (BW, heads, n, hd)."""
    bw, n, c3 = qkv_win.shape
    c = c3 // 3
    hd = c // heads
    t = qkv_win.reshape(bw, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    return t[0], t[1], t[2]


@pytest.mark.parametrize("masked", [False, True])
def test_swin_attention_nhwc_matches_oracle(rng, masked):
    from e4s2024_tpu.models.swinir import _window_partition
    from e4s2024_tpu.ops.window_attention import swin_attention_nhwc

    b, hh, ww, heads, hd, w = 2, 16, 24, 3, 10, 8
    c = heads * hd
    n = w * w
    nwy, nwx = hh // w, ww // w
    qkv = jnp.asarray(rng.standard_normal((b, hh, ww, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)), jnp.float32)
    lab = (jnp.asarray(rng.integers(0, 4, (nwy, nwx, n)), jnp.int32)
           if masked else None)

    got = swin_attention_nhwc(qkv, bias, lab, window=w, heads=heads,
                              interpret=True)
    assert got.shape == (b, hh, ww, c)

    q, k, v = _split_heads(_window_partition(qkv, w), heads)
    lab_flat = (jnp.tile(lab.reshape(-1, n), (b, 1)) if masked else None)
    want_win = reference_window_attention(q, k, v, bias, lab_flat)
    want_win = want_win.transpose(0, 2, 1, 3).reshape(-1, n, c)
    want = want_win.reshape(b, nwy, nwx, w, w, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_swinir_kernel_path_matches_xla(rng):
    """Full tiny SwinIR forward: use_kernel (interpret) == plain XLA path."""
    from e4s2024_tpu.models.swinir import SwinIR
    from e4s2024_tpu.ops import window_attention as wa

    kw = dict(embed_dim=24, depths=(2, 2), heads=(2, 2), num_feat=16)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    m0 = SwinIR(**kw)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    want = m0.apply({"params": params}, x)
    wa.INTERPRET = True
    try:
        got = SwinIR(**kw, use_kernel=True).apply({"params": params}, x)
    finally:
        wa.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
