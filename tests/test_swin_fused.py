"""Fully-fused SwinBlock Pallas kernel (ops/swin_block.py) vs the Flax path.

The kernel runs LN1 -> qkv -> shifted-window attention -> proj -> residual
-> LN2 -> MLP -> residual in one pallas_call; these tests pin it (in
interpreter mode on CPU) against the module forward that defines the
reference semantics (models/swinir.py SwinBlock, itself forward-parity
tested against swap_face_fine/SwinIR/models/network_swinir.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.swinir import (
    SwinIR, SwinBlock, _block_weights, _shift_labels, apply_fused)
from e4s2024_tpu.ops.swin_block import fused_swin_block


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_swin_block_matches_module(rng, shift):
    b, h, w, c, heads, ws = 2, 16, 24, 12, 2, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    m = SwinBlock(dim=c, heads=heads, window=ws, shift=shift)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    want = m.apply({"params": params}, x)

    wts = _block_weights(params, ws, heads)
    if shift:
        xr = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        labels = jnp.asarray(_shift_labels(h, w, ws, shift)).reshape(
            h // ws, w // ws, ws * ws)
        got = fused_swin_block(xr, wts, labels, window=ws, heads=heads,
                               interpret=True)
        got = jnp.roll(got, (shift, shift), axis=(1, 2))
    else:
        got = fused_swin_block(x, wts, None, window=ws, heads=heads,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_apply_fused_matches_model(rng):
    """Full tiny SwinIR: fused executor == model.apply (same params)."""
    kw = dict(embed_dim=24, depths=(2, 2), heads=(2, 2), num_feat=16)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    model = SwinIR(**kw)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    want = model.apply({"params": params}, x)
    got = apply_fused(model, params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_apply_fused_bf16_tracks_f32(rng):
    """bf16 fused executor stays within bf16 tolerance of the f32 model."""
    kw = dict(embed_dim=24, depths=(2,), heads=(2,), num_feat=16)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    model = SwinIR(**kw)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    want = model.apply({"params": params}, x)
    got = apply_fused(SwinIR(**kw, dtype=jnp.bfloat16), params, x,
                      interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)
