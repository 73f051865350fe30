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
