"""Pallas kernels vs their jnp reference forms (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.ops.fused_act import fused_leaky_relu
from e4s2024_tpu.ops.upfirdn import upfirdn2d, make_kernel
from e4s2024_tpu.ops.pallas import (
    fused_leaky_relu_tpu, blur3x3_tpu, modulate_demodulate_tpu,
)


def test_fused_act_kernel(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    got = fused_leaky_relu_tpu(x, b, interpret=True)
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_act_kernel_ragged_rows(rng):
    # n not divisible by the row block
    x = jnp.asarray(rng.standard_normal((1, 7, 11, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    got = fused_leaky_relu_tpu(x, b, interpret=True)
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_blur_kernel(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    k1 = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k1 = k1 / k1.sum()
    got = blur3x3_tpu(x, tuple(float(t) for t in k1), interpret=True)
    want = upfirdn2d(x, jnp.asarray(np.outer(k1, k1)), pad=(2, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_modulate_kernel(rng):
    b, h, w, c, k = 2, 8, 8, 32, 12
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    lbl = rng.integers(0, k, (b, h, w))
    seg = jnp.asarray(np.eye(k, dtype=np.float32)[lbl])
    s = jnp.asarray(rng.standard_normal((b, k, c)).astype(np.float32))
    got = modulate_demodulate_tpu(x, seg, s, interpret=True)
    want = x * jnp.einsum("bhwk,bkc->bhwc", seg, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
