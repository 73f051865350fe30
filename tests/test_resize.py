"""Resize ops must match torch F.interpolate bit-for-bit (within fp tolerance)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from e4s2024_tpu.ops import resize_nearest, resize_bilinear, resize_bilinear_align_corners
from e4s2024_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu


@pytest.mark.parametrize("size", [(8, 8), (32, 32), (7, 13), (16, 8)])
def test_nearest_matches_torch(rng, size):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), size))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="nearest")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", [(8, 8), (32, 32), (7, 13), (256, 256)])
@pytest.mark.parametrize("align", [False, True])
def test_bilinear_matches_torch(rng, size, align):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    fn = resize_bilinear_align_corners if align else resize_bilinear
    got = np.asarray(fn(jnp.asarray(x), size))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
        mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xt = torch.from_numpy(x) + torch.from_numpy(b)
    want = (F.leaky_relu(xt, 0.2) * np.sqrt(2.0)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    got2 = np.asarray(scaled_leaky_relu(jnp.asarray(x)))
    want2 = (F.leaky_relu(torch.from_numpy(x), 0.2) * np.sqrt(2.0)).numpy()
    np.testing.assert_allclose(got2, want2, atol=1e-6)
