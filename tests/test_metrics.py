"""Metric tests: SSIM/PSNR/RMSE sanity + ID retrieval."""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s2024_tpu.metrics import ssim, psnr, rmse, reconstruction_metrics, id_retrieval


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    n1 = x + 0.05 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    n2 = x + 0.3 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    s1 = float(ssim(x, n1)[0])
    s2 = float(ssim(x, n2)[0])
    assert 1.0 > s1 > s2 > 0.0


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 10.0)
    # mse=100 -> psnr = 10*log10(255^2/100) = 28.13
    assert float(psnr(a, b)[0]) == pytest.approx(28.13, abs=0.01)


def test_rmse_known_value():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.full((1, 4, 4, 3), 0.5)
    assert float(rmse(a, b)[0]) == pytest.approx(0.5, abs=1e-6)


def test_reconstruction_metrics_dict(rng):
    g = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    r = np.clip(g + rng.integers(-10, 10, g.shape), 0, 255).astype(np.uint8)
    m = reconstruction_metrics(r, g)
    assert set(m) == {"ssim", "psnr", "rmse"}
    assert 0 < m["ssim"] <= 1 and m["psnr"] > 20 and m["rmse"] < 0.1


def test_id_retrieval(rng):
    g = rng.standard_normal((10, 16)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g + 0.01 * rng.standard_normal((10, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    acc = id_retrieval(jnp.asarray(q), jnp.asarray(g), np.arange(10))
    assert acc == 1.0
