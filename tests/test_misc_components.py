"""Tests for VGG style loss, path regularizer, ArcFace 5-pt alignment,
observability utilities."""

import json
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.vgg import VGG16Features, StyleGramLoss, gram_matrix
from e4s2024_tpu.losses import g_path_lengths_penalty, w_norm_loss
from e4s2024_tpu.pipelines.arcface_align import (
    umeyama_similarity, estimate_norm, norm_crop, TEMPLATES,
)
from e4s2024_tpu.utils.observability import MetricsLogger, StageTimer


def test_vgg_taps(rng):
    net = VGG16Features(taps=(3, 8, 15, 21))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    feats = net.apply({"params": params}, x)
    assert len(feats) == 4
    assert feats[0].shape == (1, 64, 64, 64)     # after relu idx 3
    assert feats[1].shape == (1, 32, 32, 128)    # after relu idx 8
    assert feats[3].shape == (1, 8, 8, 512)      # after relu idx 21


def test_style_gram_loss(rng):
    net = VGG16Features(taps=(8,))
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    loss = StyleGramLoss(params, taps=(8,))
    a = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    assert float(loss(a, a)) == pytest.approx(0.0, abs=1e-8)
    assert float(loss(a, b)) > 0
    mask = jnp.ones((1, 64, 64, 1))
    assert float(loss(a, b, mask, mask)) > 0


def test_gram_shape(rng):
    f = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    g = gram_matrix(f)
    assert g.shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[0]).T, atol=1e-5)


def test_path_length_penalty(rng):
    grads = jnp.asarray(rng.standard_normal((2, 10, 512)).astype(np.float32))
    pen, mean, lengths = g_path_lengths_penalty(grads, jnp.asarray(0.0))
    assert lengths.shape == (2,)
    assert float(pen) >= 0


def test_umeyama_recovers_similarity(rng):
    src = rng.random((5, 2)) * 100
    theta = 0.3
    r = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    dst = 1.7 * src @ r.T + np.array([5.0, -3.0])
    m = umeyama_similarity(src, dst)
    got = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-6)


def test_norm_crop(rng):
    img = (rng.random((128, 128, 3)) * 255).astype(np.float32)
    lm = TEMPLATES["arcface"] + rng.standard_normal((5, 2)) * 2
    crop, m = norm_crop(img, lm, image_size=112)
    assert crop.shape == (112, 112, 3)
    assert m.shape == (2, 3)
    # landmarks map close to the template
    mapped = lm @ m[:, :2].T + m[:, 2]
    assert np.abs(mapped - TEMPLATES["arcface"]).mean() < 3.0


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path), use_tensorboard=False)
    ml.log_scalars(1, {"loss": 0.5})
    ml.log_scalars(2, {"loss": 0.25}, prefix="train/")
    ml.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 0.5
    assert lines[1]["train/loss"] == 0.25


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b", sync=jnp.ones(4)):
        pass
    assert set(t.times) == {"a", "b"}
    assert "a:" in t.summary()
