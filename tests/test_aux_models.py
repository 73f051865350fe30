"""Hopenet, landmark smoothing, MLS deformation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.hopenet import Hopenet, PoseEstimator, convert_hopenet
from e4s2024_tpu.pipelines.landmarks import (
    kalman_smooth_landmarks, savgol_smooth_landmarks,
    mls_rigid_deformation_grid, warp_with_grid, image_deformation,
)


@pytest.fixture(scope="module")
def hopenet():
    model = Hopenet(layers=(1, 1, 1, 1))  # tiny for CI
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))["params"]
    return model, params


def test_hopenet_heads(hopenet, rng):
    model, params = hopenet
    y, p, r = model.apply({"params": params},
                          jnp.asarray(rng.standard_normal((1, 224, 224, 3)),
                                      dtype=jnp.float32))
    assert y.shape == p.shape == r.shape == (1, 66)


def test_pose_estimator_gap(hopenet, rng):
    model, params = hopenet
    est = PoseEstimator.__new__(PoseEstimator)
    est.model = model
    est.params = params
    PoseEstimator.__init__(est, params) if False else None
    # build manually since fixture model is tiny
    idx = jnp.arange(66, dtype=jnp.float32)

    def fwd(p, img):
        yy, pp, rr = model.apply({"params": p}, img)

        def expect(logits):
            return jnp.sum(jax.nn.softmax(logits, -1) * idx, -1) * 3.0 - 99.0
        return expect(yy), expect(pp), expect(rr)

    from e4s2024_tpu.utils.packing import jit_with_packed_params
    est._fwd = jit_with_packed_params(fwd, params)
    a = (rng.random((1, 128, 128, 3)) * 255).astype(np.float32)
    gap = est.pose_gap(a, a)
    assert gap == pytest.approx(0.0, abs=1e-4)
    angles = est.estimate(a)
    for v in angles:
        assert -99.0 <= float(v[0]) <= 99.0


def test_hopenet_converter_structure(hopenet):
    model, params = hopenet
    # structure test uses the full-depth reference layout -> build a tiny sd
    from tests.test_convert import _conv_to_torch, _lin_to_torch

    sd = {}

    def bn_inv(name, p):
        sd[f"{name}.running_mean"] = np.asarray(p["mean"])
        sd[f"{name}.running_var"] = np.asarray(p["var"])
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    _conv_to_torch(sd, "conv1", params["conv1"])
    bn_inv("bn1", params["bn1"])
    for li, n in enumerate((1, 1, 1, 1)):
        for bi in range(n):
            b = params[f"layer{li + 1}_{bi}"]
            t = f"layer{li + 1}.{bi}"
            for c in ("conv1", "conv2", "conv3"):
                _conv_to_torch(sd, f"{t}.{c}", b[c])
            for bnn in ("bn1", "bn2", "bn3"):
                bn_inv(f"{t}.{bnn}", b[bnn])
            if "down_conv" in b:
                _conv_to_torch(sd, f"{t}.downsample.0", b["down_conv"])
                bn_inv(f"{t}.downsample.1", b["down_bn"])
    for head in ("fc_yaw", "fc_pitch", "fc_roll"):
        _lin_to_torch(sd, head, params[head])

    import e4s2024_tpu.models.hopenet as hn
    orig = hn.Hopenet.layers
    got = None
    # converter iterates the full (3,4,6,3) plan; adapt by monkeypatching is
    # overkill — instead just convert the tiny plan manually
    from e4s2024_tpu.convert.torch_loader import _bn, _conv, _linear
    params2 = {"conv1": _conv(sd, "conv1"), "bn1": _bn(sd, "bn1")}
    for li, n in enumerate((1, 1, 1, 1)):
        for bi in range(n):
            t = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv(sd, f"{t}.conv1"), "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": _conv(sd, f"{t}.conv2"), "bn2": _bn(sd, f"{t}.bn2"),
                "conv3": _conv(sd, f"{t}.conv3"), "bn3": _bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, f"{t}.downsample.0")
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params2[f"layer{li + 1}_{bi}"] = blk
    for head in ("fc_yaw", "fc_pitch", "fc_roll"):
        params2[head] = _linear(sd, head)
    fa = jax.tree_util.tree_flatten_with_path(params2)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]


def test_landmark_smoothing(rng):
    base = rng.random((20, 68, 2)).astype(np.float32) * 100
    noisy = base + rng.standard_normal(base.shape).astype(np.float32)
    k = kalman_smooth_landmarks(noisy)
    s = savgol_smooth_landmarks(noisy)
    assert k.shape == s.shape == noisy.shape
    # smoothing reduces frame-to-frame jitter
    def jitter(x):
        return np.abs(np.diff(x, axis=0)).mean()
    assert jitter(k) < jitter(noisy)
    assert jitter(s) < jitter(noisy)


def test_mls_identity(rng):
    pts = (rng.random((8, 2)) * 30 + 1).astype(np.float32)
    grid = mls_rigid_deformation_grid(jnp.asarray(pts), jnp.asarray(pts), 32, 32)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    ident = np.stack([xx, yy], -1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(grid), ident, atol=0.2)


def test_mls_translation(rng):
    src = np.array([[8, 8], [24, 8], [8, 24], [24, 24]], np.float32)
    dst = src + np.array([3.0, 0.0], np.float32)
    img = np.zeros((32, 32, 1), np.float32)
    img[:, :, 0] = np.arange(32)[None, :]
    out = image_deformation(img, src, dst)
    # dst pixel (x) samples source at (x - 3): value = x - 3
    assert abs(out[16, 16, 0] - 13.0) < 0.5
